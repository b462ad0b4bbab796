"""Heavy hitters: exactness, certification honesty, partition
invariance, and parity with the full-shuffle groupBy answer."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.frequent import heavy_hitters


def _exact_topk(df, col, k):
    return [
        (r["value"], r["n"])
        for r in df.select(F.col(col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
        .collect()
    ]


@pytest.fixture(scope="module")
def zipf(spark):
    # value i appears ~ 5000/i times: heavy head, long tail
    return spark.range(1, 201).select(
        F.explode(
            F.sequence(F.lit(1), (F.lit(5000) / F.col("id")).cast("long"))
        ).alias("rep"),
        F.concat(F.lit("term_"), F.col("id")).alias("term"),
    ).repartition(16)


def test_zipf_certified_exact(zipf):
    hh = heavy_hitters(zipf, "term", k=10, capacity=256)
    got = [(r["value"], r["n"]) for r in hh.topk.collect()]
    want = _exact_topk(zipf, "term", 10)
    assert got == want
    assert hh.is_exact(got[-1][1]), (
        f"kth={got[-1][1]} floor={hh.candidate_floor} "
        f"under={hh.undercount_bound}"
    )
    assert hh.total_rows == zipf.count()


def test_uniform_refuses_certification(spark):
    # 3000 values, each exactly 3 times — no heavy hitters exist, so
    # with a small capacity the certificate must honestly say no
    df = spark.range(9000).select(
        F.concat(F.lit("v"), (F.col("id") % 3000)).alias("x")
    ).repartition(8)
    hh = heavy_hitters(df, "x", k=5, capacity=64)
    kth = hh.topk.collect()[-1]["n"]
    assert not hh.is_exact(kth)


def test_partition_invariance(zipf):
    a = heavy_hitters(zipf.repartition(4), "term", k=8, capacity=256)
    b = heavy_hitters(zipf.repartition(32), "term", k=8, capacity=256)
    ra = [(r["value"], r["n"]) for r in a.topk.collect()]
    rb = [(r["value"], r["n"]) for r in b.topk.collect()]
    assert ra == rb  # certified-exact results can't depend on layout
    assert a.is_exact(ra[-1][1]) and b.is_exact(rb[-1][1])


def test_nulls_excluded_and_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), (None,), (None,)],
        "x string",
    )
    hh = heavy_hitters(df, "x", k=3, capacity=16)
    got = [(r["value"], r["n"]) for r in hh.topk.collect()]
    assert got == [("a", 2), ("b", 2), ("c", 1)]  # tie → value asc
    assert hh.total_rows == 5


def test_k_over_capacity_rejected(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("x"))
    with pytest.raises(ValueError, match="must be <="):
        heavy_hitters(df, "x", k=100, capacity=10)


def test_real_documents_df_parity(spark, duck_docs_topk=None):
    """Doc-frequency top-20 on the real documents table must equal the
    full-shuffle exact answer (the pinned top_terms query shape)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("term")
    ).filter(F.col("term") != "")
    hh = heavy_hitters(toks, "term", k=20, capacity=4096)
    got = [(r["value"], r["n"]) for r in hh.topk.collect()]
    want = _exact_topk(toks, "term", 20)
    assert got == want
    assert hh.is_exact(got[-1][1])


# ---------------------------------------------------------------------------
# grouped_heavy_hitters
# ---------------------------------------------------------------------------

from sparvi_core_spark.operators.frequent import grouped_heavy_hitters  # noqa: E402


def _exact_grouped_topk(df, gcol, vcol, k):
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("n"), F.asc("v"))
    return sorted(
        (r["g"], r["v"], r["n"])
        for r in df.select(
            F.col(gcol).cast("string").alias("g"),
            F.col(vcol).cast("string").alias("v"),
        )
        .filter(F.col("g").isNotNull() & F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )


@pytest.fixture(scope="module")
def two_zipfs(spark):
    # group A: zipf over term_1..term_100; group B: different head
    a = spark.range(1, 101).select(
        F.lit("A").alias("grp"),
        F.explode(F.sequence(F.lit(1), (F.lit(2000) / F.col("id")).cast("long"))).alias("r"),
        F.concat(F.lit("term_"), F.col("id")).alias("term"),
    )
    b = spark.range(1, 101).select(
        F.lit("B").alias("grp"),
        F.explode(F.sequence(F.lit(1), (F.lit(2000) / (F.lit(101) - F.col("id"))).cast("long"))).alias("r"),
        F.concat(F.lit("term_"), F.col("id")).alias("term"),
    )
    return a.unionByName(b).select("grp", "term").repartition(12)


def test_grouped_matches_full_shuffle_answer(two_zipfs):
    hh = grouped_heavy_hitters(two_zipfs, "grp", "term", k=5, capacity=128)
    got = sorted((r["group"], r["value"], r["n"]) for r in hh.topk.collect())
    want = _exact_grouped_topk(two_zipfs, "grp", "term", 5)
    assert got == want
    # per-group certification: both zipf heads are provably exact
    kth = {}
    for g, v, n in got:
        kth[g] = min(kth.get(g, 10**18), n)
    assert hh.is_exact("A", kth["A"]) and hh.is_exact("B", kth["B"])
    # the two groups have DIFFERENT heads (A: term_1, B: term_100)
    a_top = max((t for t in got if t[0] == "A"), key=lambda t: t[2])
    b_top = max((t for t in got if t[0] == "B"), key=lambda t: t[2])
    assert a_top[1] == "term_1" and b_top[1] == "term_100"


def test_grouped_partition_invariance(two_zipfs):
    a = grouped_heavy_hitters(two_zipfs.repartition(3), "grp", "term", k=4, capacity=128)
    b = grouped_heavy_hitters(two_zipfs.repartition(24), "grp", "term", k=4, capacity=128)
    ra = sorted(tuple(r) for r in a.topk.collect())
    rb = sorted(tuple(r) for r in b.topk.collect())
    assert ra == rb


def test_grouped_real_documents_by_lang(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    ).filter(F.col("term") != "")
    hh = grouped_heavy_hitters(toks, "lang", "term", k=5, capacity=2048)
    got = sorted((r["group"], r["value"], r["n"]) for r in hh.topk.collect())
    want = _exact_grouped_topk(toks, "lang", "term", 5)
    assert got == want and len(got) > 5


def test_grouped_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), ("g1", "y"), (None, "z"), ("g2", None)],
        "grp string, v string",
    )
    hh = grouped_heavy_hitters(df, "grp", "v", k=2, capacity=16)
    got = sorted((r["group"], r["value"], r["n"]) for r in hh.topk.collect())
    assert got == [("g1", "x", 2), ("g1", "y", 1)]  # null group/value dropped
    assert hh.group_info["g1"][0] == 3

    empty = spark.createDataFrame([], "grp string, v string")
    assert grouped_heavy_hitters(empty, "grp", "v").topk.count() == 0
