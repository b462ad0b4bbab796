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
