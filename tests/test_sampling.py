"""Hash splits / deterministic sampling: stability, disjointness,
append-invariance."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, views):
    return views["documents"]


def test_hash_split_disjoint_and_complete(docs):
    splits = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {name: {r["doc_id"] for r in s.select("doc_id").collect()} for name, s in splits.items()}
    n_total = docs.count()
    assert sum(len(v) for v in ids.values()) == n_total, "splits must partition the input"
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"]) and not (ids["val"] & ids["test"])
    # fractions approximately honored (500 docs, generous band)
    assert 0.7 <= len(ids["train"]) / n_total <= 0.9


def test_hash_split_is_repartition_invariant(docs):
    """The core contract randomSplit lacks: membership is a pure
    function of the id, so a repartition must not move any row."""
    a = {r["doc_id"] for r in hash_split(docs, {"train": 0.8, "val": 0.2})["val"].collect()}
    b = {
        r["doc_id"]
        for r in hash_split(docs.repartition(17, "text"), {"train": 0.8, "val": 0.2})["val"].collect()
    }
    assert a == b


def test_hash_split_append_invariant(docs):
    """Old rows keep their split when new rows arrive."""
    half = docs.filter(F.col("doc_id") < 250)
    full_val = {r["doc_id"] for r in hash_split(docs, {"train": 0.8, "val": 0.2})["val"].collect()}
    half_val = {r["doc_id"] for r in hash_split(half, {"train": 0.8, "val": 0.2})["val"].collect()}
    assert half_val == {i for i in full_val if i < 250}


def test_hash_split_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.5, "val": 0.1})


def test_hash_sample_deterministic_and_sized(docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.2).collect()}
    assert s1 == s2
    assert 0.1 <= len(s1) / docs.count() <= 0.3
    # independent draw under a different salt
    s3 = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="other").collect()}
    assert s3 != s1


def test_stratified_sample_rebalances(docs):
    langs = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    top = max(langs, key=langs.get)
    out = stratified_sample(docs, "lang", {top: 0.1}, default_fraction=1.0)
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got[top] < langs[top] * 0.4, "dominant stratum downsampled"
    for lang, n in langs.items():
        if lang != top:
            assert got.get(lang) == n, "other strata kept whole"


def test_cross_split_contamination(spark):
    """Near-dup pairs straddling the split are reported (eval_id,
    train_id); near-dups WITHIN one split are not contamination."""
    from sparvi_core_spark.operators.sampling import cross_split_contamination

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, base),                                # near-dup of eval 10
            (2, base + " lambda"),                    # near-dup of train 1 (same split: ignored)
            (3, "totally different words entirely here now okay then"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            (10, base),                               # contaminated
            (11, "unrelated held out document text with fresh tokens only"),
        ],
        "doc_id long, text string",
    )
    got = cross_split_contamination(train, eval_df, threshold=0.8).collect()
    assert {(r["eval_id"], r["train_id"]) for r in got} >= {(10, 1)}
    for r in got:
        assert r["eval_id"] in (10, 11) and r["train_id"] in (1, 2, 3)
        assert r["est_jaccard"] >= 0.8
    # the within-split pair (1,2) must not appear
    assert all(not (r["train_id"] in (1, 2) and r["eval_id"] in (1, 2)) for r in got)


# ---------------------------------------------------------------------------
# weighted_hash_sample (A-ES weighted draw, deterministic)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_layout_invariant(spark):
    from sparvi_core_spark.operators.sampling import weighted_hash_sample

    df = spark.range(1000).selectExpr(
        "id as doc_id", "cast(1 + id % 10 as double) as w"
    )
    a = sorted(r["doc_id"] for r in
               weighted_hash_sample(df.repartition(4), "w", k=100).collect())
    b = sorted(r["doc_id"] for r in
               weighted_hash_sample(df.repartition(17), "w", k=100).collect())
    assert a == b and len(a) == 100
    # different salt → a different (but equally deterministic) draw
    c = sorted(r["doc_id"] for r in
               weighted_hash_sample(df, "w", k=100, salt="v2").collect())
    assert c != a


def test_weighted_sample_proportional_to_weight(spark):
    """Rows with weight 9 must be drawn ~9x as often as weight 1; check
    aggregate representation over one large draw."""
    from sparvi_core_spark.operators.sampling import weighted_hash_sample
    from pyspark.sql import functions as F

    # 5000 light rows (w=1) + 5000 heavy rows (w=9): heavy mass = 90%
    df = spark.range(10_000).selectExpr(
        "id as doc_id",
        "cast(case when id < 5000 then 1 else 9 end as double) as w",
    )
    s = weighted_hash_sample(df, "w", k=1000)
    heavy = s.filter(F.col("doc_id") >= 5000).count()
    # expected ~885 (WOR slightly below the 90% with-replacement share);
    # generous band to stay deterministic-robust
    assert 800 <= heavy <= 950, heavy


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    from sparvi_core_spark.operators.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = sorted(r["doc_id"] for r in
                 weighted_hash_sample(df, "w", k=10).collect())
    assert got == [1, 5]


def test_weighted_sample_takeordered_plan(spark):
    """The selection must be per-partition top-k (TakeOrderedAndProject),
    not a global sort shuffle."""
    from sparvi_core_spark.operators.sampling import weighted_hash_sample

    df = spark.range(1000).selectExpr("id as doc_id", "cast(1 as double) as w")
    plan = weighted_hash_sample(df, "w", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratified_sample_bounds_strata_enumeration(spark, docs):
    """default_fraction on a high-cardinality column fails loudly
    instead of collecting every distinct key driver-side."""
    import pytest

    with pytest.raises(ValueError, match="max_strata"):
        stratified_sample(
            docs, "doc_id", {}, default_fraction=0.5, max_strata=10
        )
    # under the cap: works as before
    out = stratified_sample(docs, "lang", {}, default_fraction=1.0, max_strata=10)
    assert out.count() == docs.count()


def test_cluster_safe_split_keeps_near_dups_together(spark):
    """Members of a dedup cluster always share a split; singletons get
    exactly the hash_split assignment (append-invariance preserved)."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    # planted clusters: (i, i+200) are near-dups for i < 100
    clusters = spark.createDataFrame(
        [(i, i) for i in range(100)] + [(i + 200, i) for i in range(100)],
        "id long, cluster long",
    )
    weights = {"train": 0.7, "val": 0.3}
    parts = cluster_safe_split(docs, clusters, weights)
    where = {}
    for name, frame in parts.items():
        for r in frame.collect():
            assert r["doc_id"] not in where, "splits must be disjoint"
            where[r["doc_id"]] = name
    assert len(where) == 400  # exhaustive
    for i in range(100):
        assert where[i] == where[i + 200], f"pair ({i},{i+200}) split apart"

    # singleton rows (100..199, 300..399) match plain hash_split
    plain = {}
    for name, frame in hash_split(docs, weights).items():
        for r in frame.collect():
            plain[r["doc_id"]] = name
    for i in list(range(100, 200)) + list(range(300, 400)):
        assert where[i] == plain[i]

    # both splits materially populated
    names = set(where.values())
    assert names == {"train", "val"}

    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        cluster_safe_split(docs, clusters, {"a": 0.5})
