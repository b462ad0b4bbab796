"""Cluster-based corpus curation (`operators/curation.py`).

Pinned on a planted 3-blob corpus where the right answers are known:
clustering must recover the blobs exactly (purity 1.0 on separated
Gaussians), the report must match a NumPy twin value-for-value, the
planted far-out point must be the ONLY outlier, prototypes must be
the true nearest-to-centroid docs, and balanced sampling must hit its
budgets (exactly under method='exact', in expectation under 'rate')
while staying layout-invariant. The rate path's plan is pinned
broadcast-only — the corpus never crosses an exchange.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.curation import (
    balanced_cluster_sample,
    cluster_corpus,
    cluster_prototypes,
    cluster_report,
    semantic_outliers,
)

DIM = 4
CENTERS = np.array(
    [
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 0.0],
    ]
)
SIZES = [60, 30, 10]


def _blob_rows():
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for label, (c, n) in enumerate(zip(CENTERS, SIZES)):
        pts = c + rng.normal(0.0, 0.5, size=(n, DIM))
        for p in pts:
            rows.append((vid, label, [float(x) for x in p]))
            vid += 1
    # one planted outlier: far from blob 0's center but nearest to it
    rows.append((vid, 0, [float(x) for x in CENTERS[0] + 6.0]))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    df = spark.createDataFrame(
        _blob_rows(), ["vec_id", "true_label", "embedding"]
    )
    assigned, centroids, info = cluster_corpus(
        df, k=3, id_col="vec_id", vec_col="embedding", max_iter=20, seed=0
    )
    assigned = assigned.cache()
    assigned.count()
    return df, assigned, centroids, info


def test_clusters_recover_blobs(spark, blobs):
    df, assigned, _, info = blobs
    assert info["converged"]
    joined = assigned.join(df.select("vec_id", "true_label"),
                           assigned["id"] == F.col("vec_id"))
    # every true blob maps to exactly one k-means bucket (purity 1.0
    # on well-separated gaussians; the planted outlier rides blob 0)
    m = joined.groupBy("true_label").agg(
        F.countDistinct("bucket").alias("nb")
    )
    assert all(r["nb"] == 1 for r in m.collect())
    assert joined.select("bucket").distinct().count() == 3


def test_cluster_report_numpy_twin(spark, blobs):
    _, assigned, _, _ = blobs
    rep = {r["bucket"]: r for r in cluster_report(assigned).collect()}
    rows = assigned.collect()
    total = len(rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["distance"])
    assert set(rep) == set(by_bucket)
    for b, ds in by_bucket.items():
        d = np.array(ds)
        assert rep[b]["n_docs"] == len(ds)
        assert rep[b]["share"] == pytest.approx(len(ds) / total, abs=1e-6)
        assert rep[b]["dist_mean"] == pytest.approx(d.mean(), abs=1e-5)
        assert rep[b]["dist_stddev"] == pytest.approx(
            d.std(ddof=1), abs=1e-5
        )
        assert rep[b]["dist_max"] == pytest.approx(d.max(), abs=1e-5)


def test_semantic_outliers_catch_planted_point(spark, blobs):
    _, assigned, _, _ = blobs
    flagged = semantic_outliers(assigned, z=3.0)
    out = [r["id"] for r in flagged.filter("is_outlier").collect()]
    assert out == [sum(SIZES)]  # exactly the planted far point
    # z is NULL only where dispersion is zero (not here), never NULL flag
    assert flagged.filter(F.col("is_outlier").isNull()).count() == 0


def test_outliers_zero_dispersion_cluster_flags_nothing(spark):
    rows = [(i, 0, 1.0) for i in range(5)]
    assigned = spark.createDataFrame(rows, ["id", "bucket", "distance"])
    flagged = semantic_outliers(assigned, z=1.0)
    assert flagged.filter("is_outlier").count() == 0
    assert flagged.filter(F.col("dist_z").isNotNull()).count() == 0


def test_prototypes_are_true_nearest(spark, blobs):
    _, assigned, _, _ = blobs
    protos = cluster_prototypes(assigned, per_cluster=2, id_col="id")
    rows = assigned.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(
            (r["distance"], r["id"])
        )
    for b, pairs in by_bucket.items():
        want = [i for _, i in sorted(pairs)[:2]]
        got = [
            r["id"]
            for r in protos.filter(F.col("bucket") == b)
            .orderBy("rank")
            .collect()
        ]
        assert got == want


def test_balanced_exact_hits_budgets(spark, blobs):
    _, assigned, _, _ = blobs
    samp = balanced_cluster_sample(
        assigned, per_cluster=8, method="exact", id_col="id"
    )
    counts = {
        r["bucket"]: r["n"]
        for r in samp.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["bucket"]: r["n"]
        for r in assigned.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {b: min(8, n) for b, n in sizes.items()}


def test_balanced_exact_layout_invariant(spark, blobs):
    _, assigned, _, _ = blobs
    a = balanced_cluster_sample(
        assigned.repartition(1), per_cluster=5, method="exact", id_col="id"
    )
    b = balanced_cluster_sample(
        assigned.repartition(7), per_cluster=5, method="exact", id_col="id"
    )
    assert sorted(r["id"] for r in a.collect()) == sorted(
        r["id"] for r in b.collect()
    )


def test_balanced_rate_expectation_and_determinism(spark, blobs):
    _, assigned, _, _ = blobs
    samp = balanced_cluster_sample(
        assigned, per_cluster=20, method="rate", id_col="id"
    )
    counts = {
        r["bucket"]: r["n"]
        for r in samp.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["bucket"]: r["n"]
        for r in assigned.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for b, n in sizes.items():
        budget = min(20, n)
        if budget == n:  # rate 1.0 keeps everything
            assert counts.get(b, 0) == n
        else:  # binomial around the budget: generous 4σ window
            sd = (budget * (1 - budget / n)) ** 0.5
            assert abs(counts.get(b, 0) - budget) <= 4 * sd + 1
    again = balanced_cluster_sample(
        assigned.repartition(5), per_cluster=20, method="rate", id_col="id"
    )
    assert sorted(r["id"] for r in samp.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_balanced_total_temperature_budgets(spark, blobs):
    _, assigned, _, _ = blobs
    # temperature=1: natural proportions; large T: near-uniform
    nat = balanced_cluster_sample(
        assigned, total=50, temperature=1.0, method="exact", id_col="id"
    )
    counts = {
        r["bucket"]: r["n"]
        for r in nat.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["bucket"]: r["n"]
        for r in assigned.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total_rows = sum(sizes.values())
    for b, n in sizes.items():
        assert counts.get(b, 0) == pytest.approx(50 * n / total_rows, abs=1.0)
    uni = balanced_cluster_sample(
        assigned, total=24, temperature=1000.0, method="exact", id_col="id"
    )
    ucounts = [
        r["n"]
        for r in uni.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    ]
    assert all(abs(c - 8) <= 1 for c in ucounts)


def test_rate_plan_is_broadcast_only(spark, blobs):
    _, assigned, _, _ = blobs
    samp = balanced_cluster_sample(
        assigned, per_cluster=5, method="rate", id_col="id"
    )
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_argument_validation(spark, blobs):
    _, assigned, _, _ = blobs
    with pytest.raises(ValueError, match="exactly one"):
        balanced_cluster_sample(assigned)
    with pytest.raises(ValueError, match="exactly one"):
        balanced_cluster_sample(assigned, per_cluster=3, total=10)
    with pytest.raises(ValueError, match="method"):
        balanced_cluster_sample(assigned, per_cluster=3, method="nope")
    with pytest.raises(ValueError, match="per_cluster"):
        cluster_prototypes(assigned, per_cluster=0)


@pytest.mark.slow
def test_parallel_init_recovers_blobs_on_every_seed(spark):
    """The reason cluster_corpus defaults to k-means||: with uniform
    hash seeding, seeds {2,3,5,7} miscluster this exact corpus
    (split/merge local optima — measured in the fixture sweep);
    k-means|| must recover the 3 blobs on ALL of them."""
    from sparvi_core_spark.operators.similarity import kmeans_fit, ivf_assign

    df = spark.createDataFrame(
        _blob_rows(), ["vec_id", "true_label", "embedding"]
    ).cache()
    for seed in range(8):
        cents, info = kmeans_fit(
            df, k=3, id_col="vec_id", vec_col="embedding",
            max_iter=20, seed=seed, init="parallel",
        )
        assigned = ivf_assign(df, cents, id_col="vec_id",
                              vec_col="embedding")
        j = assigned.join(df.select("vec_id", "true_label"),
                          assigned["id"] == F.col("vec_id"))
        worst = (
            j.groupBy("true_label")
            .agg(F.countDistinct("bucket").alias("nb"))
            .agg(F.max("nb"))
            .first()[0]
        )
        assert worst == 1, f"seed {seed}: blob split across buckets"
        assert assigned.select("bucket").distinct().count() == 3, (
            f"seed {seed}: blobs merged"
        )


@pytest.mark.slow
def test_parallel_init_layout_invariant(spark):
    from sparvi_core_spark.operators.similarity import kmeans_fit

    df = spark.createDataFrame(
        _blob_rows(), ["vec_id", "true_label", "embedding"]
    )
    a, _ = kmeans_fit(df.repartition(1), k=3, id_col="vec_id",
                      vec_col="embedding", seed=5, init="parallel")
    b, _ = kmeans_fit(df.repartition(7), k=3, id_col="vec_id",
                      vec_col="embedding", seed=5, init="parallel")
    ra = sorted(tuple(r["centroid"]) for r in a.collect())
    rb = sorted(tuple(r["centroid"]) for r in b.collect())
    # The candidate DRAW is layout-invariant (hash-keyed, so the same
    # rows are drawn under any partitioning); the centroid floats may
    # differ in the last ulp because distributed avg sums partitions
    # in layout order — compare with a tight tolerance, not bitwise.
    assert len(ra) == len(rb)
    for ca, cb in zip(ra, rb):
        assert ca == pytest.approx(cb, rel=1e-9, abs=1e-12)


def test_kmeans_init_validation(spark):
    from sparvi_core_spark.operators.similarity import kmeans_fit

    df = spark.createDataFrame(
        _blob_rows(), ["vec_id", "true_label", "embedding"]
    )
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(df, k=3, id_col="vec_id", vec_col="embedding",
                   init="nope")
