"""Sample-based profile: estimates must bracket the true full-scan
values within the reported confidence intervals (fixed seed → a
deterministic draw; the fixture columns are well-behaved, so the 95%
intervals are checked with a small slack factor rather than
probabilistically)."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.profiler.approx import sample_profile

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_row_count_estimate_within_ci(spark, lineitem):
    true_n = lineitem.count()
    p = sample_profile(lineitem, fraction=0.1, cols=["l_quantity"])
    assert abs(p["row_count_est"] - true_n) <= 2 * p["row_count_ci"]
    assert 0 < p["sampled_rows"] < true_n


def test_mean_estimate_within_ci(spark, lineitem):
    true_mean = lineitem.agg(F.avg("l_extendedprice")).first()[0]
    p = sample_profile(lineitem, fraction=0.1, cols=["l_extendedprice"])
    c = p["columns"]["l_extendedprice"]
    assert c["mean_ci"] is not None
    assert abs(c["mean"] - true_mean) <= 2 * c["mean_ci"]


def test_null_fraction_estimate(spark):
    df = spark.range(0, 20_000).withColumn(
        "x", F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id"))
    )
    p = sample_profile(df, fraction=0.2, cols=["x"])
    c = p["columns"]["x"]
    assert abs(c["null_fraction"] - 0.25) <= 3 * c["null_fraction_ci"]


def test_distinct_is_lower_bound_semantics(spark, lineitem):
    """distinct_seen never exceeds the full-scan distinct (beyond HLL
    error) — the documented lower-bound contract."""
    true_d = lineitem.select("l_orderkey").distinct().count()
    p = sample_profile(lineitem, fraction=0.1, cols=["l_orderkey"])
    assert p["columns"]["l_orderkey"]["distinct_seen"] <= true_d * 1.05


def test_deterministic_for_fixed_seed(spark, lineitem):
    a = sample_profile(lineitem, fraction=0.05, cols=["l_tax"], seed=7)
    b = sample_profile(lineitem, fraction=0.05, cols=["l_tax"], seed=7)
    assert a == b


def test_fraction_one_is_exact(spark, lineitem):
    p = sample_profile(lineitem, fraction=1.0, cols=["l_quantity"])
    assert p["row_count_est"] == lineitem.count()
    assert p["row_count_ci"] == 0.0


def test_invalid_fraction_rejected(spark, lineitem):
    with pytest.raises(ValueError):
        sample_profile(lineitem, fraction=0.0)
    with pytest.raises(ValueError):
        sample_profile(lineitem, fraction=1.5)


def test_single_aggregation_plan(spark, lineitem):
    """The whole profile is ONE action over the sampled scan — no
    per-column jobs (the at-scale contract). A single ``.first()`` may
    launch up to two Spark jobs (partial-limit retry), so the pin is
    <= 2 — what it guards against is the O(columns) job explosion."""
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    sample_profile(lineitem, fraction=0.1, cols=["l_quantity", "l_tax"])
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert len(after) - len(before) <= 2
