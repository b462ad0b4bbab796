"""Mergeable profiles: batch-wise summaries must merge to what a
single whole-corpus profile computes — counts/min/max exactly; the
HLL distinct estimate within sketch error of the exact count on both
paths (single-scan sketches use the HIP estimator, merged ones the
composite estimator, so the two are close but not bit-identical)."""

import math

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.profiler.incremental import (
    merge_profiles,
    partition_profile,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _merged_dict(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_batched_merge_equals_single_scan(spark, orders):
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    # three arbitrary batches partitioning the table
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    parts = partition_profile(batches[0], cols, batch_id="b0")
    for i, b in enumerate(batches[1:], 1):
        parts = parts.unionByName(partition_profile(b, cols, batch_id=f"b{i}"))
    got = _merged_dict(merge_profiles(parts))

    whole = _merged_dict(
        merge_profiles(partition_profile(orders, cols, batch_id="all"))
    )
    exact = {
        c: orders.select(F.countDistinct(c)).first()[0] for c in cols
    }
    for c in cols:
        g, w = got[c], whole[c]
        assert g["n_rows"] == w["n_rows"]
        assert g["n_nulls"] == w["n_nulls"]
        # both the merged (composite estimator) and single-scan (HIP)
        # estimates must sit within sketch error of the exact count
        assert g["approx_distinct"] == pytest.approx(exact[c], rel=0.05), c
        assert w["approx_distinct"] == pytest.approx(exact[c], rel=0.05), c
        assert g["min_str"] == w["min_str"] and g["max_str"] == w["max_str"]
        if g["mean"] is not None:
            assert g["mean"] == pytest.approx(w["mean"], rel=1e-12)
            assert g["stddev"] == pytest.approx(w["stddev"], rel=1e-9)


def test_merge_is_batching_invariant(spark, orders):
    """Determinism pin: DIFFERENT batchings merge to the IDENTICAL
    estimate (union of the same value set → same registers), even
    though merged != single-scan."""
    cols = ["o_orderkey", "o_orderstatus"]
    by3 = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    by2 = [orders.filter(F.col("o_orderkey") % 2 == i) for i in range(2)]

    def merged(batches):
        parts = partition_profile(batches[0], cols, batch_id="0")
        for i, b in enumerate(batches[1:], 1):
            parts = parts.unionByName(
                partition_profile(b, cols, batch_id=str(i))
            )
        return _merged_dict(merge_profiles(parts))

    a, b = merged(by3), merged(by2)
    for c in cols:
        assert a[c]["approx_distinct"] == b[c]["approx_distinct"], c


def test_merged_stats_match_direct_aggregates(spark, orders):
    got = _merged_dict(
        merge_profiles(partition_profile(orders, ["o_totalprice"]))
    )["o_totalprice"]
    direct = orders.agg(
        F.count(F.lit(1)),
        F.countDistinct("o_totalprice"),
        F.min(F.col("o_totalprice").cast("double")),
        F.max(F.col("o_totalprice").cast("double")),
        F.avg("o_totalprice"),
        F.stddev_samp("o_totalprice"),
    ).first()
    assert got["n_rows"] == direct[0]
    # HLL default lg_k=12: ~1.6% standard error
    assert got["approx_distinct"] == pytest.approx(direct[1], rel=0.05)
    assert got["min"] == direct[2] and got["max"] == direct[3]
    assert got["mean"] == pytest.approx(direct[4], rel=1e-9)
    assert got["stddev"] == pytest.approx(direct[5], rel=1e-6)


def test_null_only_batch_merges_cleanly(spark):
    a = spark.createDataFrame(
        [(1.0,), (2.0,)], "x double"
    )
    b = spark.createDataFrame([(None,), (None,)], "x double")
    parts = partition_profile(a, batch_id="a").unionByName(
        partition_profile(b, batch_id="b")
    )
    got = _merged_dict(merge_profiles(parts))["x"]
    assert got["n_rows"] == 4 and got["n_nulls"] == 2
    assert got["mean"] == pytest.approx(1.5)
    assert got["stddev"] == pytest.approx(math.sqrt(0.5))
    assert got["min"] == 1.0 and got["max"] == 2.0


def test_non_numeric_columns_have_null_numeric_stats(spark, orders):
    got = _merged_dict(
        merge_profiles(partition_profile(orders, ["o_orderstatus"]))
    )["o_orderstatus"]
    assert got["mean"] is None and got["min"] is None
    assert got["min_str"] is not None
    assert got["approx_distinct"] >= 1


def test_summary_is_tiny(spark, orders):
    parts = partition_profile(orders)
    assert parts.count() == len(orders.columns)  # one row per column


def test_stream_profiles_merge_to_batch_equivalent(spark, tmp_path):
    """Micro-batch profiles written by the stream merge to the same
    stats as batch partition profiles over the same data (counts and
    min/max exact; one micro-batch here, so even the sketch agrees)."""
    from sparvi_core_spark.profiler.incremental import profile_stream_batches
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src = f"{SF_DIR}/events.parquet"
    store = str(tmp_path / "profiles")
    stream = stream_events(spark, src)
    q = profile_stream_batches(
        stream,
        store,
        cols=["user_id", "value"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = _merged_dict(merge_profiles(spark.read.parquet(store)))
    ev = spark.read.parquet(src)
    direct = ev.agg(
        F.count(F.lit(1)),
        F.min(F.col("value").cast("double")),
        F.max(F.col("value").cast("double")),
        F.avg("value"),
    ).first()
    assert got["value"]["n_rows"] == direct[0]
    assert got["value"]["min"] == direct[1]
    assert got["value"]["max"] == direct[2]
    assert got["value"]["mean"] == pytest.approx(direct[3], rel=1e-9)
    assert got["user_id"]["n_rows"] == direct[0]

    # restarting the SAME source against the same checkpoint adds
    # nothing (exactly-once summary rows)
    q2 = profile_stream_batches(
        stream,
        store,
        cols=["user_id", "value"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    again = _merged_dict(merge_profiles(spark.read.parquet(store)))
    assert again["value"]["n_rows"] == direct[0]
