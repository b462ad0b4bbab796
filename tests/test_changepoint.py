"""EWMA control chart over metric series: a level shift flags at the
shift point, stable noise never flags, warm-up is respected, and
series are scored independently."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.profiler.changepoint import (
    detect_metric_changepoints,
    ewma_flags,
)

_SCHEMA = "table string, timestamp string, metric string, column string, value double"


def _series(spark, values, metric="row_count", table="t", column=None):
    rows = [
        (table, f"2026-01-{i+1:02d}T000000", metric, column, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_level_shift_flags_at_shift_point(spark):
    # stable around 100 (±1 alternating), then jumps to 200
    vals = [100, 101, 99, 100, 101, 99, 100, 101, 200, 200]
    out = ewma_flags(_series(spark, vals), min_points=5).orderBy("timestamp").collect()
    flags = [r["is_anomaly"] for r in out]
    assert flags[8] is True            # the jump
    assert not any(flags[:8])          # stable prefix never flags


def test_stable_noisy_series_never_flags(spark):
    vals = [100, 102, 98, 101, 99, 100, 103, 97, 101, 99, 100, 102]
    out = ewma_flags(_series(spark, vals)).collect()
    assert not any(r["is_anomaly"] for r in out)


def test_warmup_respected(spark):
    # the shift happens INSIDE the warm-up window → not flagged
    vals = [100, 100, 200, 200, 200]
    out = ewma_flags(_series(spark, vals), min_points=5).collect()
    assert not any(r["is_anomaly"] for r in out)


def test_series_scored_independently(spark):
    a = _series(spark, [100] * 8 + [500], table="a")
    b = _series(spark, [7] * 9, table="b")
    out = ewma_flags(a.unionByName(b), min_points=5)
    got = {
        (r["table"], r["timestamp"]): r["is_anomaly"] for r in out.collect()
    }
    assert got[("a", "2026-01-09T000000")] is True
    assert not any(v for (t, _), v in got.items() if t == "b")


def test_store_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "metrics")
    big = _series(spark, [100] * 8 + [1000], table="orders")
    small = _series(spark, [5] * 9, table="nation")
    big.unionByName(small).write.partitionBy("table").parquet(path)
    flagged = detect_metric_changepoints(spark, path, table="orders").collect()
    assert len(flagged) == 1
    assert flagged[0]["value"] == 1000.0
    assert detect_metric_changepoints(spark, path, table="nation").count() == 0


def test_invalid_params_rejected(spark):
    s = _series(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        ewma_flags(s, alpha=0.0)
    with pytest.raises(ValueError):
        ewma_flags(s, min_points=1)


def test_batch_series_from_summary_store_flags_shifted_batch(spark):
    """incremental summary store → per-batch metric series → EWMA:
    the batch whose mean shifted is identified, with no data rescans."""
    from pyspark.sql import functions as F2

    from sparvi_core_spark.profiler.changepoint import (
        batch_metric_series,
        ewma_flags,
    )
    from sparvi_core_spark.profiler.incremental import partition_profile

    parts = None
    for b in range(9):
        base = spark.range(1000).select(
            (F2.col("id") % 97 + (500 if b == 8 else 0))
            .cast("double").alias("x")
        )
        p = partition_profile(base, ["x"], batch_id=f"b{b}")
        parts = p if parts is None else parts.unionByName(p)
    series = batch_metric_series(parts)
    flagged = (
        ewma_flags(series, min_points=5)
        .filter("is_anomaly")
        .collect()
    )
    assert any(
        r["metric"] == "mean" and r["timestamp"] == "b8" for r in flagged
    )
    assert not any(r["timestamp"] != "b8" for r in flagged)
