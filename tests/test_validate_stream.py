"""Continuous validation: the same rule DSL runs per micro-batch, a
rule that breaks mid-stream is attributed to the batch that broke it,
and per-rule error isolation survives the streaming path."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.streaming.validate_stream import (
    validate_stream_batches,
    validation_history,
)


def _run(spark, df, rules, tmp_path, name, files=3):
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src = str(tmp_path / f"src_{name}")
    df.write.parquet(src)  # one file per existing partition
    store = str(tmp_path / f"store_{name}")
    q = validate_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        rules,
        view_name="batch_events",
        path=store,
        checkpoint=str(tmp_path / f"ckpt_{name}"),
    )
    q.awaitTermination()
    return store


def test_per_batch_results_and_failure_attribution(spark, tmp_path):
    # 3 single-partition files = 3 micro-batches; values go negative
    # only near the very top of the id range (repartitionByRange
    # boundaries are sample-estimated, so stay well inside the last
    # range to land every negative in ONE file)
    df = (
        spark.range(3000)
        .select(
            F.col("id"),
            F.when(F.col("id") >= 2950, -1.0).otherwise(1.0).alias("value"),
        )
        .repartitionByRange(3, "id")
    )
    rules = [
        {
            "name": "no_negative_values",
            "query": "SELECT COUNT(*) FROM batch_events WHERE value < 0",
            "operator": "equals",
            "expected_value": 0,
        },
        {
            "name": "batch_nonempty",
            "query": "SELECT COUNT(*) FROM batch_events",
            "operator": "greater_than",
            "expected_value": 0,
        },
    ]
    store = _run(spark, df, rules, tmp_path, "attr")
    res = spark.read.parquet(store)
    assert res.select("batch_id").distinct().count() == 3

    hist = {
        r["name"]: r.asDict()
        for r in validation_history(spark, store).collect()
    }
    assert hist["batch_nonempty"]["n_failed"] == 0
    assert hist["no_negative_values"]["n_failed"] == 1
    # the failing batch is identifiable
    bad = hist["no_negative_values"]["first_failed_batch"]
    row = res.filter(
        (F.col("name") == "no_negative_values") & (F.col("batch_id") == bad)
    ).first()
    assert row["is_valid"] is False and row["actual_value"] == "50"


def test_rule_error_isolation_in_stream(spark, tmp_path):
    df = spark.range(100).select(F.col("id"), F.lit(1.0).alias("value"))
    rules = [
        {
            "name": "broken_sql",
            "query": "SELECT nonexistent_col FROM batch_events",
            "operator": "equals",
            "expected_value": 0,
        },
        {
            "name": "fine",
            "query": "SELECT COUNT(*) FROM batch_events",
            "operator": "greater_than",
            "expected_value": 0,
        },
    ]
    store = _run(spark, df.coalesce(1), rules, tmp_path, "iso", files=1)
    res = {r["name"]: r.asDict() for r in spark.read.parquet(store).collect()}
    assert res["fine"]["is_valid"] is True
    assert res["broken_sql"]["is_valid"] is False
    assert res["broken_sql"]["error"] is not None


def test_min_batch_filter(spark, tmp_path):
    df = spark.range(900).select(
        F.col("id"), F.lit(1.0).alias("value")
    ).repartitionByRange(3, "id")
    rules = [{
        "name": "nonempty",
        "query": "SELECT COUNT(*) FROM batch_events",
        "operator": "greater_than",
        "expected_value": 0,
    }]
    store = _run(spark, df, rules, tmp_path, "minb")
    all_hist = validation_history(spark, store).first()
    late_hist = validation_history(spark, store, min_batch_id=2).first()
    assert late_hist["n_batches"] < all_hist["n_batches"]
