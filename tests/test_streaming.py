"""Structured Streaming: windowed quality metrics, batch/stream equality."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.streaming.profile_stream import (
    run_stream_to_memory,
    stream_events,
    windowed_quality_metrics,
)


def test_batch_stream_equivalence(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    # the nanos-ts parquet needs the conversion path; read via the registry
    from sparvi_core_spark.session import read_parquet_table

    batch = read_parquet_table(spark, path)
    batch_out = windowed_quality_metrics(
        batch, ts_col="ts", window="1 hour",
        group_cols=["event_type"], numeric_cols=["value"],
    )
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_rows"], r["avg_value"])
        for r in batch_out.collect()
    }
    assert batch_rows, "batch windowed metrics must produce rows"

    stream = stream_events(spark, path)
    stream_out = windowed_quality_metrics(
        stream, ts_col="ts", window="1 hour",
        group_cols=["event_type"], numeric_cols=["value"],
    )
    assert stream_out.isStreaming
    run_stream_to_memory(stream_out, "stream_metrics", output_mode="complete")
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_rows"], r["avg_value"])
        for r in spark.table("stream_metrics").collect()
    }
    assert stream_rows == batch_rows


def test_watermark_applied_to_stream_only(spark, sf_dir):
    from sparvi_core_spark.session import read_parquet_table

    path = f"{sf_dir}/events.parquet"
    batch = read_parquet_table(spark, path)
    out = windowed_quality_metrics(batch, numeric_cols=["value"])
    assert not out.isStreaming  # no watermark error on batch input
    assert "window_start" in out.columns and "window_end" in out.columns
