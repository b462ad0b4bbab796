"""Stateful streaming sessionizer vs batch sessionizer equality."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.timeseries import sessionize
from sparvi_core_spark.streaming.profile_stream import run_stream_to_memory, stream_events
from sparvi_core_spark.streaming.sessionize_stream import sessionize_stream


def test_stream_matches_batch_sessions(spark, sf_dir):
    from sparvi_core_spark.session import read_parquet_table

    path = f"{sf_dir}/events.parquet"
    batch = read_parquet_table(spark, path).filter(F.col("user_id") < 5)
    batch_sessions = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(batch, gap_seconds=1800).select(
            "user_id", "ts", "session_seq"
        ).collect()
    }
    assert batch_sessions

    stream = stream_events(spark, path).filter(F.col("user_id") < 5)
    out = sessionize_stream(stream, gap_seconds=1800)
    assert out.isStreaming
    run_stream_to_memory(out, "stream_sessions", output_mode="append")
    stream_sessions = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in spark.table("stream_sessions").collect()
    }
    assert stream_sessions == batch_sessions


def test_tws_matches_batch_sessions(spark, sf_dir):
    """transformWithStateInPandas variant (Spark 4 stateful API) must
    produce the identical session assignment; needs the RocksDB state
    store provider AND protobuf (the TWS state protocol) — skipped
    where protobuf is absent, mirroring the multimodal codec gate."""
    pytest.importorskip("google.protobuf")
    from sparvi_core_spark.session import read_parquet_table
    from sparvi_core_spark.streaming.sessionize_stream import sessionize_stream_tws

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        path = f"{sf_dir}/events.parquet"
        batch = read_parquet_table(spark, path).filter(F.col("user_id") < 5)
        batch_sessions = {
            (r["user_id"], r["ts"]): r["session_seq"]
            for r in sessionize(batch, gap_seconds=1800).select(
                "user_id", "ts", "session_seq"
            ).collect()
        }
        stream = stream_events(spark, path).filter(F.col("user_id") < 5)
        out = sessionize_stream_tws(stream, gap_seconds=1800)
        assert out.isStreaming
        run_stream_to_memory(out, "tws_sessions", output_mode="append")
        tws_sessions = {
            (r["user_id"], r["ts"]): r["session_seq"]
            for r in spark.table("tws_sessions").collect()
        }
        assert tws_sessions == batch_sessions
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
