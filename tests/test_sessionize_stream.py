"""Stateful streaming sessionizer vs batch sessionizer equality."""

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
