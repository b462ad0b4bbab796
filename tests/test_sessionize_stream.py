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


def test_tws_processor_semantics_without_runtime(spark, sf_dir):
    """Vendored minimal check for the TWS processor: drive
    make_session_processor() through a fake state handle — the exact
    surface the TWS runtime provides (getValueState →
    exists/get/update) — feeding each user's events as multiple
    unordered Arrow-style chunks across several 'micro-batches', and
    require the identical assignment to batch sessionize. This runs
    everywhere (no protobuf / RocksDB needed), so the TWS path's
    session logic never ships unexecuted."""
    import pandas as pd

    from sparvi_core_spark.session import read_parquet_table
    from sparvi_core_spark.streaming.sessionize_stream import (
        make_session_processor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    path = f"{sf_dir}/events.parquet"
    batch = read_parquet_table(spark, path).filter(F.col("user_id") < 5)
    batch_sessions = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(batch, gap_seconds=1800)
        .select("user_id", "ts", "session_seq")
        .collect()
    }
    assert batch_sessions

    events = (
        batch.select("user_id", "ts").orderBy("user_id", "ts").toPandas()
    )
    got = {}
    for uid, grp in events.groupby("user_id"):
        proc = make_session_processor(gap_seconds=1800)
        proc.init(FakeHandle())
        # split this user's ordered events into 3 micro-batches, and
        # feed each batch as 2 shuffled chunks (chunk order carries no
        # guarantee — the processor must sort per key per batch)
        n = len(grp)
        for b in range(3):
            part = grp.iloc[b * n // 3 : (b + 1) * n // 3]
            if part.empty:
                continue
            shuffled = part.sample(frac=1.0, random_state=b)
            chunks = [shuffled.iloc[::2], shuffled.iloc[1::2]]
            for out in proc.handleInputRows((uid,), iter(chunks), None):
                for r in out.itertuples(index=False):
                    got[(r.user_id, pd.Timestamp(r.ts).to_pydatetime())] = (
                        r.session_seq
                    )
        proc.close()

    assert got == batch_sessions
