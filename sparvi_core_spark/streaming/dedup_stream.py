"""Streaming exact deduplication — the ingest-time dedup stage of a
training-data pipeline (drop replayed/duplicated records before they
reach the corpus store).

``dropDuplicates`` on an unbounded stream keeps EVERY seen key in the
state store forever — unbounded state, the streaming scale-killer.
``dropDuplicatesWithinWatermark`` (Spark 3.5+) evicts keys once the
event-time watermark passes them, bounding state to
O(watermark horizon × key arrival rate): the correct trade for ingest
dedup, where duplicates arrive close together (retries, replays,
at-least-once sources) and a key recurring days later is a new record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(
    events: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows by ``subset`` key columns.

    Streaming input: watermark on ``ts_col`` + ``delay``, then
    ``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark horizon are dropped; state for a key is evicted once the
    watermark passes its event time. Batch input: plain
    ``dropDuplicates`` (identical semantics when the whole input is one
    batch), so the same function serves live ingest and backfill — the
    engine's standard batch/stream unification contract.
    """
    from sparvi_core_spark.streaming.profile_stream import ensure_event_time

    events = ensure_event_time(events, ts_col)
    if not events.isStreaming:
        return events.dropDuplicates(subset)
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        subset
    )
