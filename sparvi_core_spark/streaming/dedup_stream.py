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

from pyspark.sql import DataFrame, functions as F


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


def dedup_stream_by_url(
    events: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    delay: str = "1 hour",
    strip_www: bool = True,
    keep_key: bool = False,
) -> DataFrame:
    """Streaming canonical-URL dedup — the crawl-ingest recrawl
    screen: canonicalize every URL (``functions.web.canonicalize_url``,
    a pure map-side projection — tracker params, case, default ports,
    fragments, trailing slashes all collapse) and drop rows whose
    canonical key was already seen within the watermark horizon.

    The composition is exactly :func:`dedup_stream_exact` over the
    derived key, so the state story is identical: keys evict once the
    watermark passes them, bounding state to O(horizon × arrival
    rate). A page recrawled days later re-enters — which is the
    CORRECT frontier behavior (recrawls outside the horizon are fresh
    observations; batch ``functions.web.dedup_by_url`` is the
    corpus-wide collapse). NULL urls get a per-row unique key
    (md5 of the whole row's struct), so they never collapse into one
    survivor — the batch operator's contract.

    Batch inputs take the same path with a plain ``dropDuplicates``,
    so one function serves live ingest and backfill. ``keep_key=True``
    retains the canonical key column (``__canon_url``) for downstream
    host rollups."""
    from sparvi_core_spark.functions.web import canonicalize_url

    tmp = "__canon_url"
    keyed = events.withColumn(
        tmp,
        F.coalesce(
            canonicalize_url(url_col, strip_www=strip_www),
            F.concat(F.lit("\x00null:"), F.md5(F.to_json(F.struct("*")))),
        ),
    )
    out = dedup_stream_exact(keyed, [tmp], ts_col=ts_col, delay=delay)
    return out if keep_key else out.drop(tmp)


def corpus_fingerprints(
    docs: DataFrame, text_col: str = "text", fp_col: str = "fingerprint"
) -> DataFrame:
    """Distinct exact-content fingerprints (md5 over normalized text) of
    an existing corpus — the static side for
    :func:`novelty_stream_exact`. Compute once at ingest time and store
    next to the corpus; 16 bytes/distinct doc."""
    from sparvi_core_spark.functions.text import normalize_text

    return docs.select(
        F.md5(normalize_text(text_col)).alias(fp_col)
    ).distinct()


def novelty_stream_exact(
    events: DataFrame,
    reference_fingerprints: DataFrame,
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Streaming ingest novelty screen: drop records whose normalized
    text already exists in the reference corpus.

    The streaming counterpart of
    :func:`~sparvi_core_spark.operators.dedup.novelty_filter`'s exact
    tier: the fingerprint is a PURE PROJECTION (md5 of normalized text
    — no shingle aggregation, so no streaming state), and the screen is
    a stream-static LEFT ANTI join against the stored fingerprint
    frame — natively supported by Structured Streaming, no watermark
    required, state-free. Near-dup screening of a stream needs the
    batch ``novelty_filter`` on micro-batch landings (``foreachBatch``)
    instead, because MinHash signatures are a per-doc aggregation.
    Batch inputs take the same path (the join is identical), so one
    function serves live ingest and backfill.
    """
    from sparvi_core_spark.functions.text import normalize_text

    keyed = events.withColumn("__fp", F.md5(normalize_text(text_col)))
    return keyed.join(
        reference_fingerprints,
        keyed["__fp"] == reference_fingerprints[fp_col],
        "left_anti",
    ).drop("__fp")
