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


def novelty_stream_fuzzy(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    threshold: float | None = None,
    max_bucket: int = 1000,
    grow_index: bool = True,
    checkpoint: str | None = None,
    available_now: bool = True,
    auto_compact: int | None = None,
    staged_append: bool = False,
    auto_vacuum: float | None = None,
):
    """Streaming NEAR-duplicate novelty screen against the stored
    MinHash index (``sources.minhash_index``): per micro-batch, drop
    docs with a near-dup already in the index, land the survivors in
    ``sink_path`` (parquet append), and — with ``grow_index`` — append
    the survivors' signatures into the index, so batch N+1 dedups
    against everything batch N admitted. This is the in-stream form of
    the crawl-ingest loop: the historical corpus is never re-signed;
    each trigger pays O(batch) signing plus a probe that reads only the
    batch's band buckets.

    MinHash signatures are a per-doc aggregation, which Structured
    Streaming can't express stream-natively (the reason
    :func:`novelty_stream_exact` exists for the exact tier), so this
    runs through ``foreachBatch`` like the ANN index sinks. Replay
    safety is snapshot commits (see ``sources.ann_index``): the
    batch's survivors, the index's counts + file snapshot, and
    ``last_stream_batch_id`` all publish in the append's ONE manifest
    write. A batch replayed after that commit is skipped whole by the
    batch-id fence; a batch replayed after a crash BEFORE it re-runs
    against an index that provably does not contain the crashed
    attempt (its files are referenced by nothing), so the screen
    recomputes the identical survivor set — mutual batch-internal
    near-dups included — rewrites the same ``batch_id=N`` sink
    partition, and appends again; the orphans wait for
    ``vacuum_minhash_index``. On the NORMAL path an already-indexed
    id in the batch is an upstream re-emission (a cross-batch
    unique-id contract violation): it is not novel and is DROPPED —
    never re-appended, and its (possibly changed) text never bypasses
    the screen. Batch-internal duplicates are out of scope (they
    arrive together — the batch dedup ops own them); a doc
    near-duplicating only same-batch peers is admitted once with its
    peers.

    Readers see the sink as ordinary partitioned parquet
    (``spark.read.parquet(sink_path)``) with a synthesized
    ``batch_id`` column for provenance.

    ``staged_append=True`` lands each batch's index append in the
    staging store (two file creations per batch instead of one small
    file per touched bucket of both stores — the O(1) ingest path for
    streaming-grain batches); pair it with ``auto_compact`` so staged
    batches fold into the bucket partitions before the staging scan
    cost builds up. Probes read staged rows transparently, so the
    screen semantics are identical.

    ``auto_compact=N`` runs ``compact_minhash_index_if(path, N)``
    after each batch's manifest commit (still inside the batch's
    writer lock): every small append fragments both stores, and a
    stream that appends for days without maintenance ends with probes
    ~2.7× slower (round-9 lifecycle study) — the knob folds buckets
    back once any exceeds N files, keeping probe latency flat without
    an operator-scheduled compact. It runs AFTER the commit, so a
    crash mid-compaction replays nothing (the journaled swap heals via
    ``repair_minhash_index``). ``auto_vacuum=S`` then runs
    ``vacuum_minhash_index(older_than_s=S)`` — the GC half of the
    in-stream policy (size S past the longest concurrent probe; a
    listing-only pass when nothing is old enough).

    Returns the started ``StreamingQuery``. The index must already
    exist (``write_minhash_index``); single writer per index path, as
    with every stored index."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        import json

        from sparvi_core_spark.sources.ann_index import (
            _read_text,
            _write_text,
        )
        from sparvi_core_spark.sources.minhash_index import (
            MANIFEST,
            append_minhash_index,
            filter_new_against_index,
            filter_unindexed_ids,
        )

        from sparvi_core_spark.sources.ann_index import writer_lock

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # hold the index's writer lock across the WHOLE batch body
        # (screen -> sink -> append -> manifest commit), so a
        # concurrent maintenance writer (e.g. a cron `dedup-index
        # compact`) fails cleanly instead of interleaving file swaps
        # with this batch; the inner append's own lock is reentrant
        with writer_lock(spark, index_path, "stream-batch"):
            manifest = json.loads(_read_text(spark, index_path, MANIFEST))
            if int(batch_id) <= manifest.get("last_stream_batch_id", -1):
                return  # replayed batch: already screened + landed, skip
            # re-emitted already-indexed ids are NOT novel — dropped
            # here, so their (possibly changed) text never bypasses
            # the near-dup screen. A crash-replayed batch re-runs this
            # split against an index that provably does not contain
            # the crashed attempt (snapshot commits: its files are
            # referenced by nothing), so the survivor set recomputes
            # identically — mutual batch-internal near-dups included.
            unindexed = filter_unindexed_ids(
                spark, index_path, batch_df
            ).localCheckpoint()  # one answer for the screen AND the sink
            survivors = filter_new_against_index(
                spark, index_path, unindexed, threshold, max_bucket
            ).localCheckpoint()  # screen ONCE; sink and index see one answer
            # idempotent sink: a replayed batch rewrites its own
            # partition directory instead of appending duplicates
            survivors.write.mode("overwrite").parquet(
                f"{sink_path}/batch_id={int(batch_id)}"
            )
            if grow_index:
                # the survivors, the index's file snapshot, and the
                # batch-id fence commit in the append's ONE manifest
                # write — a crash anywhere before it leaves nothing
                # referenced, a crash after it is fenced by batch id
                append_minhash_index(
                    spark, index_path, survivors, staged=staged_append,
                    stream_batch_id=int(batch_id),
                )
            else:
                manifest["last_stream_batch_id"] = int(batch_id)
                _write_text(
                    spark, index_path, MANIFEST,
                    json.dumps(manifest, indent=1, sort_keys=True),
                )
            if auto_compact is not None and grow_index:
                # after the commit: a crash here replays nothing, and
                # compaction reads the manifest fresh from disk (the
                # batch-id commit above is preserved). Reentrant under
                # this batch's writer lock.
                from sparvi_core_spark.sources.minhash_index import (
                    compact_minhash_index_if,
                )

                compact_minhash_index_if(spark, index_path, auto_compact)
            if auto_vacuum is not None and grow_index:
                # the GC half of the in-stream policy: reclaim files
                # unreferenced for longer than the retention window
                # (size it past the longest concurrent probe) — a
                # listing-only pass when nothing qualifies
                from sparvi_core_spark.sources.minhash_index import (
                    vacuum_minhash_index,
                )

                vacuum_minhash_index(
                    spark, index_path, older_than_s=auto_vacuum
                )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
