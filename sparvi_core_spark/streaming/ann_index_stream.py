"""Streaming ingest into the stored IVF index — micro-batches of new
vectors land in the index's cell partitions as they arrive.

A continuous embedding pipeline (crawl → embed → index) shouldn't
batch up a day of vectors before they become searchable. This adapter
runs :func:`sources.ann_index.append_ivf_index` per micro-batch via
``foreachBatch``: each batch pays one broadcast-centroid assignment
over JUST the new rows plus a parquet append into the touched cells —
the same cost shape as the batch append, at micro-batch grain. No
analog in the reference engine (SURVEY.md §2.8 — profiling surface
only); part of the training-data-pipeline extension surface.

Scale + delivery semantics:

- **Per-batch cost is O(batch), never O(index).** The stored corpus
  is not read; only the centroid table (k × dim, broadcast) and the
  manifest (k counters) are touched per trigger.
- **Replay-safe at the commit boundary — including the crash window
  inside a batch.** ``foreachBatch`` redelivers a batch when the
  checkpoint commit didn't land; the sink commits
  ``last_stream_batch_id`` in the SAME manifest write as the append's
  counts (one commit point) and skips batch ids it has already
  committed. The residual window — a crash between the data append
  and that single manifest write — is fenced by a write-ahead intent
  marker (``_stream_intent.json``, written before any data lands):
  a redelivered batch whose id matches the intent is a crashed
  attempt, and the re-run screens the batch at id grain against the
  touched cells ∪ staging (bucket-pruned, column-pruned — O(batch)
  cells' id bytes, never O(index)), appends only the missing split,
  and counts the full batch, healing both data and manifest. The hot
  path pays one tiny intent write per trigger and NO screen.
- **Fragmentation is the compactor's job.** Every trigger adds up to
  ``files_per_bucket`` files to each touched cell by design — run
  ``compact_ivf_index`` on a maintenance schedule, exactly like the
  summary stores (``streaming.store``).
- **Single writer by contract**, like the batch append: one streaming
  query per index path, maintenance quiesced around compaction. One
  CHECKPOINT per index path, too: batch ids are monotonic only within
  a checkpoint, so pointing a FRESH checkpoint at an index that
  already carries ``last_stream_batch_id`` makes the fence skip the
  new stream's first batches — resume the old checkpoint, or clear
  ``last_stream_batch_id`` from the manifest when deliberately
  re-streaming from scratch.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def _already_committed(spark, path: str, manifest_name: str, batch_id: int):
    """The snapshot-commit fence: a batch id at or below the
    manifest's ``last_stream_batch_id`` already committed (its counts,
    file snapshot, and batch id landed in ONE manifest write) — skip
    it. Anything else simply runs: if a prior attempt crashed after
    its data landed but before its commit, those files are referenced
    by nothing (readers scan the snapshot, never the directory), so
    re-appending is exactly-once by construction and the orphans wait
    for vacuum."""
    from sparvi_core_spark.sources.ann_index import _read_text

    manifest = json.loads(_read_text(spark, path, manifest_name))
    return batch_id <= manifest.get("last_stream_batch_id", -1)


def _replay_suspected(spark, path: str, manifest_name: str, batch_id: int):
    """The sink's per-batch fence. Returns None when the batch is
    already committed (skip it), True when a write-ahead intent for
    THIS batch id is on disk — a prior attempt crashed between its
    data append and its manifest commit, so the re-run must screen at
    id grain — else False after writing the intent marker (the normal
    hot path: one tiny file write, no screen)."""
    from sparvi_core_spark.sources.ann_index import (
        STREAM_INTENT,
        _index_fs,
        _read_text,
        _write_text,
    )

    manifest = json.loads(_read_text(spark, path, manifest_name))
    if batch_id <= manifest.get("last_stream_batch_id", -1):
        return None
    _, fs, mkpath = _index_fs(spark, path)
    if fs.exists(mkpath(f"{path}/{STREAM_INTENT}")):
        try:
            intent = json.loads(_read_text(spark, path, STREAM_INTENT))
            if int(intent.get("batch_id", -1)) == batch_id:
                return True
        except Exception:
            return True  # torn intent: treat as a crashed attempt
    _write_text(
        spark, path, STREAM_INTENT, json.dumps({"batch_id": batch_id})
    )
    return False


def _clear_intent(spark, path: str) -> None:
    from sparvi_core_spark.sources.ann_index import (
        STREAM_INTENT,
        _index_fs,
    )

    _, fs, mkpath = _index_fs(spark, path)
    ip = mkpath(f"{path}/{STREAM_INTENT}")
    if fs.exists(ip):
        fs.delete(ip, False)


def index_stream_batches(
    stream_df: DataFrame,
    path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
    files_per_bucket: int | None = None,
    staged: bool = False,
    auto_compact: int | None = None,
):
    """Append every micro-batch of ``stream_df`` (which must carry the
    index's ``id_col``/``vec_col``) into the stored IVF index at
    ``path``. The index must already exist (``write_ivf_index``).
    Returns the started ``StreamingQuery``; ``available_now=True``
    drains the current source and stops.

    ``staged=True`` routes each batch through the staging store (ONE
    file creation per trigger instead of up to ``files_per_bucket``
    per touched cell — the object-store-friendly micro-batch path);
    ``auto_compact=N`` runs ``compact_ivf_index_if(path, N)`` after
    the batch's manifest commit, folding staged rows and fragmented
    cells once either debt passes the knob. The whole batch body holds
    the index's writer lock, so a cron compact can't interleave."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        from sparvi_core_spark.sources.ann_index import (
            MANIFEST,
            append_ivf_index,
            compact_ivf_index_if,
            writer_lock,
        )

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        with writer_lock(spark, path, "stream-batch"):
            if _already_committed(spark, path, MANIFEST, int(batch_id)):
                return  # replayed batch: already committed, skip
            append_ivf_index(
                batch_df, path, files_per_bucket=files_per_bucket,
                staged=staged, stream_batch_id=int(batch_id),
            )
            if auto_compact is not None:
                # after the commit: a crash mid-compaction replays
                # nothing; the snapshot-committed swap heals via repair
                compact_ivf_index_if(spark, path, auto_compact)

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def index_pq_stream_batches(
    stream_df: DataFrame,
    path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
    files_per_bucket: int | None = None,
    staged: bool = False,
    auto_compact: int | None = None,
):
    """The coded-index twin of :func:`index_stream_batches`: append
    every micro-batch into a stored IVF-PQ index
    (``sources.ivfpq_index``) — per batch, one assignment + one
    residual PQ encode against the FROZEN stored models, then a
    parquet append of (id, codes) into the touched cells (and of the
    raw vectors into ``_floats/`` when the index stores them). Same
    O(batch) cost shape, replay-skip commit semantics, single-writer
    contract, and compact-on-schedule story as the float twin —
    fragmentation goes to ``compact_ivfpq_index``. The index must
    already exist (``write_ivfpq_index``). ``staged=``/``auto_compact=``
    behave as in :func:`index_stream_batches` (one staging file per
    trigger; fold in-stream once the gauge passes the knob); the whole
    batch body holds the index's writer lock."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        from sparvi_core_spark.sources.ann_index import writer_lock
        from sparvi_core_spark.sources.ivfpq_index import (
            MANIFEST,
            append_ivfpq_index,
            compact_ivfpq_index_if,
        )

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        with writer_lock(spark, path, "stream-batch"):
            suspect = _replay_suspected(
                spark, path, MANIFEST, int(batch_id)
            )
            if suspect is None:
                return  # replayed batch: already committed, skip
            append_ivfpq_index(
                batch_df, path, files_per_bucket=files_per_bucket,
                staged=staged, stream_batch_id=int(batch_id),
                screen_existing=suspect,
            )
            _clear_intent(spark, path)
            if auto_compact is not None:
                compact_ivfpq_index_if(spark, path, auto_compact)

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
