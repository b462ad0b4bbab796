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
- **Exactly-once by construction (snapshot commits).** ``foreachBatch``
  redelivers a batch when the checkpoint commit didn't land; the sink
  commits ``last_stream_batch_id`` in the SAME manifest write as the
  append's counts AND file snapshot (one commit point) and skips
  batch ids it has already committed. A crash anywhere between the
  data append and that single write leaves the landed files
  referenced by NOTHING (readers scan the manifest's snapshot, never
  the directory), so the redelivered batch simply appends again —
  no intent marker, no id screen, no duplicate rows; the orphans
  wait for the index's ``vacuum`` verb.
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


def index_stream_batches(
    stream_df: DataFrame,
    path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
    files_per_bucket: int | None = None,
    staged: bool = False,
    auto_compact: int | None = None,
    auto_vacuum: float | None = None,
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
    cells once either debt passes the knob; ``auto_vacuum=S`` then
    runs ``vacuum_ivf_index(older_than_s=S)`` — the GC half of the
    in-stream maintenance policy (size S past the longest concurrent
    search; the pass is a listing when there is nothing old enough).
    The whole batch body holds the index's writer lock, so a cron
    compact can't interleave."""

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
            if auto_vacuum is not None:
                from sparvi_core_spark.sources.ann_index import (
                    vacuum_ivf_index,
                )

                vacuum_ivf_index(spark, path, older_than_s=auto_vacuum)

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
    auto_vacuum: float | None = None,
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
    already exist (``write_ivfpq_index``). ``staged=``/``auto_compact=``/
    ``auto_vacuum=`` behave as in :func:`index_stream_batches` (one
    staging file per trigger; fold in-stream once the gauge passes the
    knob; GC files unreferenced past the retention); the whole batch
    body holds the index's writer lock."""

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
            if _already_committed(spark, path, MANIFEST, int(batch_id)):
                return  # replayed batch: already committed, skip
            append_ivfpq_index(
                batch_df, path, files_per_bucket=files_per_bucket,
                staged=staged, stream_batch_id=int(batch_id),
            )
            if auto_compact is not None:
                compact_ivfpq_index_if(spark, path, auto_compact)
            if auto_vacuum is not None:
                from sparvi_core_spark.sources.ivfpq_index import (
                    vacuum_ivfpq_index,
                )

                vacuum_ivfpq_index(spark, path, older_than_s=auto_vacuum)

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
