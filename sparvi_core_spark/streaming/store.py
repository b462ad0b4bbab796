"""Maintenance for the append-only summary stores.

Every streaming monitor in this package (``profile_stream_batches``,
``drift_stream_batches``, ``topk_stream_batches``,
``validate_stream_batches``) appends one tiny parquet file per
micro-batch. That is the right WRITE shape — O(summary) per batch, no
read-modify-write — but a minute-level trigger produces ~half a
million files a year, and small-file listing overhead eventually
dominates every report read.

``compact_summary_store`` folds the accumulated files into a few
larger ones WITHOUT pausing the writer: it lists the store first,
reads and rewrites exactly those files, then removes them — files the
stream appends while compaction runs are untouched and survive. Safe
to run on a schedule from a maintenance job.

Consistency note (local/HDFS-style filesystems): between "compacted
files moved in" and "old files removed" a concurrent reader can see
BOTH copies — a transient over-count, never data loss. Reports that
must be exact should simply not race the (seconds-long) compaction;
the store's contents are identical before and after. Rows are
rewritten verbatim (``batch_id`` and all columns preserved), so every
reader's semantics are unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_summary_store(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
) -> dict:
    """Compact the parquet summary store at ``path`` (a local/NFS
    directory of part files) down to ``target_files`` files.

    Returns ``{"files_before", "files_after", "rows"}``. A store
    already at or below the target is left untouched.
    """
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    old = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    if len(old) <= target_files:
        return {
            "files_before": len(old),
            "files_after": len(old),
            "rows": None,
        }
    old_paths = [os.path.join(path, f) for f in old]
    df = spark.read.parquet(*old_paths)
    rows = df.count()
    tmp = os.path.join(
        os.path.dirname(path.rstrip("/")),
        f".{os.path.basename(path.rstrip('/'))}__compact_{uuid.uuid4().hex}",
    )
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    try:
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if not f.endswith(".parquet"):
                continue
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(path, f"compacted-{uuid.uuid4().hex}-{i}.parquet"),
            )
        for p in old_paths:
            os.remove(p)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    remaining = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {
        "files_before": len(old),
        "files_after": len(remaining),
        "rows": rows,
    }
