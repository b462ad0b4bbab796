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

Crash safety: the swap is journaled. Before any compacted file enters
the store, a manifest (``.compact-manifest-*.json``) records both the
exact target names about to be created and the originals they
replace. The next ``compact_summary_store`` (or an explicit
``repair_summary_store``) replays it: if every compacted file landed,
the originals are deleted (roll forward); if the crash hit mid-move,
the partial compacted files are deleted and the originals — which are
never touched before the move loop finishes — remain authoritative
(roll back). Either way the store returns to exactly-one-copy.

Consistency note (local/HDFS-style filesystems): between "compacted
files moved in" and "old files removed" a concurrent reader can see
BOTH copies — a transient over-count, never data loss; a crash inside
that window is healed by the manifest replay above. Reports that
must be exact should simply not race the (seconds-long) compaction;
the store's contents are identical before and after. Rows are
rewritten verbatim (``batch_id`` and all columns preserved), so every
reader's semantics are unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession

_MANIFEST_PREFIX = ".compact-manifest-"


def repair_summary_store(path: str) -> dict:
    """Replay any crashed compaction swap at ``path``.

    Roll forward (delete originals) when every compacted file in the
    manifest exists; roll back (delete the partial compacted files)
    otherwise. Idempotent; a store with no manifest is a no-op.
    Returns ``{"manifests", "rolled_forward", "rolled_back"}``.
    """
    manifests = [
        f for f in os.listdir(path) if f.startswith(_MANIFEST_PREFIX)
    ]
    forward = back = 0
    for mf in manifests:
        mpath = os.path.join(path, mf)
        try:
            with open(mpath) as fh:
                manifest = json.load(fh)
        except (OSError, json.JSONDecodeError):
            # unreadable manifest: written but never acted on (moves
            # happen strictly after a successful manifest write) —
            # nothing to heal, drop it
            os.remove(mpath)
            continue
        new_files = manifest["new_files"]
        old_files = manifest["old_files"]
        if all(os.path.exists(os.path.join(path, f)) for f in new_files):
            # every compacted file landed: finish the swap
            for f in old_files:
                p = os.path.join(path, f)
                if os.path.exists(p):
                    os.remove(p)
            forward += 1
        else:
            # crash mid-move: originals are still complete — drop the
            # partial compacted copies
            for f in new_files:
                p = os.path.join(path, f)
                if os.path.exists(p):
                    os.remove(p)
            back += 1
        os.remove(mpath)
    return {
        "manifests": len(manifests),
        "rolled_forward": forward,
        "rolled_back": back,
    }


def compact_summary_store(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
) -> dict:
    """Compact the parquet summary store at ``path`` (a local/NFS
    directory of part files) down to ``target_files`` files.

    Returns ``{"files_before", "files_after", "rows"}``. A store
    already at or below the target is left untouched. Any interrupted
    previous compaction is healed first (see ``repair_summary_store``).
    """
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    repair_summary_store(path)
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
        produced = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        new_names = [
            f"compacted-{uuid.uuid4().hex}-{i}.parquet"
            for i in range(len(produced))
        ]
        # journal the swap BEFORE any compacted file enters the store:
        # a crash at any later point is healed by repair_summary_store
        manifest_path = os.path.join(
            path, f"{_MANIFEST_PREFIX}{uuid.uuid4().hex}.json"
        )
        mtmp = manifest_path + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"new_files": new_names, "old_files": old}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(mtmp, manifest_path)
        for src, dst in zip(produced, new_names):
            shutil.move(os.path.join(tmp, src), os.path.join(path, dst))
        for p in old_paths:
            os.remove(p)
        os.remove(manifest_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    remaining = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {
        "files_before": len(old),
        "files_after": len(remaining),
        "rows": rows,
    }
