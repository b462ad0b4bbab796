"""Training-shard export: the pipeline's last mile.

After ``prepare_corpus`` → (optionally) ``pack_chunked`` /
``pack_greedy``, a training run wants the corpus as N roughly-equal
shards it can stream independently: each data-loader worker owns a
subset of shards, epochs reshuffle at shard granularity, and resuming
mid-epoch is a shard offset. This module writes that layout with one
shuffle and records a manifest the loader can trust without listing
the store.

Design, 100 TB first:

* **Shard membership is a pure function of the row id** —
  ``pmod(xxhash64(id, seed), n_shards)`` — not of partitioning or
  arrival order. Re-running on a repartitioned/appended corpus maps
  unchanged ids to unchanged shards (the same argument as
  ``sampling.hash_split``), and membership is reproducible off-cluster
  from (id, seed, n_shards) alone.
* **One exchange**: rows shuffle straight to their shard directory
  via hive-style ``partitionBy("shard")``; no global sort. Intra-shard
  order is deterministic (sorted by a second hash within partitions —
  a seeded shuffle, which is what training wants) but split across
  however many files the shard's writers produce; loaders should
  still shuffle a window at read time, as they would anyway.
* **The manifest is computed from the SAME frame that was written**
  (one groupBy over the shard key): per-shard row counts — and token
  sums when a ``tokens_col`` is given — so a loader can size epochs
  and spot truncated shards without a full scan.

A shard is a DIRECTORY (``shard=K/``), the Spark-idiomatic shape:
``spark.read.parquet(path)`` restores the full corpus with the shard
column back; a single worker reads ``path/shard=K``. Writing exactly
one file per shard is deliberately NOT promised — that would force a
single task per shard regardless of shard size; per-file granularity
inside a shard is the engine's business (tune
``spark.sql.files.maxRecordsPerFile`` if a hard file cap matters).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, functions as F


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    out: str = "shard",
) -> DataFrame:
    """Add the deterministic shard id column (no shuffle, no action)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        out,
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast(
            "int"
        ),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    rows_per_shard: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    seed: int = 42,
    write_mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as hive-partitioned training shards + a manifest.

    Exactly one of ``n_shards`` / ``rows_per_shard`` must be given
    (``rows_per_shard`` counts the corpus once and derives
    ``n_shards = ceil(rows / rows_per_shard)``).

    Returns (and writes to ``<path>/_manifest.json``) the manifest::

        {"n_shards": N, "rows": total, "seed": s, "id_col": ...,
         "tokens": total_or_null,
         "shards": [{"shard": k, "rows": r, "tokens": t_or_null}, ...]}

    Every shard id in ``range(n_shards)`` appears in ``shards`` — an
    empty shard (possible only for tiny corpora) appears with
    ``rows=0`` so loaders can iterate ``range(n_shards)`` blindly.
    """
    if (n_shards is None) == (rows_per_shard is None):
        raise ValueError("pass exactly one of n_shards / rows_per_shard")
    if rows_per_shard is not None:
        if rows_per_shard < 1:
            raise ValueError(
                f"rows_per_shard must be >= 1, got {rows_per_shard}"
            )
        total = df.count()
        n_shards = max(1, math.ceil(total / rows_per_shard))

    sharded = shard_assignment(df, n_shards, id_col=id_col, seed=seed)
    # one exchange on the shard key; within each task, rows sort by an
    # independent hash — a seeded intra-shard shuffle for training
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(
            "shard", F.xxhash64(F.col(id_col), F.lit(seed + 1))
        )
        .write.mode(write_mode)
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )

    agg = [F.count(F.lit(1)).alias("rows")]
    if tokens_col is not None:
        agg.append(F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
    stats = {
        r["shard"]: r for r in sharded.groupBy("shard").agg(*agg).collect()
    }
    shards = [
        {
            "shard": k,
            "rows": int(stats[k]["rows"]) if k in stats else 0,
            "tokens": (
                int(stats[k]["tokens"])
                if tokens_col is not None and k in stats
                else None
            ),
        }
        for k in range(n_shards)
    ]
    manifest = {
        "n_shards": n_shards,
        "rows": sum(s["rows"] for s in shards),
        "tokens": (
            sum(s["tokens"] for s in shards) if tokens_col is not None else None
        ),
        "seed": seed,
        "id_col": id_col,
        "format": fmt,
        "shards": shards,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_manifest(path: str) -> dict:
    """Load the shard manifest written by ``write_training_shards``."""
    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)
