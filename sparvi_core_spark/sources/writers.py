"""Sink-side helpers: partitioned and bucketed writes.

The reference's sinks are JSON/YAML artifacts (profiles, rules); a
Spark engine's sinks are tables. Two layouts matter at 100 TB:

- **partitioned parquet** (`partitionBy`): partition pruning turns
  predicate pushdown into skipped directories — the first lever for
  scan cost on date/tenant-keyed facts.
- **bucketed tables** (`bucketBy` + `saveAsTable`): co-located joins —
  two tables bucketed on the join key by the same bucket count join
  with NO shuffle exchange on either side (asserted in tests). This is
  the offline answer to the repeated-shuffle-join problem: pay the
  shuffle once at write time, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    df.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Export a corpus as exactly ``n_shards`` shard directories
    (``shard=K/part-*``), the layout training dataloaders consume (one
    worker per shard, resumable by shard id).

    Three properties a ``df.repartition(n).write`` does NOT give:

    - **Deterministic membership**: shard = ``xxhash64(id, salt) mod
      n_shards`` — a pure function of the row, so re-running the export
      (or re-exporting after an upstream re-run) puts every document in
      the same shard. Round-robin repartition depends on input
      partitioning and is not reproducible.
    - **Deterministic within-shard order**: rows are sorted inside each
      shard by a second keyed hash — a reproducible global shuffle,
      which is exactly what sequential shard readers need (stable
      batches across re-exports, no correlated-document runs from
      upstream ordering).
    - **One file per shard**: the write is repartitioned BY the shard
      column into ``n_shards`` partitions, so each directory holds a
      single part file. Balance follows hash uniformity (CV ~
      1/√(docs/shard)).

    One shuffle total. ``partitionBy`` directories mean a reader can
    open shard K with partition pruning (``WHERE shard = K``).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(n_shards))
    (
        df.withColumn("shard", shard.cast("int"))
        .repartition(n_shards, F.col("shard"))
        # leading with the partition column satisfies FileFormatWriter's
        # required ordering — otherwise it injects its own (unstable)
        # sort by partition columns and destroys the keyed order
        .sortWithinPartitions(
            "shard", F.xxhash64(F.col(id_col), F.lit(salt + "|ord"))
        )
        .write.mode(mode)
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (requires a warehouse dir /
    catalog — bucketing metadata lives in the catalog, not in parquet)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
