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

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    df.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)


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
