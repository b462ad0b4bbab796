"""Incremental-ingest operators: latest-record compaction and upsert.

The reference profiles whatever table the warehouse presents; it has no
ingest surface. A continuously-crawled training corpus does: each new
batch carries re-fetches of known documents (same URL/doc key, newer
fetch time) and CDC-style tombstones. These operators compact such
feeds to the current-state snapshot.

Design (Spark-first):
- ``latest_by_key`` is ONE hash aggregation: ``max_by(struct(payload),
  struct(order, tie))`` — structs compare lexicographically, so the
  whole winning row travels together (the same trick that fixed the
  round-4 ``asof_join`` NULL-carry). Unlike the textbook
  ``row_number() OVER (PARTITION BY ...) = 1`` window, this gets
  map-side partial aggregation (each task pre-reduces its local rows
  to one candidate per key) and never sorts whole partitions — at
  100 TB that is the difference between one shuffle of pre-reduced
  rows and a full shuffle-then-sort of the raw feed.
- Determinism: ties on ``order_col`` are broken by ``tie_col``; the
  caller must pick a (order, tie) pair that is unique per key (e.g.
  fetch timestamp + batch id). With a unique pair the result is
  exactly DuckDB's ``QUALIFY row_number() = 1`` — the oracle used in
  tests.
- ``merge_upsert`` is union-then-compact, not a join: the existing
  snapshot is just the oldest batch. Tombstones (``delete_col``) are
  kept through compaction — a newer tombstone must beat an older
  upsert — and filtered at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Current-state snapshot: the newest row per key.

    Newest = max ``(order_col, tie_col)`` (lexicographic struct
    compare). Output schema == input schema, one row per distinct key.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    payload = [c for c in df.columns if c not in key_cols]
    if not payload:
        raise ValueError(
            "df needs at least one non-key column (the order column "
            "itself must not be a key)"
        )
    order = (
        F.struct(F.col(order_col), F.col(tie_col))
        if tie_col is not None
        else F.col(order_col)
    )
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), order)
    out = df.groupBy(*key_cols).agg(winner.alias("__w"))
    return out.select(
        *key_cols, *[F.col("__w." + c).alias(c) for c in payload]
    ).select(*df.columns)  # restore original column order


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
    tie_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply an update batch to a snapshot: newest version per key
    wins; rows whose winning version is a tombstone
    (``delete_col = true``) are dropped.

    ``existing`` and ``updates`` must share a schema (``unionByName``
    enforces it). The plan is one union + one hash aggregation — no
    join, so there is nothing to skew and nothing to broadcast; a
    snapshot partitioned/bucketed by ``key_cols`` keeps the shuffle
    one-sided on real clusters.
    """
    merged = latest_by_key(
        existing.unionByName(updates), key_cols, order_col, tie_col
    )
    if delete_col is not None:
        merged = merged.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return merged


def dedup_latest_fetch(
    df: DataFrame,
    url_col: str = "url",
    fetched_col: str = "fetched_at",
    tie_col: str | None = None,
) -> DataFrame:
    """Web-corpus convenience: keep the newest fetch per URL."""
    return latest_by_key(df, [url_col], fetched_col, tie_col)
