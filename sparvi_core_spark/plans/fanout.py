"""Parallelism floor for compact scan-rooted plans.

A small/compacted input (one parquet file with one row group is the
common case: dimension tables, doc corpora written by a single task)
reads as ONE scan partition. Plans whose heavy work sits BETWEEN the
scan and the first shuffle — or that have no shuffle at all
(broadcast-join-only, map-only scoring) — then run that work in a
single task regardless of cluster size.

``fan_out_compact`` raises such inputs to the cluster's default
parallelism with one cheap exchange. It is deliberately gated: inputs
that already have >= defaultParallelism partitions (every real
at-scale table) pass through untouched, so the helper is a no-op
exactly where an extra shuffle would be waste.

Measured (sf0.1, local[32]): fuzzy_self_pairs 5.4 s → 1.1 s,
bm25_search 1.8 s → 0.8 s. Operators whose first shuffle is
immediately after the scan (minhash, ngram shingles) measure FLAT —
the shuffle already spreads the work — so they do not use this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_compact(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently
    has fewer partitions; otherwise return it unchanged.

    Streaming frames pass through untouched (their partitioning is the
    source's business, and ``.rdd`` is undefined for them); the
    monitors that call this do so on the materialized micro-batch
    inside ``foreachBatch``, which is a plain batch frame.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
