"""Skew mitigation: salted two-stage aggregation and salted joins.

AQE's skew-join splitting (enabled in the session factory) handles most
sort-merge skew at runtime; these operators cover the cases AQE can't:
a groupBy where one key holds a large fraction of all rows (the hot
reducer), and broadcast-ineligible joins against a skewed key.

Results are salt-invariant: the salt only spreads the partial
aggregation; the final combine removes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# partial/combine pairs for algebraic aggregates
_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: list[tuple[str, str]],
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``metrics`` is a list of (column, fn) with fn in
    {count, sum, min, max, avg}. avg decomposes into sum+count and is
    recombined exactly. The hot key's rows spread over ``salt_buckets``
    reducers in stage 1; stage 2 combines ``keys × salt_buckets`` tiny
    partials.
    """
    plan: list[tuple[str, str, str]] = []  # (out_name, col, fn)
    needed: dict[tuple[str, str], str] = {}

    def _need(col: str, fn: str) -> str:
        alias = needed.get((col, fn))
        if alias is None:
            alias = f"__p_{fn}_{col}"
            needed[(col, fn)] = alias
        return alias

    for col, fn in metrics:
        if fn == "avg":
            _need(col, "sum")
            _need(col, "count")
        elif fn in _PARTIAL:
            _need(col, fn)
        else:
            raise ValueError(f"unsupported metric fn: {fn}")
        plan.append((f"{fn}_{col}" if fn != "count" else f"count_{col}", col, fn))

    salt = F.floor(F.rand(42) * salt_buckets).cast("int").alias("__salt")
    stage1 = df.groupBy(*keys, salt).agg(
        *[_PARTIAL[fn](F.col(col)).alias(alias) for (col, fn), alias in needed.items()]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            _COMBINE[fn](F.col(alias)).alias(alias)
            for (col, fn), alias in needed.items()
        ]
    )
    outs = []
    for out_name, col, fn in plan:
        if fn == "avg":
            outs.append(
                (
                    F.col(needed[(col, "sum")])
                    / F.col(needed[(col, "count")])
                ).alias(f"avg_{col}")
            )
        else:
            outs.append(F.col(needed[(col, fn)]).alias(out_name))
    return stage2.select(*keys, *outs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a skewed left key and a non-broadcastable right.

    Left rows get a random salt in [0, n); right rows are replicated n×
    (explode over the salt range) so every (key, salt) partition finds
    its match. Trades n× replication of the right side for even reducer
    load — only worth it when the right side is far smaller than the
    skewed key's row count but too big to broadcast.

    Only ``inner`` and ``left`` joins are supported: with the right side
    replicated n×, a right/full outer join would emit every unmatched
    right row n times — silently wrong results.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only: the right side "
            f"is replicated {salt_buckets}x, so right/full outer joins "
            "would duplicate unmatched right rows"
        )
    l = left.withColumn("__salt", F.floor(F.rand(42) * salt_buckets).cast("int"))
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    partitions: int | None = None,
    k: int = 10,
    capacity: int = 2048,
) -> dict:
    """Diagnose shuffle-key skew BEFORE paying for a bad join/agg:
    ``{total_rows, approx_distinct_keys, hot_keys: [(key, n)], top_share,
    skew_factor, recommended_salt_buckets, top_key_certified}``.

    ``skew_factor`` = hottest-key rows / ideal per-partition load
    (total/partitions): ~1 means hash partitioning already balances;
    ``p`` means the straggler reducer does p× the ideal work, and
    wall-clock is bounded below by the hottest key no matter how many
    executors you add. ``recommended_salt_buckets`` is the factor
    rounded up — salting the hot key across that many sub-keys levels
    the load (0 = don't salt). Cost: the two bounded
    ``heavy_hitters`` scans + one 1-row agg — no full-width shuffle of
    the key space, so the diagnosis is safe to run on the 100 TB input
    it protects.

    ``partitions`` defaults to the session's
    ``spark.sql.shuffle.partitions``.
    """
    import math

    from sparvi_core_spark.operators.frequent import heavy_hitters

    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hh = heavy_hitters(df, key_col, k=k, capacity=capacity)
    rows = hh.topk.collect()
    hot = [(r["value"], r["n"]) for r in rows]
    total = hh.total_rows
    distinct = df.agg(
        F.approx_count_distinct(key_col).alias("d")
    ).first()["d"]
    ideal = total / partitions if partitions else float("inf")
    top_n = hot[0][1] if hot else 0
    factor = (top_n / ideal) if ideal > 0 else 0.0
    return {
        "total_rows": total,
        "approx_distinct_keys": int(distinct),
        "partitions": partitions,
        "hot_keys": hot,
        "top_share": round(top_n / total, 6) if total else 0.0,
        "skew_factor": round(factor, 3),
        "recommended_salt_buckets": int(math.ceil(factor)) if factor > 1 else 0,
        # certify the claim the diagnosis rests on — that the hottest
        # key really is the hottest (tail ranks are often uncertifiable
        # ties among near-singleton keys, and don't matter here)
        "top_key_certified": hh.is_exact(rows[0]["n"]) if rows else True,
    }
