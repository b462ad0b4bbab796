"""Streaming heavy hitters: mergeable Misra-Gries summaries per
micro-batch, top-k over any batch range with a PROVEN error bound —
and never a rescan of the stream.

``operators.frequent.heavy_hitters`` is the batch design: sketch then
rescore, exact because the data can be scanned twice. A stream cannot
be scanned twice — once a micro-batch is gone, so is the chance to
rescore. What IS sound is storing each batch's Misra-Gries summary
(≤ capacity rows) and merging summaries later: MG summaries merge by
summing counters (then optionally re-pruning), and the classic
guarantee survives — after merging, every value's stored weight
``lb`` satisfies ``lb ≤ true_count ≤ lb + total_rows/(capacity+1)``,
with the error bound additive over batches exactly as it is over
partitions (Agarwal et al., "Mergeable Summaries", PODS'12).

So the streaming report returns INTERVALS, not pretend-exact counts:
``[lb, lb + err]`` per value, plus a set-level certificate —
``set_certified`` is True when the k-th lower bound strictly beats
every excluded candidate's upper bound, proving the top-k SET is
exactly right even though individual counts stay bounded-approximate.
On skewed data (tokens, URLs, user ids — the cases that matter) the
certificate succeeds at modest capacity; on near-uniform data it
honestly fails instead of guessing.

Store shape: ``(batch_id, capacity, v, lb, rows)`` — one meta row per
batch (``v`` NULL, ``rows`` = batch non-null count) plus ≤ capacity
counter rows; O(capacity) per micro-batch regardless of stream size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparvi_core_spark.operators.frequent import _mg_summaries


def topk_stream_batches(
    stream_df: DataFrame,
    value_col: str,
    path: str,
    capacity: int = 2048,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Reduce every micro-batch to its Misra-Gries summary over
    ``value_col`` (cast to string, NULLs excluded) and append it to the
    parquet store at ``path``.

    Each batch costs one scan of JUST the new rows + an O(capacity)
    write. Returns the started ``StreamingQuery`` (``available_now=
    True`` drains the current source and stops; False for a continuous
    run).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        vals = batch_df.select(F.col(value_col).cast("string").alias("v"))
        summ = vals.mapInPandas(
            lambda it: _mg_summaries(it, capacity),
            "v string, w long, rows long",
        )
        (
            summ.groupBy("v")
            .agg(F.sum("w").alias("lb"), F.sum("rows").alias("rows"))
            .select(
                F.lit(int(batch_id)).alias("batch_id"),
                F.lit(int(capacity)).alias("capacity"),
                "v",
                "lb",
                "rows",
            )
            .write.mode("append")
            .parquet(path)
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


@dataclass
class StreamTopKResult:
    """Top-k with interval semantics over the merged stream summaries.

    ``topk``: (value, lb, ub) ordered by (lb desc, value asc) —
    ``lb ≤ true_count ≤ ub`` for every returned value.
    ``total_rows``: non-null rows across the merged batches.
    ``error_bound``: ``total_rows // (capacity+1)``, the max undercount
    of any stored weight (and the max true count of any value absent
    from the candidates entirely).
    ``excluded_ceiling``: largest possible true count among candidates
    NOT returned (their best lb + error; absent values are covered by
    ``error_bound`` alone).
    ``set_certified``: True when the k-th lb strictly exceeds
    ``excluded_ceiling`` — the returned SET provably equals the true
    top-k set.
    """

    topk: list
    k: int
    total_rows: int
    error_bound: int
    excluded_ceiling: int
    set_certified: bool


def topk_from_store(
    spark: SparkSession,
    path: str,
    k: int = 20,
    min_batch_id: int | None = None,
    max_batch_id: int | None = None,
) -> StreamTopKResult:
    """Merge the stored per-batch summaries (optionally restricted to a
    ``batch_id`` range) into a bounded-error top-k. Cost is O(store
    size) — the raw stream is never touched."""
    store = spark.read.parquet(path)
    if min_batch_id is not None:
        store = store.filter(F.col("batch_id") >= min_batch_id)
    if max_batch_id is not None:
        store = store.filter(F.col("batch_id") <= max_batch_id)
    caps = [r["capacity"] for r in store.select("capacity").distinct().collect()]
    if not caps:
        return StreamTopKResult([], k, 0, 0, 0, True)
    if len(caps) > 1:
        raise ValueError(
            f"store mixes capacities {sorted(caps)}; per-batch error "
            "bounds are only addable at a single capacity"
        )
    capacity = caps[0]
    merged = (
        store.groupBy("v")
        .agg(F.sum("lb").alias("lb"), F.sum("rows").alias("rows"))
        .collect()
    )
    total_rows = sum(r["rows"] for r in merged if r["v"] is None)
    err = total_rows // (capacity + 1)
    cands = sorted(
        ((r["v"], r["lb"]) for r in merged if r["v"] is not None),
        key=lambda t: (-t[1], t[0]),
    )
    top = cands[:k]
    excluded_best_lb = cands[k][1] if len(cands) > k else 0
    excluded_ceiling = excluded_best_lb + err
    if len(cands) >= k and k > 0:
        # full slate returned: certified iff the weakest returned lower
        # bound beats every excluded candidate's ceiling
        certified = top[-1][1] > excluded_ceiling
    else:
        # fewer candidates than k survived the summaries. Only safe to
        # certify when nothing could have been decremented away at all
        # (err == 0 → every distinct value is present with its exact
        # count); otherwise near-uniform data ground every counter to
        # zero and a vacuous "certified" would be a lie.
        certified = err == 0
    return StreamTopKResult(
        topk=[(v, lb, lb + err) for v, lb in top],
        k=k,
        total_rows=total_rows,
        error_bound=err,
        excluded_ceiling=excluded_ceiling,
        set_certified=certified,
    )


def grouped_topk_stream_batches(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    path: str,
    capacity: int = 1024,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Grouped variant: one Misra-Gries summary PER GROUP per
    micro-batch (the per-domain / per-language streaming corpus-stats
    shape). Store rows: ``(batch_id, capacity, g, v, lb, rows)`` —
    O(groups × capacity) per batch; intended for low-cardinality group
    columns, same as ``operators.frequent.grouped_heavy_hitters``."""
    from sparvi_core_spark.operators.frequent import _grouped_mg_summaries

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = batch_df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(value_col).cast("string").alias("v"),
        )
        summ = pairs.mapInPandas(
            lambda it: _grouped_mg_summaries(it, capacity),
            "g string, v string, w long, rows long",
        )
        (
            summ.groupBy("g", "v")
            .agg(F.sum("w").alias("lb"), F.sum("rows").alias("rows"))
            .select(
                F.lit(int(batch_id)).alias("batch_id"),
                F.lit(int(capacity)).alias("capacity"),
                "g",
                "v",
                "lb",
                "rows",
            )
            .write.mode("append")
            .parquet(path)
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def grouped_topk_from_store(
    spark: SparkSession,
    path: str,
    k: int = 10,
    min_batch_id: int | None = None,
    max_batch_id: int | None = None,
) -> dict[str, StreamTopKResult]:
    """Per-group bounded-error top-k over the merged grouped summaries:
    ``{group: StreamTopKResult}``, each with the same interval + set-
    certificate semantics as :func:`topk_from_store`."""
    store = spark.read.parquet(path)
    if min_batch_id is not None:
        store = store.filter(F.col("batch_id") >= min_batch_id)
    if max_batch_id is not None:
        store = store.filter(F.col("batch_id") <= max_batch_id)
    caps = [r["capacity"] for r in store.select("capacity").distinct().collect()]
    if not caps:
        return {}
    if len(caps) > 1:
        raise ValueError(
            f"store mixes capacities {sorted(caps)}; per-batch error "
            "bounds are only addable at a single capacity"
        )
    capacity = caps[0]
    merged = (
        store.groupBy("g", "v")
        .agg(F.sum("lb").alias("lb"), F.sum("rows").alias("rows"))
        .collect()
    )
    totals: dict[str, int] = {}
    cands: dict[str, list[tuple[str, int]]] = {}
    for r in merged:
        if r["v"] is None:
            totals[r["g"]] = totals.get(r["g"], 0) + r["rows"]
        else:
            cands.setdefault(r["g"], []).append((r["v"], r["lb"]))
    out: dict[str, StreamTopKResult] = {}
    for g, total_rows in totals.items():
        lst = sorted(cands.get(g, []), key=lambda t: (-t[1], t[0]))
        err = total_rows // (capacity + 1)
        top = lst[:k]
        excluded_best_lb = lst[k][1] if len(lst) > k else 0
        excluded_ceiling = excluded_best_lb + err
        if len(lst) >= k and k > 0:
            certified = top[-1][1] > excluded_ceiling
        else:
            certified = err == 0
        out[g] = StreamTopKResult(
            topk=[(v, lb, lb + err) for v, lb in top],
            k=k,
            total_rows=total_rows,
            error_bound=err,
            excluded_ceiling=excluded_ceiling,
            set_certified=certified,
        )
    return out
