"""Exact top-k heavy hitters with bounded shuffle.

``top_terms``-style queries (`__spark_entry__.q_top_terms`) group by
every distinct value: one full-width shuffle keyed on the value. Fine
when distinct values fit a shuffle; at 100 TB a token/URL/domain column
can hold billions of distinct values, and the shuffle — not the scan —
becomes the bottleneck. This module replaces it with the classic
two-phase sketch-then-rescore plan:

1. **Candidates** — one scan, per-partition Misra-Gries summaries
   (``capacity`` counters each, built batch-vectorized inside
   ``mapInPandas``: pandas ``value_counts`` per Arrow batch merged into
   the counter dict, so Python cost is per *distinct-per-batch*, not
   per row). Only the summaries shuffle: ≤ capacity rows per partition.
2. **Rescore** — the merged candidate set (≤ ``capacity`` values) is
   filtered with a broadcast-friendly ``isin`` and counted exactly: one
   more scan, a tiny shuffle.

The result is EXACT, self-certifying: Misra-Gries guarantees every
value with true frequency > n/(capacity+1) survives phase 1, and the
merged lower bounds let us prove a-posteriori that no excluded value
could out-rank the returned k-th item (``is_exact``). On Zipf-shaped
data (tokens, URLs, user ids) certification succeeds at modest
capacity; on near-uniform data it honestly reports "not provably
exact" instead of returning a silently wrong top-k.

No reference analog (sparvi-core's frequent-values profiler is top-1
per column via full groupBy, profile_engine.py:290-335); this is the
scale path for the corpus-analytics extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


@dataclass
class HeavyHittersResult:
    """Exact counts for the certified-or-best-effort top values.

    ``topk``: (value string, n long) ordered by (n desc, value asc).
    ``total_rows``: non-null rows scanned (n).
    ``undercount_bound``: max possible Misra-Gries undercount, summed
    across partitions (≤ n // (capacity+1)).
    ``candidate_floor``: largest merged lower bound among values NOT
    rescored (0 when every surviving value was rescored).
    """

    topk: DataFrame
    k: int
    total_rows: int
    undercount_bound: int
    candidate_floor: int

    def is_exact(self, kth_exact_count: int) -> bool:
        """True when no value outside the rescored candidate set can
        beat the k-th returned count: any such value's true frequency
        is ≤ its merged lower bound (≤ ``candidate_floor``) plus the
        total undercount. Strict inequality so ties stay honest."""
        return kth_exact_count > self.candidate_floor + self.undercount_bound


def _mg_summaries(value_iter: Iterator[pd.DataFrame], capacity: int):
    """Per-partition batched Misra-Gries. Yields one frame of
    (v, w, rows): ≤ capacity counter rows plus one meta row
    (v=None, w=0, rows=partition non-null count)."""
    counters: dict[str, int] = {}
    n_rows = 0
    for pdf in value_iter:
        vc = pdf["v"].dropna().value_counts()
        n_rows += int(vc.sum())
        for v, c in vc.items():
            counters[v] = counters.get(v, 0) + int(c)
        if len(counters) > capacity:
            # batch decrement: subtract the (capacity+1)-th largest
            # count from everything; ≥ capacity+1 counters each give up
            # d mass, so total decrement ≤ n_p/(capacity+1) (the
            # classic MG bound survives batching)
            d = sorted(counters.values(), reverse=True)[capacity]
            counters = {v: c - d for v, c in counters.items() if c - d > 0}
    out = pd.DataFrame(
        {
            "v": list(counters.keys()) + [None],
            "w": list(counters.values()) + [0],
            "rows": [0] * len(counters) + [n_rows],
        }
    )
    yield out


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int = 2048,
) -> HeavyHittersResult:
    """Exact top-``k`` most frequent values of ``value_col`` (cast to
    string; NULLs excluded) without shuffling the full distinct-value
    space. Eager: phase 1 runs when called (the candidate set must be
    known to build the rescore plan); ``topk`` stays lazy.

    ``capacity`` trades the phase-1 summary size against
    certifiability: exactness is provable when the k-th true count
    exceeds n/(capacity+1) plus the best excluded lower bound — i.e.
    whenever the data is at all skewed. Raise it if ``is_exact`` says
    no.
    """
    if k > capacity:
        raise ValueError(f"k={k} must be <= capacity={capacity}")
    vals = df.select(F.col(value_col).cast("string").alias("v"))
    summaries = vals.mapInPandas(
        lambda it: _mg_summaries(it, capacity), "v string, w long, rows long"
    )
    merged = (
        summaries.groupBy("v")
        .agg(F.sum("w").alias("lb"), F.sum("rows").alias("rows"))
        .collect()
    )
    total_rows = sum(r["rows"] for r in merged if r["v"] is None)
    cands = sorted(
        ((r["v"], r["lb"]) for r in merged if r["v"] is not None),
        key=lambda t: (-t[1], t[0]),
    )
    kept = cands[:capacity]
    candidate_floor = cands[capacity][1] if len(cands) > capacity else 0
    undercount_bound = total_rows // (capacity + 1)
    topk = (
        vals.filter(F.col("v").isin([v for v, _ in kept]))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("v").alias("value"), "n")
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )
    return HeavyHittersResult(
        topk=topk,
        k=k,
        total_rows=total_rows,
        undercount_bound=undercount_bound,
        candidate_floor=candidate_floor,
    )


@dataclass
class GroupedHeavyHittersResult:
    """Per-group exact top-k. ``topk``: (group, value, n) with at most
    k rows per group, ordered (n desc, value asc) within each.
    ``group_info``: group → (total_rows, undercount_bound,
    candidate_floor) for per-group certification."""

    topk: DataFrame
    k: int
    group_info: dict[str, tuple[int, int, int]]

    def is_exact(self, group: str, kth_exact_count: int) -> bool:
        n, under, floor = self.group_info[group]
        return kth_exact_count > floor + under


def _grouped_mg_summaries(pair_iter: Iterator[pd.DataFrame], capacity: int):
    """Per-partition Misra-Gries, one counter table per group. Yields
    (g, v, w, rows): ≤ capacity counter rows per group seen in this
    partition, plus one meta row per group (v=None, rows=group count).
    Memory: groups-per-partition × capacity counters — intended for
    LOW-cardinality group columns (language, source, split)."""
    counters: dict[str, dict[str, int]] = {}
    n_rows: dict[str, int] = {}
    for pdf in pair_iter:
        sub = pdf.dropna(subset=["g", "v"])
        vc = sub.groupby(["g", "v"], sort=False).size()
        for (g, v), c in vc.items():
            grp = counters.setdefault(g, {})
            grp[v] = grp.get(v, 0) + int(c)
            n_rows[g] = n_rows.get(g, 0) + int(c)
        for g, grp in counters.items():
            if len(grp) > capacity:
                d = sorted(grp.values(), reverse=True)[capacity]
                counters[g] = {v: c - d for v, c in grp.items() if c - d > 0}
    gs, vs, ws, rs = [], [], [], []
    for g, grp in counters.items():
        for v, c in grp.items():
            gs.append(g); vs.append(v); ws.append(c); rs.append(0)
    for g, n in n_rows.items():
        gs.append(g); vs.append(None); ws.append(0); rs.append(n)
    yield pd.DataFrame({"g": gs, "v": vs, "w": ws, "rows": rs})


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 10,
    capacity: int = 1024,
) -> GroupedHeavyHittersResult:
    """Exact top-``k`` values per group (both cast to string, NULLs in
    either excluded) — the per-domain / per-language corpus-stats shape
    — with the same bounded-shuffle contract as ``heavy_hitters``:
    per-partition Misra-Gries candidates (one counter table per group),
    a ≤ groups×capacity candidate broadcast, one exact rescore scan.

    The full-shuffle alternative (groupBy(group, value) then a window
    rank — the pinned ``group_topk`` query shape) shuffles every
    distinct (group, value) pair; this shuffles only the summaries.
    Intended for low-cardinality groups: the driver and each executor
    hold groups × capacity counters.

    Eager like ``heavy_hitters`` (phase 1 must run to build the rescore
    plan); per-group certification via ``is_exact(group, kth_count)``.
    """
    if k > capacity:
        raise ValueError(f"k={k} must be <= capacity={capacity}")
    pairs = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(value_col).cast("string").alias("v"),
    )
    summaries = pairs.mapInPandas(
        lambda it: _grouped_mg_summaries(it, capacity),
        "g string, v string, w long, rows long",
    )
    merged = (
        summaries.groupBy("g", "v")
        .agg(F.sum("w").alias("lb"), F.sum("rows").alias("rows"))
        .collect()
    )
    totals: dict[str, int] = {}
    cands: dict[str, list[tuple[str, int]]] = {}
    for r in merged:
        if r["v"] is None:
            totals[r["g"]] = totals.get(r["g"], 0) + r["rows"]
        else:
            cands.setdefault(r["g"], []).append((r["v"], r["lb"]))
    group_info: dict[str, tuple[int, int, int]] = {}
    kept_rows: list[tuple[str, str]] = []
    for g, lst in cands.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        floor = lst[capacity][1] if len(lst) > capacity else 0
        group_info[g] = (totals[g], totals[g] // (capacity + 1), floor)
        kept_rows.extend((g, v) for v, _ in lst[:capacity])
    if not kept_rows:
        empty = df.sparkSession.createDataFrame(
            [], "group string, value string, n long"
        )
        return GroupedHeavyHittersResult(topk=empty, k=k, group_info={})
    cand_df = df.sparkSession.createDataFrame(kept_rows, "g string, v string")
    from pyspark.sql import Window

    exact = (
        pairs.join(F.broadcast(cand_df), ["g", "v"])
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("n"), F.asc("v"))
    topk = (
        exact.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            F.col("g").alias("group"), F.col("v").alias("value"), "n"
        )
    )
    return GroupedHeavyHittersResult(topk=topk, k=k, group_info=group_info)
