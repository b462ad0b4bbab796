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
