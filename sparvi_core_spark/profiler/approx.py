"""Sample-based approximate profiling with quantified uncertainty.

At 100 TB even ONE full-scan profile is a real cost; the reference's
answer is a config'd row cap on *display samples* only — every
statistic still scans the table (profile_engine.py computes all stats
against the full table; sampling only affects the returned sample
rows). This module adds the missing tier: profile a Bernoulli sample
and report each estimate WITH its sampling error, so a caller can
choose "exact but a full scan" (``profiler.engine``) vs "1% of the
I/O with ±bounds" per table.

Statistics and their estimators (n = sampled rows, f = fraction):

- ``row_count``: n / f. Bernoulli sampling makes n Binomial(N, f), so
  the 95% CI is ± 1.96·sqrt(N·f·(1−f))/f, reported via the plug-in N̂.
- ``null_fraction`` per column: sample proportion p̂ ± 1.96·sqrt(p̂(1−p̂)/n)
  (Wald interval; fine at profile scale, degenerate at p̂∈{0,1} where
  the half-width is 0 — the bound is then "no nulls seen in n draws").
- ``mean``/``stddev`` per numeric column: sample mean ± 1.96·s/sqrt(m)
  (CLT), sample stddev (unbiased-variance root) on m non-null values.
- ``approx_distinct``: HLL over the sample — reported as a LOWER
  bound only. Distinct counts do NOT extrapolate from uniform samples
  (a column can have any number of unseen rare values); the honest
  scalable route for distincts is the full-scan HLL
  (``metrics.approx_distinct_exprs``) or the mergeable sketch store
  (``profiler.incremental``), both O(1) memory. The column is named
  ``distinct_seen`` to make the semantics unmissable.

Everything is ONE aggregation over the sampled scan — the sample
filter is a codegen ``rand() < f`` predicate evaluated before any
shuffle, so the I/O saving is real (columnar readers still read the
projected columns; the win is CPU + downstream agg width, and on
row-group-statistics-friendly layouts the scan itself).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F, types as T


def sample_profile(
    df: DataFrame,
    fraction: float = 0.01,
    cols: list[str] | None = None,
    seed: int = 42,
    z: float = 1.96,
) -> dict:
    """Approximate profile from a Bernoulli(fraction) sample.

    Returns ``{"fraction", "sampled_rows", "row_count_est",
    "row_count_ci", "columns": {col: {null_fraction, null_fraction_ci,
    mean, mean_ci, stddev, distinct_seen}}}`` where every ``*_ci`` is
    the ± half-width of the ``z``-level interval (default 95%).
    Deterministic for a fixed ``seed``.
    """
    if not (0 < fraction <= 1):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    cols = cols or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    s = df.sample(fraction=fraction, seed=seed)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        v = F.col(c)
        aggs.append(F.count_if(v.isNull()).alias(f"__nulls_{c}"))
        aggs.append(
            F.approx_count_distinct(v).alias(f"__distinct_{c}")
        )
        if c in numeric:
            d = v.cast("double")
            aggs.append(F.count(d).alias(f"__m_{c}"))
            aggs.append(F.avg(d).alias(f"__mean_{c}"))
            aggs.append(F.stddev_samp(d).alias(f"__sd_{c}"))
    row = s.agg(*aggs).first()

    n = row["__n"]
    est_rows = n / fraction
    # Binomial(N, f) sd of n is sqrt(N f (1-f)); plug in N̂ = n/f
    rc_ci = (
        z * math.sqrt(max(est_rows * fraction * (1 - fraction), 0.0)) / fraction
        if fraction < 1
        else 0.0
    )
    out: dict = {
        "fraction": fraction,
        "sampled_rows": n,
        "row_count_est": round(est_rows),
        "row_count_ci": round(rc_ci, 2),
        "columns": {},
    }
    for c in cols:
        stats: dict = {}
        if n > 0:
            p = row[f"__nulls_{c}"] / n
            stats["null_fraction"] = round(p, 6)
            stats["null_fraction_ci"] = round(
                z * math.sqrt(p * (1 - p) / n), 6
            )
        else:
            stats["null_fraction"] = None
            stats["null_fraction_ci"] = None
        stats["distinct_seen"] = row[f"__distinct_{c}"]
        if c in numeric:
            m = row[f"__m_{c}"]
            mean, sd = row[f"__mean_{c}"], row[f"__sd_{c}"]
            stats["mean"] = mean
            stats["stddev"] = sd
            stats["mean_ci"] = (
                round(z * sd / math.sqrt(m), 6)
                if m and m > 1 and sd is not None
                else None
            )
        out["columns"][c] = stats
    return out
