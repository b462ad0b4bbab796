"""Metric expression builders — one wide agg per profiling pass.

The reference emits ~``4 + 2·numeric + 2·text + 2·date + cols`` separate
SQL round-trips per profiled table (reference:
``sparvi/profiler/profile_engine.py:82-385``). Here every scalar metric
family is a *column expression*; the engine fuses them into a single
``df.agg(...)`` → one scan, whole-stage codegen, column pruning down to
the profiled columns. Patterns: profile_engine.py:212-214. Stats shapes:
profile_engine.py:136-288.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Reference regex patterns (profile_engine.py:212-214). Semantics are
# "contains a match" (DuckDB regexp_matches / Snowflake REGEXP_LIKE on
# anchored patterns agree for these shapes).
EMAIL_PATTERN = ".*@.*\\..*"
NUMERIC_PATTERN = "^[0-9]+$"
DATE_PATTERN = "^[0-9]{2,4}[/-][0-9]{1,2}[/-][0-9]{1,2}$"

# Alias separator: metric name + column name must round-trip uniquely.
SEP = "//"


def a(metric: str, col: str) -> str:
    return f"{metric}{SEP}{col}"


def null_count_exprs(cols: list[str]) -> list[Column]:
    """A2/P2 — all null counts in one pass (profile_engine.py:83)."""
    return [
        F.sum(F.col(c).isNull().cast("long")).alias(a("nulls", c)) for c in cols
    ]


def distinct_count_exprs(
    cols: list[str], approx: bool = False, rsd: float = 0.05
) -> list[Column]:
    """A3 — distinct counts (profile_engine.py:84).

    Exact ``count(DISTINCT c)`` for N columns plans through a single
    Expand (N× row multiplication before partial agg) — fine to ~dozens
    of columns; at 100 TB flip ``approx`` for HLL sketches
    (streaming, no Expand, mergeable partials).
    """
    if approx:
        return [F.approx_count_distinct(c, rsd).alias(a("distinct", c)) for c in cols]
    return [F.count_distinct(F.col(c)).alias(a("distinct", c)) for c in cols]


def numeric_stats_exprs(cols: list[str]) -> list[Column]:
    """A5/A6 — min/max/avg/sum/stdev per numeric column
    (profile_engine.py:136-176).

    - stdev is **sample** stddev (matches Snowflake/DuckDB ``STDDEV``,
      Redshift ``STDDEV_SAMP``; adapters.py:287-288).
    - Aggregates skip NULLs natively — same result as the reference's
      ``WHERE col IS NOT NULL`` (profile_engine.py:155).
    - Quartiles (A7) are deliberately NOT here: percentile aggregates
      (exact and approx) are object-hash aggregates that knock the whole
      fused agg out of whole-stage codegen (~2x, measured) — they run as
      their own concurrent job via ``percentile_exprs``.
    """
    exprs: list[Column] = []
    for c in cols:
        col = F.col(c)
        exprs += [
            F.min(col).alias(a("min", c)),
            F.max(col).alias(a("max", c)),
            F.avg(col).alias(a("avg", c)),
            F.sum(col).alias(a("sum", c)),
            F.stddev_samp(col).alias(a("stdev", c)),
        ]
    return exprs


def percentile_exprs(
    cols: list[str], approx: bool = False, accuracy: int = 10_000
) -> list[Column]:
    """A7 — quartiles per numeric column.

    Exact ``percentile`` (linear interpolation — matches DuckDB
    ``PERCENTILE_CONT``, adapters.py:220-221) buffers per-partition
    values; at 100 TB use ``approx`` (mergeable sketch, bounded memory).
    """
    if approx:
        return [
            F.percentile_approx(F.col(c), [0.25, 0.5, 0.75], accuracy).alias(
                a("quartiles", c)
            )
            for c in cols
        ]
    return [
        F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75])).alias(a("quartiles", c))
        for c in cols
    ]


def mode_exprs(cols: list[str]) -> list[Column]:
    """A11's value-only twin — per-column modal value
    (profile_engine.py:290-335).

    ``F.mode(deterministic=True)`` returns the LOWEST value among
    equally-frequent candidates, so the result is stable and
    oracle-comparable (DuckDB twin: GROUP BY value ORDER BY count DESC,
    value ASC LIMIT 1). Like percentiles this is an object-hash
    aggregate (per-value hashmap, knocks the fused agg out of
    whole-stage codegen), so callers should run it alongside the
    percentile job rather than the streaming-agg pass; partials are
    mergeable maps, so it scales like any hash aggregate.
    """
    return [F.mode(F.col(c), deterministic=True).alias(a("mode", c)) for c in cols]


def text_stats_exprs(cols: list[str]) -> list[Column]:
    """A8 — min/max/avg length per text column (profile_engine.py:178-204)."""
    exprs: list[Column] = []
    for c in cols:
        ln = F.length(F.col(c))
        exprs += [
            F.min(ln).alias(a("min_length", c)),
            F.max(ln).alias(a("max_length", c)),
            F.avg(ln).alias(a("avg_length", c)),
        ]
    return exprs


def text_pattern_exprs(cols: list[str]) -> list[Column]:
    """A9 — email/numeric/date pattern counts (profile_engine.py:206-238)."""
    patterns = (
        ("email", EMAIL_PATTERN),
        ("numeric_pat", NUMERIC_PATTERN),
        ("date_pat", DATE_PATTERN),
    )
    exprs: list[Column] = []
    for c in cols:
        for name, pat in patterns:
            exprs.append(F.sum(F.col(c).rlike(pat).cast("long")).alias(a(name, c)))
    return exprs


def date_stats_exprs(cols: list[str]) -> list[Column]:
    """A10 — min/max per date column (profile_engine.py:240-288).

    distinct_count reuses the completeness pass; date_range_days is
    driver-side date math on the min/max scalars (the reference's second
    DATEDIFF round-trip, profile_engine.py:261-266, is unnecessary).
    """
    exprs: list[Column] = []
    for c in cols:
        exprs += [
            F.min(F.col(c)).alias(a("min_date", c)),
            F.max(F.col(c)).alias(a("max_date", c)),
        ]
    return exprs
