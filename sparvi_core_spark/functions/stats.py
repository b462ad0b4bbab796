"""Statistical helpers beyond the reference's stats block: histograms.

Equal-width histograms as a single groupBy over a computed bin id —
the profiling extension most dashboards want next to min/max/quartiles
— plus the equi-height (quantile-bucketed) variant, which stays
readable on heavy-tailed columns where equal-width puts everything in
bin 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bin, lo, hi, count) rows for an equal-width histogram.

    Bounds default to the column min/max (one extra lightweight agg).
    Values at the upper edge clamp into the last bin. Empty bins are
    not emitted (join against a bin spine if you need them).
    """
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        if row["lo"] is None or row["hi"] is None:
            # empty or all-null column: no bins — return an empty frame
            # with the output schema instead of raising
            return df.sparkSession.createDataFrame(
                [], "bin int, bin_lo double, bin_hi double, count bigint"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    bin_id = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(bins - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            "count",
        )
    )


def equi_height_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """(bin, bin_lo, bin_hi, count) for a quantile-bucketed histogram:
    bin boundaries at the i/bins quantiles, so counts are ~equal by
    construction and the histogram stays informative on heavy-tailed
    columns.

    Bin rule: value v falls in bin = |{boundary b : v > b}| — bins are
    right-closed, [min, q1], (q1, q2], …, (q_{bins-1}, max]. Duplicate
    boundaries (heavy ties in the data) legally produce empty bins.
    ``bin_lo`` is NULL for the first bin and ``bin_hi`` NULL for the
    last (they extend to the column min/max).

    Two jobs: one quantile pass for the boundaries (exact
    ``F.percentile`` by default; ``approx=True`` flips to the
    ``percentile_approx`` GK sketch — the 100 TB path, same switch the
    profiler's quartile block uses), then one groupBy on the computed
    bin id. The boundary comparison is a literal chain, so the second
    pass is a plain scan+agg — no join, no second shuffle beyond the
    ≤ ``bins``-row agg.
    """
    ps = [i / bins for i in range(1, bins)]
    agg = (
        F.percentile_approx(col, ps, accuracy) if approx else F.percentile(col, ps)
    )
    row = df.filter(F.col(col).isNotNull()).agg(agg.alias("qs")).first()
    if row is None or row["qs"] is None:
        return df.sparkSession.createDataFrame(
            [], "bin int, bin_lo double, bin_hi double, count bigint"
        )
    bounds = [float(b) for b in row["qs"]]
    bin_id = sum(
        ((F.col(col) > F.lit(b)).cast("int") for b in bounds), F.lit(0)
    ).alias("bin")
    lo_arr = F.array(*[F.lit(b) for b in bounds])
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id)
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            F.round(
                F.when(F.col("bin") > 0, F.element_at(lo_arr, F.col("bin"))), 6
            ).alias("bin_lo"),
            F.round(
                F.when(
                    F.col("bin") < F.lit(bins - 1),
                    F.element_at(lo_arr, F.col("bin") + 1),
                ),
                6,
            ).alias("bin_hi"),
            "count",
        )
    )
