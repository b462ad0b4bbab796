"""Statistical helpers beyond the reference's stats block: histograms.

Equal-width histograms as a single groupBy over a computed bin id —
the profiling extension most dashboards want next to min/max/quartiles.
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
