"""Sequential change detection over profile-metric history.

The reference's anomaly surface is one-step-back thresholding (compare
the newest profile to the single prior snapshot; >20% row change etc.
— default_validations.py:93). That misses slow drifts and fires on
normal volatility. This adds the standard EWMA control chart (Roberts
1959) over the long-format metrics warehouse
(``profiler.metrics_sink``): per series, an exponentially weighted
mean tracks the level, residuals against the PRIOR smoothed level are
scored in units of the prior smoothed residual scale, and a point
flags when ``|residual| > L·sigma``.

Execution shape: one ``applyInPandas`` over series groups
(table, metric, column). A series holds one point per profile run —
tiny — while the number of series scales with tables × columns ×
metrics; grouping parallelizes across series, and pandas'
``ewm`` computes each series vectorized. This is the right use of the
Pandas path: recursive EWMA is not expressible as a built-in window
aggregate, the per-group data is bounded, and the group count is what
grows at 100 TB.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def ewma_flags(
    metrics: DataFrame,
    alpha: float = 0.3,
    L: float = 3.0,
    min_points: int = 5,
    group_cols: Iterable[str] = ("table", "metric", "column"),
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> DataFrame:
    """Score every metric point against its series' EWMA control chart.

    Output = input columns + ``ewma`` (smoothed level INCLUDING the
    point), ``resid`` (value − prior smoothed level), ``sigma`` (prior
    smoothed residual scale), ``is_anomaly``. The first ``min_points``
    points of a series are never flagged (warm-up: the chart needs a
    level and a scale before deviations mean anything); a series whose
    history is constant gets ``sigma`` 0 and flags ANY deviation after
    warm-up.

    ``alpha`` is the EWMA memory (0.2-0.4 typical: smaller = longer
    memory, slower but steadier detection); ``L`` the control limit in
    sigma units.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    group_cols = list(group_cols)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in metrics.schema.fields
    ) + ", ewma double, resid double, sigma double, is_anomaly boolean"

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        v = pdf[value_col].astype(float)
        ewma = v.ewm(alpha=alpha, adjust=False).mean()
        prior = ewma.shift(1)
        resid = v - prior
        # prior smoothed scale of |resid|: shift BEFORE smoothing so a
        # level-shift point is scored against pre-shift volatility
        sigma = (
            resid.abs()
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .shift(1)
        )
        warm = pdf.index.to_series() >= min_points
        flag = warm & resid.notna() & (
            resid.abs() > L * sigma.fillna(0.0)
        )
        pdf = pdf.copy()
        pdf["ewma"] = ewma
        pdf["resid"] = resid
        pdf["sigma"] = sigma
        pdf["is_anomaly"] = flag.fillna(False).astype(bool)
        return pdf

    return metrics.groupBy(*group_cols).applyInPandas(_score, out_schema)


def detect_metric_changepoints(
    spark,
    metrics_path: str,
    table: str | None = None,
    alpha: float = 0.3,
    L: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Flagged points only, straight from the metrics warehouse written
    by ``profiler.metrics_sink.append_metrics`` (partition-pruned when
    ``table`` is given): ``(table, metric, column, timestamp, value,
    ewma, resid, sigma)`` ordered by series then time."""
    m = spark.read.parquet(metrics_path)
    if table is not None:
        m = m.filter(F.col("table") == table)
    flagged = ewma_flags(
        m, alpha=alpha, L=L, min_points=min_points
    ).filter(F.col("is_anomaly"))
    return flagged.select(
        "table", "metric", "column", "timestamp", "value",
        "ewma", "resid", "sigma",
    ).orderBy("table", "metric", "column", "timestamp")


def batch_metric_series(summary: DataFrame) -> DataFrame:
    """Adapt an incremental-profile summary store
    (``profiler.incremental.partition_profile`` rows — one per batch ×
    column) into the long metric format :func:`ewma_flags` scores:
    ``(table, timestamp, metric, column, value)`` with the ``batch_id``
    as the time axis and per-batch ``mean`` / ``null_fraction`` /
    ``row_count`` derived from the stored sums.

    Composition: ``ewma_flags(batch_metric_series(store))`` answers
    "WHICH ingest batch shifted this column?" straight from the
    summary store — per-batch granularity the snapshot-profile history
    can't give, at zero extra scans of the data.
    """
    n = F.col("n_rows").cast("double")
    rows = summary.select(
        F.lit("").alias("table"),
        F.col("batch_id").alias("timestamp"),
        F.lit("mean").alias("metric"),
        "column",
        (F.col("sum") / (n - F.col("n_nulls"))).alias("value"),
    ).where(F.col("value").isNotNull())
    nulls = summary.select(
        F.lit("").alias("table"),
        F.col("batch_id").alias("timestamp"),
        F.lit("null_fraction").alias("metric"),
        "column",
        F.when(n > 0, F.col("n_nulls") / n).alias("value"),
    ).where(F.col("value").isNotNull())
    counts = summary.select(
        F.lit("").alias("table"),
        F.col("batch_id").alias("timestamp"),
        F.lit("row_count").alias("metric"),
        "column",
        n.alias("value"),
    )
    return rows.unionByName(nulls).unionByName(counts)
