"""Profile → long-format metrics DataFrame → warehouse sink.

Operationalizes profiles: each run becomes (table, run_ts, metric,
column, value) rows you can append to a parquet/warehouse table and
query/alert on with plain SQL — the quality-metrics-warehouse pattern.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = "table string, run_ts string, metric string, column string, value double"


def profile_to_metrics(spark: SparkSession, profile: dict[str, Any]) -> DataFrame:
    """Flatten a profile dict into long-format numeric metrics.

    Non-numeric values (min/max dates, frequent value strings) are not
    emitted — they live in the JSON snapshot; this sink is for
    alertable numeric series.
    """
    t = profile.get("table", "")
    ts = profile.get("timestamp", "")
    rows: list[tuple] = [
        (t, ts, "row_count", None, float(profile.get("row_count") or 0)),
    ]
    if profile.get("duplicate_count") is not None:
        rows.append(
            (t, ts, "duplicate_count", None, float(profile["duplicate_count"]))
        )
    for col, s in (profile.get("completeness") or {}).items():
        for m in ("nulls", "null_percentage", "distinct_count", "distinct_percentage"):
            if s.get(m) is not None:
                rows.append((t, ts, m, col, float(s[m])))
    for col, s in (profile.get("numeric_stats") or {}).items():
        for m in ("min", "max", "avg", "sum", "stdev", "q1", "median", "q3"):
            if s.get(m) is not None:
                rows.append((t, ts, m, col, float(s[m])))
    for col, s in (profile.get("text_length_stats") or {}).items():
        for m in ("min_length", "max_length", "avg_length"):
            if s.get(m) is not None:
                rows.append((t, ts, m, col, float(s[m])))
    for col, s in (profile.get("date_stats") or {}).items():
        for m in ("distinct_count", "date_range_days"):
            if s.get(m) is not None:
                rows.append((t, ts, f"date_{m}", col, float(s[m])))
    return spark.createDataFrame(rows, _SCHEMA)


def append_metrics(
    spark: SparkSession,
    profile: dict[str, Any],
    path: str,
) -> None:
    """Append this run's metrics to a parquet metrics table, partitioned
    by source table (partition pruning for per-table dashboards)."""
    profile_to_metrics(spark, profile).write.mode("append").partitionBy(
        "table"
    ).parquet(path)
