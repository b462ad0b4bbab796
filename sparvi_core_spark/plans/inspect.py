"""Physical-plan introspection helpers.

Used by the test suite to pin the plans we rely on at scale (filters
pushed into parquet scans, column pruning, broadcast join selection,
no accidental joins in window-based operators), and available to users
tuning their own rule SQL. Parsing `explain` output is inherently
version-coupled — these helpers centralize that coupling.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out += [f.strip() for f in m.group(1).split(",")]
    return out


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names in every scan's ReadSchema — what actually
    gets read from parquet after pruning."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def _plan(df: DataFrame) -> str:
    return explain_str(df, "simple")


def has_join(df: DataFrame) -> bool:
    return "Join" in _plan(df)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _plan(df)


def has_broadcast_nested_loop_join(df: DataFrame) -> bool:
    return "BroadcastNestedLoopJoin" in _plan(df)
