"""Profile comparison: anomalies, schema shifts, trends (D3-D5).

The reference *declares* these capabilities but stubs them
(``profile_engine.py:437-443`` always returns empty lists). The spec
lives in its README (README.md:148-153,448-453: row-count / null-rate /
numeric-shift anomalies with ``type/description/severity``), its CLI
renderer (cli/profile.py:395-435 expects ``type/column/description/
severity``), and its test (tests/test_profiler.py:35-61 expects a
``row_count`` anomaly). This module implements them for real —
driver-side dict math over two profile snapshots; no Spark jobs.
"""

from __future__ import annotations

from typing import Any


def empty_trends() -> dict[str, Any]:
    """Trend scaffold shape (profile_engine.py:450-454)."""
    return {"row_counts": [], "null_rates": {}, "duplicates": []}


def detect_anomalies(
    current: dict, historical: dict | None, threshold: float = 3.0
) -> list[dict[str, Any]]:
    """Diff two profiles → anomaly dicts {type, description, severity, [column]}.

    - row_count: change >20% (the reference's row-growth alarm,
      default_validations.py:93) → high; >5% → medium.
    - null_rate: null_percentage moved by more than 5 points.
    - numeric_shift: avg moved by more than ``threshold`` historical
      stdevs (σ threshold from config.py:66).
    - duplicate_count: new duplicates appeared.
    """
    if not historical:
        return []
    anomalies: list[dict[str, Any]] = []

    prev_rc = historical.get("row_count")
    cur_rc = current.get("row_count")
    if prev_rc and cur_rc is not None and prev_rc > 0:
        change = abs(cur_rc - prev_rc) / prev_rc
        if change > 0.05:
            anomalies.append(
                {
                    "type": "row_count",
                    "description": (
                        f"Row count changed from {prev_rc} to {cur_rc} "
                        f"({change * 100:.1f}%)"
                    ),
                    "severity": "high" if change > 0.2 else "medium",
                }
            )

    prev_comp = historical.get("completeness", {}) or {}
    for col, cur in (current.get("completeness", {}) or {}).items():
        prev = prev_comp.get(col)
        if not prev:
            continue
        delta = (cur.get("null_percentage") or 0) - (prev.get("null_percentage") or 0)
        if abs(delta) > 5.0:
            anomalies.append(
                {
                    "type": "null_rate",
                    "column": col,
                    "description": (
                        f"Null rate for {col} changed from "
                        f"{prev.get('null_percentage')}% to "
                        f"{cur.get('null_percentage')}%"
                    ),
                    "severity": "high" if abs(delta) > 20 else "medium",
                }
            )

    prev_num = historical.get("numeric_stats", {}) or {}
    for col, cur in (current.get("numeric_stats", {}) or {}).items():
        prev = prev_num.get(col)
        if not prev:
            continue
        p_avg, p_std = prev.get("avg"), prev.get("stdev")
        c_avg = cur.get("avg")
        if p_avg is None or c_avg is None or not p_std:
            continue
        shift = abs(c_avg - p_avg) / p_std
        if shift > threshold:
            anomalies.append(
                {
                    "type": "numeric_shift",
                    "column": col,
                    "description": (
                        f"Average of {col} shifted from {p_avg} to {c_avg} "
                        f"({shift:.1f} historical stdevs)"
                    ),
                    "severity": "high" if shift > 2 * threshold else "medium",
                }
            )

    prev_dup = historical.get("duplicate_count") or 0
    cur_dup = current.get("duplicate_count") or 0
    if cur_dup > prev_dup:
        anomalies.append(
            {
                "type": "duplicate_count",
                "description": (
                    f"Duplicate groups increased from {prev_dup} to {cur_dup}"
                ),
                "severity": "medium",
            }
        )
    return anomalies


def detect_schema_shifts(current: dict, historical: dict | None) -> list[dict]:
    """Added / removed columns between two profiles (D4).

    Column presence is taken from the ``completeness`` maps (both
    snapshots carry every column there). Renderer contract:
    cli/profile.py:411-435.
    """
    if not historical:
        return []
    cur_cols = set((current.get("completeness") or {}).keys())
    prev_cols = set((historical.get("completeness") or {}).keys())
    shifts: list[dict] = []
    for col in sorted(cur_cols - prev_cols):
        shifts.append(
            {
                "type": "column_added",
                "column": col,
                "description": f"Column {col} was added",
                "severity": "medium",
            }
        )
    for col in sorted(prev_cols - cur_cols):
        shifts.append(
            {
                "type": "column_removed",
                "column": col,
                "description": f"Column {col} was removed",
                "severity": "high",
            }
        )
    return shifts


def build_trends(profiles: list[dict]) -> dict[str, Any]:
    """Accumulate a time-ordered list of profiles into the trends shape
    (D5 — the reference only ever returns the empty scaffold)."""
    trends = empty_trends()
    for p in profiles:
        trends["row_counts"].append(
            {"timestamp": p.get("timestamp"), "value": p.get("row_count")}
        )
        trends["duplicates"].append(
            {"timestamp": p.get("timestamp"), "value": p.get("duplicate_count")}
        )
        for col, stats in (p.get("completeness") or {}).items():
            trends["null_rates"].setdefault(col, []).append(
                {"timestamp": p.get("timestamp"), "value": stats.get("null_percentage")}
            )
    return trends
