"""Profile history: snapshot store + populated trends (D5 for real).

The reference declares a trends scaffold but never populates it
(``profile_engine.py:450-454``); here a directory of timestamped
profile JSONs is the history, the newest prior snapshot drives anomaly
/ schema-shift detection, and ``trends`` is built from the full run
sequence.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import SparkSession

from sparvi_core_spark.profiler.compare import build_trends
from sparvi_core_spark.profiler.engine import profile_table

_FNAME = re.compile(r"profile_(\d{8}T\d{6}(?:\.\d+)?)\.json$")


def _snapshot_files(history_dir: str, table: str) -> list[str]:
    d = os.path.join(history_dir, table)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if _FNAME.search(f)
    )


def load_history(history_dir: str, table: str) -> list[dict[str, Any]]:
    out = []
    for path in _snapshot_files(history_dir, table):
        with open(path) as f:
            out.append(json.load(f))
    return out


def profile_with_history(
    spark: SparkSession,
    table: str,
    history_dir: str,
    include_samples: bool = False,
    config: dict | None = None,
) -> dict[str, Any]:
    """Profile ``table``, compare against the newest stored snapshot,
    populate trends from the whole history, and append this run.

    Samples are excluded from stored snapshots (they are display-only in
    the reference too, profile_engine.py:408-435).
    """
    history = load_history(history_dir, table)
    prior = history[-1] if history else None
    prof = profile_table(
        spark,
        table,
        historical_data=prior,
        include_samples=include_samples,
        config=config,
    )
    prof["trends"] = build_trends(history + [prof])

    stored = {k: v for k, v in prof.items() if k != "samples"}
    d = os.path.join(history_dir, table)
    os.makedirs(d, exist_ok=True)
    stamp = prof["timestamp"].replace("-", "").replace(":", "")
    with open(os.path.join(d, f"profile_{stamp}.json"), "w") as f:
        json.dump(stored, f, indent=2, default=str)
    return prof
