"""Validation runner: rule SQL through Catalyst + driver-side comparators.

Port of ``sparvi/validations/validator.py:67-139``. Each rule's
``query`` runs via ``spark.sql`` against registered temp views (full
Catalyst support — joins, CTEs, scalar subqueries, FILTER clauses), the
first column of the first row is compared driver-side.

Differences from the reference, on purpose:
- Result dicts carry **both** ``name`` and ``rule_name`` — the reference
  emits ``name`` (validator.py:116) but its own README (README.md:356),
  CLI (cli/validate.py:222) and tests (tests/test_validations.py:25)
  read ``rule_name``; emitting both serves every documented consumer.
- Independent rules can run concurrently (``parallelism``): the Spark
  scheduler interleaves the jobs — the analog of the reference's
  connection-per-rule (validator.py:91).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import SparkSession

from sparvi_core_spark.config import get_config


def _compare(operator: str, actual: Any, expected: Any) -> bool:
    """The 7 comparator pairs (validator.py:99-113)."""
    if operator in ("equals", "=="):
        return actual == expected
    if operator in ("greater_than", ">"):
        return actual > expected
    if operator in ("less_than", "<"):
        return actual < expected
    if operator in ("greater_than_or_equal", ">="):
        return actual >= expected
    if operator in ("less_than_or_equal", "<="):
        return actual <= expected
    if operator in ("not_equals", "!="):
        return actual != expected
    if operator == "between":
        return expected[0] <= actual <= expected[1]
    raise ValueError(f"Unknown operator: {operator}")


def _normalize_scalar(v: Any) -> Any:
    """Decimal results (e.g. from FILTER-percentage SQL) → float: keeps
    results JSON-serializable and display-friendly, matching the native
    numeric types warehouse drivers hand the reference."""
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _run_one(spark: SparkSession, rule: dict[str, Any]) -> dict[str, Any]:
    name = rule.get("name", "<unnamed>")
    base = {"name": name, "rule_name": name, "description": rule.get("description", "")}
    try:
        row = spark.sql(rule["query"]).first()
        actual_value = _normalize_scalar(row[0]) if row is not None else None
        is_valid = _compare(rule.get("operator", "equals"), actual_value,
                            rule.get("expected_value", 0))
        return {
            **base,
            "is_valid": bool(is_valid),
            "actual_value": actual_value,
            "expected_value": rule.get("expected_value", 0),
        }
    except Exception as e:  # per-rule isolation (validator.py:122-128)
        return {**base, "is_valid": False, "error": str(e)}


def run_validations(
    spark: SparkSession,
    validation_rules: list[dict[str, Any]],
    config: dict | None = None,
) -> list[dict[str, Any]]:
    cfg = get_config(config)["validation"]
    rules = validation_rules[: cfg["max_rules"]]
    parallelism = max(1, int(cfg["parallelism"]))
    if parallelism == 1 or len(rules) <= 1:
        return [_run_one(spark, r) for r in rules]
    with ThreadPoolExecutor(max_workers=parallelism) as ex:
        return list(ex.map(lambda r: _run_one(spark, r), rules))
