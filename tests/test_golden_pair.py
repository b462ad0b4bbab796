"""Golden pair: examples/orders_rules.yaml → examples/orders_results.json
(the reference ships my_rules.yaml + results.json as a frozen
validate-flow artifact; this is our equivalent, actually asserted)."""

import json
from pathlib import Path

from sparvi_core_spark import load_rules_from_file, run_validations

EXAMPLES = Path(__file__).parent.parent / "examples"


def test_golden_validation_run(spark, views):
    rules = load_rules_from_file(EXAMPLES / "orders_rules.yaml")
    expected = json.loads((EXAMPLES / "orders_results.json").read_text())
    got = run_validations(spark, rules, config={"validation": {"parallelism": 1}})
    assert len(got) == len(expected) == 7
    for g, e in zip(got, expected):
        assert g["rule_name"] == e["rule_name"]
        assert g["is_valid"] == e["is_valid"]
        assert str(g["actual_value"]) == str(e["actual_value"])
    assert sum(r["is_valid"] for r in got) == 6
    assert not next(r for r in got if r["rule_name"] == "no_jumbo_orders")["is_valid"]
