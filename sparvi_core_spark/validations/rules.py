"""Rule-file I/O: YAML/JSON ↔ rule dicts.

Same DSL and defaulting semantics as the reference
(``sparvi/validations/validator.py:11-64`` load,
``validator.py:142-167`` export): a rules file is either
``{"rules": [...]}`` or a bare list; each rule requires ``name`` and
``query``; missing ``operator`` defaults to ``equals`` and missing
``expected_value`` to ``0``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Union

import yaml

VALID_OPERATORS = {
    "equals", "==",
    "greater_than", ">",
    "less_than", "<",
    "greater_than_or_equal", ">=",
    "less_than_or_equal", "<=",
    "not_equals", "!=",
    "between",
}


def load_rules_from_file(file_path: Union[str, Path]) -> list[dict[str, Any]]:
    path = Path(file_path)
    if not path.exists():
        raise FileNotFoundError(f"Rules file not found: {path}")

    text = path.read_text()
    if path.suffix.lower() in (".yaml", ".yml"):
        data = yaml.safe_load(text)
    elif path.suffix.lower() == ".json":
        data = json.loads(text)
    else:
        # try YAML first (superset of JSON for our purposes)
        data = yaml.safe_load(text)

    if isinstance(data, dict) and "rules" in data:
        raw_rules = data["rules"]
    elif isinstance(data, list):
        raw_rules = data
    else:
        raise ValueError(
            f"Invalid rules file format: expected a list or a 'rules' key, got {type(data).__name__}"
        )

    rules: list[dict[str, Any]] = []
    for rule in raw_rules:
        if not isinstance(rule, dict):
            raise ValueError(f"Invalid rule (not a mapping): {rule!r}")
        if "name" not in rule or "query" not in rule:
            raise ValueError(
                f"Rule missing required 'name'/'query': {rule.get('name', rule)!r}"
            )
        rule = dict(rule)
        rule.setdefault("operator", "equals")
        rule.setdefault("expected_value", 0)
        rules.append(rule)
    return rules


def export_rules(
    rules: list[dict[str, Any]],
    file_path: Union[str, Path],
    format: str = "yaml",
) -> None:
    path = Path(file_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if format.lower() == "yaml":
        with open(path, "w") as f:
            yaml.dump({"rules": rules}, f, sort_keys=False)
    elif format.lower() == "json":
        with open(path, "w") as f:
            json.dump({"rules": rules}, f, indent=2)
    else:
        raise ValueError(f"Unsupported format: {format}. Use 'yaml' or 'json'")
