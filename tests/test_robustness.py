"""Robustness sweep: every testdata table through the profiler and the
default-rule generator; env-var config overrides; CLI compare round-trip."""

import json
import os

import pytest
from click.testing import CliRunner

from sparvi_core_spark import get_default_validations, profile_table, run_validations
from sparvi_core_spark.cli.main import cli
from sparvi_core_spark.config import get_config
from sparvi_core_spark.session import TESTDATA_TABLES


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_profile_every_table(spark, views, table):
    """Includes embeddings (array<float> column → 'other' bucket:
    completeness + frequency only) and events (converted nanos ts)."""
    p = profile_table(spark, table, include_samples=False)
    assert p["row_count"] > 0
    assert set(p["completeness"].keys()) == set(views[table].columns)
    # array columns must not leak into numeric/text/date stats
    if table == "embeddings":
        assert "embedding" not in p["numeric_stats"]
        assert "embedding" not in p["text_length_stats"]
        assert p["completeness"]["embedding"]["nulls"] == 0


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_default_rules_every_table(spark, views, table):
    rules = get_default_validations(spark, table)
    assert any(r["name"] == f"check_{table}_not_empty" for r in rules)
    # every generated rule must at least parse and run
    results = run_validations(spark, rules)
    errored = [r for r in results if "error" in r]
    assert not errored, f"rules errored on {table}: {errored}"


def test_env_override(monkeypatch):
    monkeypatch.setenv("SPARVI_PROFILING_SAMPLE_ROW_LIMIT", "3")
    monkeypatch.setenv("SPARVI_PROFILING_APPROX_DISTINCT", "true")
    cfg = get_config()
    assert cfg["profiling"]["sample_row_limit"] == 3
    assert cfg["profiling"]["approx_distinct"] is True


def test_env_override_applies_to_profile(spark, employees, monkeypatch):
    monkeypatch.setenv("SPARVI_PROFILING_SAMPLE_ROW_LIMIT", "2")
    p = profile_table(spark, "employees")
    assert len(p["samples"]) == 2


def test_cli_compare_roundtrip(spark, sf_dir, tmp_path):
    out = tmp_path / "profile.json"
    r1 = CliRunner().invoke(
        cli, ["profile", sf_dir, "nation", "--format", "minimal", "--output", str(out)]
    )
    assert r1.exit_code == 0, r1.output
    # tamper the historical row count → anomaly must surface
    prof = json.loads(out.read_text())
    prof["row_count"] = 500
    out.write_text(json.dumps(prof))
    r2 = CliRunner().invoke(
        cli, ["profile", sf_dir, "nation", "--compare", str(out)]
    )
    assert r2.exit_code == 0, r2.output
    assert "Anomalies" in r2.output and "row_count" in r2.output
