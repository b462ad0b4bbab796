"""Profile history store: trends populate, anomalies fire across runs."""

import json

from click.testing import CliRunner

from sparvi_core_spark.cli.main import cli
from sparvi_core_spark.profiler.history import load_history, profile_with_history


def test_history_accumulates_and_detects(spark, views, tmp_path):
    hd = str(tmp_path / "hist")
    p1 = profile_with_history(spark, "region", hd)
    assert p1["anomalies"] == []  # first run: nothing to compare
    assert len(p1["trends"]["row_counts"]) == 1

    p2 = profile_with_history(spark, "region", hd)
    assert len(p2["trends"]["row_counts"]) == 2
    assert p2["anomalies"] == []  # same data → no anomaly

    # tamper the stored snapshot to simulate a row-count change
    files = sorted((tmp_path / "hist" / "region").glob("*.json"))
    latest = files[-1]
    snap = json.loads(latest.read_text())
    snap["row_count"] = 1000
    latest.write_text(json.dumps(snap))

    p3 = profile_with_history(spark, "region", hd)
    assert any(a["type"] == "row_count" for a in p3["anomalies"])
    assert len(load_history(hd, "region")) == 3


def test_cli_history_dir(spark, sf_dir, tmp_path):
    hd = str(tmp_path / "hist")
    r1 = CliRunner().invoke(
        cli, ["profile", sf_dir, "nation", "--format", "minimal", "--history-dir", hd]
    )
    assert r1.exit_code == 0, r1.output
    r2 = CliRunner().invoke(
        cli, ["profile", sf_dir, "nation", "--history-dir", hd]
    )
    assert r2.exit_code == 0, r2.output
    assert "Row-count trend (2 runs): 25 -> 25" in r2.output
