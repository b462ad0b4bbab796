"""CLI contract — mirrors reference tests/test_cli.py:8-36."""

import pytest

import json

from click.testing import CliRunner

from sparvi_core_spark.cli.main import cli


def test_help_lists_commands():
    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for cmd in ("profile", "validate", "info", "test-connection"):
        assert cmd in r.output


def test_version():
    r = CliRunner().invoke(cli, ["--version"])
    assert r.exit_code == 0


def test_info():
    r = CliRunner().invoke(cli, ["info"])
    assert r.exit_code == 0
    assert "pyspark" in r.output


def test_profile_minimal(spark, sf_dir):
    r = CliRunner().invoke(
        cli, ["profile", sf_dir, "region", "--format", "minimal"]
    )
    assert r.exit_code == 0, r.output
    assert "Row count" in r.output


def test_profile_json_output(spark, sf_dir, tmp_path):
    out = tmp_path / "profile.json"
    r = CliRunner().invoke(
        cli,
        ["profile", sf_dir, "nation", "--format", "minimal", "--output", str(out)],
    )
    assert r.exit_code == 0, r.output
    prof = json.loads(out.read_text())
    assert prof["row_count"] == 25
    assert "completeness" in prof


def test_validate_generate_defaults(spark, sf_dir, tmp_path):
    out = tmp_path / "results.json"
    rules_out = tmp_path / "rules.yaml"
    r = CliRunner().invoke(
        cli,
        [
            "validate", sf_dir, "region",
            "--generate-defaults",
            "--save-defaults", str(rules_out),
            "--output", str(out),
        ],
    )
    assert r.exit_code == 0, r.output
    assert "Generated" in r.output
    assert "passed" in r.output
    assert rules_out.exists()
    results = json.loads(out.read_text())
    assert all("rule_name" in x for x in results)


def test_test_connection(spark, sf_dir):
    r = CliRunner().invoke(cli, ["test-connection", sf_dir])
    assert r.exit_code == 0, r.output
    assert "Connection successful" in r.output


def test_profile_table_format_renders_aligned_tables(spark, sf_dir):
    r = CliRunner().invoke(
        cli, ["profile", sf_dir, "region", "--format", "table", "--no-samples"]
    )
    assert r.exit_code == 0, r.output
    assert "Row count" in r.output
    assert "| column" in r.output, "aligned table header expected"
    assert r.output.count("+-") > 4, "table rules expected"


def test_validate_max_length_hint(spark, sf_dir):
    r = CliRunner().invoke(
        cli,
        ["validate", sf_dir, "region", "--generate-defaults",
         "--max-length", "r_name=25"],
    )
    assert r.exit_code == 0, r.output
    assert "check_r_name_max_length" in r.output
    bad = CliRunner().invoke(
        cli,
        ["validate", sf_dir, "region", "--generate-defaults",
         "--max-length", "r_name"],
    )
    assert bad.exit_code != 0


def test_drift_command_table_and_json(spark, sf_dir):
    """drift of a table against itself reads PSI 0.0 / low everywhere;
    json format round-trips."""
    import json as _json

    r = CliRunner().invoke(
        cli, ["drift", sf_dir, sf_dir, "orders",
              "--columns", "o_totalprice", "--columns", "o_custkey"]
    )
    assert r.exit_code == 0, r.output
    assert "Distribution drift: orders" in r.output
    assert "o_totalprice" in r.output and "low" in r.output

    rj = CliRunner().invoke(
        cli, ["drift", sf_dir, sf_dir, "orders", "--columns", "o_totalprice",
              "--format", "json"]
    )
    assert rj.exit_code == 0, rj.output
    payload = _json.loads(rj.output)
    assert payload["columns"][0]["psi"] == 0.0
    assert payload["columns"][0]["n_ref"] == payload["columns"][0]["n_cur"]


def test_drift_command_with_ks(spark, sf_dir):
    import json as _json

    r = CliRunner().invoke(
        cli, ["drift", sf_dir, sf_dir, "orders", "--columns", "o_totalprice",
              "--ks", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    col = _json.loads(r.output)["columns"][0]
    assert col["psi"] == 0.0 and col["ks"] == 0.0


def test_profile_sample_fraction(spark, sf_dir, tmp_path):
    """--sample-fraction flips to the approx profiler: estimated row
    count with bounds, JSON round-trip, and the table renderer."""
    out = tmp_path / "approx.json"
    r = CliRunner().invoke(
        cli,
        ["profile", sf_dir, "orders", "--sample-fraction", "0.5",
         "--format", "json", "--output", str(out)],
    )
    assert r.exit_code == 0, r.output
    prof = json.loads(out.read_text())
    assert prof["table"] == "orders"
    assert prof["fraction"] == 0.5
    assert abs(prof["row_count_est"] - 1500) <= 3 * prof["row_count_ci"]
    assert "o_totalprice" in prof["columns"]

    r2 = CliRunner().invoke(
        cli, ["profile", sf_dir, "orders", "--sample-fraction", "0.5"]
    )
    assert r2.exit_code == 0, r2.output
    assert "sampled 0.5" in r2.output
    assert "distinct seen (lower bound)" in r2.output


def test_overlap_command(spark, sf_dir, tmp_path):
    """theta-sketch set overlap between two snapshots of a table —
    same table on both sides → perfect overlap; json shape checked."""
    r = CliRunner().invoke(
        cli, ["overlap", sf_dir, sf_dir, "nation",
              "--columns", "n_nationkey", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    row = out["columns"][0]
    assert row["column"] == "n_nationkey"
    assert round(row["n_intersection"]) == 25
    assert round(row["n_only_a"]) == 0 and round(row["n_only_b"]) == 0
    assert row["jaccard"] == 1.0

    r2 = CliRunner().invoke(
        cli, ["overlap", sf_dir, sf_dir, "nation", "--columns", "n_name"]
    )
    assert r2.exit_code == 0, r2.output
    assert "Value-set overlap" in r2.output


def test_changepoints_command(spark, tmp_path):
    """EWMA change-points from a metrics store via the CLI."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "metrics")
    rows = [
        ("orders", f"2026-01-{i+1:02d}T000000", "row_count", None, v)
        for i, v in enumerate([100.0] * 8 + [1000.0])
    ]
    spark.createDataFrame(
        rows, "table string, timestamp string, metric string, "
              "column string, value double"
    ).write.partitionBy("table").parquet(path)

    r = CliRunner().invoke(
        cli, ["changepoints", path, "--table", "orders", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    assert len(out["changepoints"]) == 1
    assert out["changepoints"][0]["value"] == 1000.0


def test_summary_command(spark, sf_dir, tmp_path):
    """Merge an incremental summary store from the CLI."""
    from sparvi_core_spark.profiler.incremental import partition_profile

    store = str(tmp_path / "summary_store")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    partition_profile(orders, ["o_totalprice"], batch_id="b0").write.parquet(store)

    r = CliRunner().invoke(
        cli, ["summary", store, "--quantiles", "0.5", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    row = out["columns"][0]
    assert row["column"] == "o_totalprice"
    assert row["n_rows"] == orders.count()
    assert float(row["p50"]) > 0

    r2 = CliRunner().invoke(cli, ["summary", store])
    assert r2.exit_code == 0, r2.output
    assert "Merged profile" in r2.output


def test_shard_command(tmp_path, sf_dir):
    import json
    import os

    from click.testing import CliRunner

    from sparvi_core_spark.cli.main import cli

    dest = str(tmp_path / "shards")
    r = CliRunner().invoke(
        cli,
        ["shard", sf_dir, "documents", dest, "--n-shards", "3",
         "--tokens-col", "n_chars", "--cpus", "4"],
    )
    assert r.exit_code == 0, r.output
    manifest = json.loads(r.output.strip().splitlines()[-1])
    assert manifest["n_shards"] == 3
    assert manifest["rows"] == sum(s["rows"] for s in manifest["shards"])
    assert os.path.exists(os.path.join(dest, "_manifest.json"))

    # arg validation: both/neither count flags rejected
    r2 = CliRunner().invoke(cli, ["shard", sf_dir, "documents", dest])
    assert r2.exit_code != 0


def test_diversity_command_table_and_json(spark, sf_dir):
    import json as _json

    r = CliRunner().invoke(
        cli, ["diversity", sf_dir, "documents", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    payload = _json.loads(r.output.strip().splitlines()[-1])
    assert payload["table"] == "documents"
    assert payload["n_docs"] > 0 and payload["vocab_size"] > 0
    assert -5 < payload["zipf_slope"] < 0

    r2 = CliRunner().invoke(cli, ["diversity", sf_dir, "documents"])
    assert r2.exit_code == 0, r2.output
    assert "token_entropy" in r2.output


def test_pii_command_scan_and_redact(spark, sf_dir, tmp_path):
    import json as _json

    r = CliRunner().invoke(
        cli, ["pii", sf_dir, "documents", "--format", "json"]
    )
    assert r.exit_code == 0, r.output
    payload = _json.loads(r.output.strip().splitlines()[-1])
    assert payload["table"] == "documents"
    assert payload["n_docs"] == 500
    assert payload["docs_with_pii"] >= 0

    out = str(tmp_path / "clean")
    r2 = CliRunner().invoke(
        cli,
        ["pii", sf_dir, "documents", "--types", "email,ipv4",
         "--redact-to", out],
    )
    assert r2.exit_code == 0, r2.output
    assert "docs_with_pii" in r2.output
    assert spark.read.parquet(out).count() == 500


def test_chat_command_report_and_render(spark, sf_dir, tmp_path):
    import json as _json

    # build a chat-shaped parquet table: 3 valid + 1 alternation-fail
    # + 1 corrupt JSON
    db = tmp_path / "chatdb"
    src = str(db / "chat.parquet")
    spark.createDataFrame(
        [
            (1, '[{"role":"user","content":"hi"},'
                '{"role":"assistant","content":"hello"}]'),
            (2, '[{"role":"system","content":"be terse"},'
                '{"role":"user","content":"q"},'
                '{"role":"assistant","content":"a"}]'),
            (3, '[{"role":"user","content":"x"},'
                '{"role":"assistant","content":"y"}]'),
            (4, '[{"role":"user","content":"x"},'
                '{"role":"user","content":"y"}]'),
            (5, "broken"),
        ],
        "doc_id long, messages string",
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "rendered")
    r = CliRunner().invoke(
        cli,
        ["chat", str(db), "chat", "--format", "json", "--render-to", out],
    )
    assert r.exit_code == 0, r.output
    payload = _json.loads(r.output.strip().splitlines()[-1])
    assert payload["n_conversations"] == 5 and payload["n_valid"] == 3
    assert payload["fail_parse_ok"] == 1
    assert payload["fail_alternates_ok"] == 2  # corrupt row also fails
    rendered = spark.read.parquet(out)
    assert rendered.count() == 3
    assert set(rendered.columns) == {"doc_id", "text"}

    r2 = CliRunner().invoke(cli, ["chat", str(db), "chat"])
    assert r2.exit_code == 0, r2.output
    assert "fail_last_role_ok" in r2.output

    # '' disables the closing-role rule
    r3 = CliRunner().invoke(
        cli, ["chat", str(db), "chat", "--last-role", "", "--format", "json"]
    )
    assert r3.exit_code == 0, r3.output
    p3 = _json.loads(r3.output.strip().splitlines()[-1])
    assert "fail_last_role_ok" not in p3


def test_gopher_command_gate_and_keep(spark, sf_dir, tmp_path):
    import json as _json

    r = CliRunner().invoke(
        cli,
        ["gopher", sf_dir, "documents", "--no-required-words",
         "--format", "json"],
    )
    assert r.exit_code == 0, r.output
    payload = _json.loads(r.output.strip().splitlines()[-1])
    assert payload["total_docs"] == 500
    assert 0 < payload["pass_both"] <= payload["pass_quality"]
    assert payload["rule_kills"]["required_words"] == 0  # rule disabled
    assert payload["pass_repetition"] > 0

    out = str(tmp_path / "gated")
    r2 = CliRunner().invoke(
        cli,
        ["gopher", sf_dir, "documents", "--no-required-words",
         "--keep-to", out],
    )
    assert r2.exit_code == 0, r2.output
    kept = spark.read.parquet(out)
    assert kept.count() == payload["pass_both"]
    assert "text" in kept.columns  # original columns survive

    # English-specific rule ON kills the synthetic corpus entirely
    r3 = CliRunner().invoke(
        cli, ["gopher", sf_dir, "documents", "--format", "json"]
    )
    p3 = _json.loads(r3.output.strip().splitlines()[-1])
    assert p3["pass_quality"] == 0
    assert p3["rule_kills"]["required_words"] == 500


def test_datacard_command(spark, sf_dir, tmp_path):
    import json as _json

    out = str(tmp_path / "card.json")
    r = CliRunner().invoke(
        cli,
        ["datacard", sf_dir, "documents", "--no-required-words",
         "--output", out, "--format", "json"],
    )
    assert r.exit_code == 0, r.output
    card = _json.loads(r.output.strip().splitlines()[-1])
    assert card["size"]["n_docs"] == 500
    assert card["tokens"]["total_ws_tokens"] > 0
    assert 0 < card["tokens"]["doc_tokens_p50"] <= card["tokens"]["doc_tokens_p99"]
    assert abs(sum(card["languages"].values()) - 1.0) < 0.01
    assert 0 < card["quality"]["gopher_quality_pass_frac"] <= 1
    assert 0 <= card["quality"]["c4_pass_frac"] <= 1
    assert card["exact_duplicates"]["duplicate_frac"] == 0.0
    # the --output artifact round-trips to the same card
    with open(out) as fh:
        assert _json.load(fh) == card

    # precomputed language column path
    r2 = CliRunner().invoke(
        cli,
        ["datacard", sf_dir, "documents", "--lang-col", "lang",
         "--format", "json"],
    )
    assert r2.exit_code == 0, r2.output
    card2 = _json.loads(r2.output.strip().splitlines()[-1])
    assert set(card2["languages"]) >= {"en"}

    # explicit stopword tier still works (ngram is the default)
    r3 = CliRunner().invoke(
        cli,
        ["datacard", sf_dir, "documents", "--lang-strategy", "stopword",
         "--format", "json"],
    )
    assert r3.exit_code == 0, r3.output
    card3 = _json.loads(r3.output.strip().splitlines()[-1])
    assert abs(sum(card3["languages"].values()) - 1.0) < 0.01


def test_dedup_index_lifecycle(spark, sf_dir, tmp_path):
    """build → screen (self-screen drops near-everything) → health
    through the CLI surface."""
    idx = str(tmp_path / "mhidx")
    r = CliRunner().invoke(
        cli,
        ["dedup-index", "build", sf_dir, "documents", idx,
         "--num-hashes", "8", "--n-buckets", "16"],
    )
    assert r.exit_code == 0, r.output
    man = json.loads(r.output.strip().splitlines()[-1])
    assert man["n_docs"] > 0 and man["bands"] >= 1

    out = tmp_path / "kept"
    r = CliRunner().invoke(
        cli,
        ["dedup-index", "screen", sf_dir, "documents", idx,
         "--threshold", "0.9", "--keep-to", str(out), "--format", "json"],
    )
    assert r.exit_code == 0, r.output
    rep = json.loads(r.output.strip().splitlines()[-1])
    # screening the indexed corpus against itself: ids match so
    # self-pairs are skipped, but every doc with a distinct-id twin
    # (planted dups) is dropped; fresh singletons survive
    assert rep["rows_in"] == rep["rows_kept"] + rep["rows_dropped"]
    assert spark.read.parquet(str(out)).count() == rep["rows_kept"]

    r = CliRunner().invoke(cli, ["dedup-index", "compact", idx])
    assert r.exit_code == 0, r.output
    st = json.loads(r.output.strip().splitlines()[-1])
    assert "bands" in st and "sigs" in st

    r = CliRunner().invoke(cli, ["dedup-index", "health", idx])
    assert r.exit_code == 0, r.output
    h = json.loads(r.output.strip().splitlines()[-1])
    assert h["bad"] == 0

    # takedown verb: tombstone one doc, then compact purges it
    r = CliRunner().invoke(
        cli, ["dedup-index", "delete", idx, "--id", "0"]
    )
    assert r.exit_code == 0, r.output
    d = json.loads(r.output.strip().splitlines()[-1])
    assert d["requested"] == 1 and d["tombstones_total"] == 1

    r = CliRunner().invoke(cli, ["dedup-index", "compact", idx])
    assert r.exit_code == 0, r.output
    st = json.loads(r.output.strip().splitlines()[-1])
    assert st["purge"]["sigs"]["rows_dropped"] == d["pending_purge"]

    r = CliRunner().invoke(cli, ["dedup-index", "health", idx])
    assert r.exit_code == 0, r.output
    assert json.loads(r.output.strip().splitlines()[-1])["bad"] == 0

    # break-lock: no lock -> removed null; planted foreign lock -> payload
    r = CliRunner().invoke(cli, ["dedup-index", "break-lock", idx])
    assert r.exit_code == 0, r.output
    assert json.loads(r.output.strip().splitlines()[-1])["removed"] is None
    with open(f"{idx}/_writer.lock", "w") as f:
        json.dump({"pid": 1, "host": "elsewhere", "op": "compact",
                   "token": "t"}, f)
    r = CliRunner().invoke(cli, ["dedup-index", "break-lock", idx])
    assert r.exit_code == 0, r.output
    assert json.loads(
        r.output.strip().splitlines()[-1]
    )["removed"]["host"] == "elsewhere"


@pytest.mark.slow
def test_ann_index_lifecycle_ivf(spark, sf_dir, tmp_path):
    """ann-index CLI, float IVF kind: build → staged append with
    auto-compact → search → delete → compact --if-over → health →
    break-lock."""
    src = str(tmp_path / "src")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.filter("vec_id < 400").write.parquet(f"{src}/emb_a.parquet")
    emb.filter("vec_id >= 400").write.parquet(f"{src}/emb_b.parquet")
    idx = str(tmp_path / "ividx")

    r = CliRunner().invoke(
        cli, ["ann-index", "build", src, "emb_a", idx, "--kind", "ivf",
              "--k", "4"],
    )
    assert r.exit_code == 0, r.output
    man = json.loads(r.output.strip().splitlines()[-1])
    assert man["n_vectors"] == 400 and man["k"] == 4

    r = CliRunner().invoke(
        cli, ["ann-index", "append", src, "emb_b", idx, "--kind", "ivf",
              "--staged", "--auto-compact", "1"],
    )
    assert r.exit_code == 0, r.output
    rep = json.loads(r.output.strip().splitlines()[-1])
    assert rep["n_vectors"] == 500
    # one staged file is not > threshold 1: the knob is a cheap no-op
    assert rep["auto_compact"]["compacted"] is False
    assert rep["auto_compact"]["max_files_per_bucket"] == 1

    r = CliRunner().invoke(
        cli, ["ann-index", "search", src, "emb_b", idx, "--kind", "ivf",
              "--k", "3"],
    )
    assert r.exit_code == 0, r.output
    res = json.loads(r.output.strip().splitlines()[-1])
    assert res["results"] > 0 and len(res["sample"]) > 0

    r = CliRunner().invoke(
        cli, ["ann-index", "delete", idx, "--kind", "ivf", "--id", "400"],
    )
    assert r.exit_code == 0, r.output
    assert json.loads(r.output.strip().splitlines()[-1])["requested"] == 1

    r = CliRunner().invoke(
        cli, ["ann-index", "compact", idx, "--kind", "ivf"],
    )
    assert r.exit_code == 0, r.output
    st = json.loads(r.output.strip().splitlines()[-1])
    # one compact folds the staged append AND purges the (still-staged)
    # takedown
    assert "staging" in st
    assert st["purge"]["rows_dropped"] == 1

    r = CliRunner().invoke(
        cli, ["ann-index", "health", idx, "--kind", "ivf"],
    )
    assert r.exit_code == 0, r.output
    assert json.loads(r.output.strip().splitlines()[-1])["cells"] == 4

    r = CliRunner().invoke(cli, ["ann-index", "break-lock", idx])
    assert r.exit_code == 0, r.output
    assert json.loads(r.output.strip().splitlines()[-1])["removed"] is None


@pytest.mark.slow
def test_ann_index_lifecycle_binary_and_ivfpq(spark, sf_dir, tmp_path):
    """ann-index CLI, binary and ivfpq kinds: build → staged append →
    rerank search → compact --if-over → health."""
    src = str(tmp_path / "src")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.filter("vec_id < 400").write.parquet(f"{src}/emb_a.parquet")
    emb.filter("vec_id >= 400").write.parquet(f"{src}/emb_b.parquet")

    for kind, extra in (
        ("binary", ["--bits", "64", "--prefix-bits", "3"]),
        ("ivfpq", ["--k", "4", "--m", "2", "--ks", "8"]),
    ):
        idx = str(tmp_path / f"{kind}_idx")
        r = CliRunner().invoke(
            cli, ["ann-index", "build", src, "emb_a", idx,
                  "--kind", kind] + extra,
        )
        assert r.exit_code == 0, (kind, r.output)
        assert json.loads(
            r.output.strip().splitlines()[-1]
        )["n_vectors"] == 400

        r = CliRunner().invoke(
            cli, ["ann-index", "append", src, "emb_b", idx,
                  "--kind", kind, "--staged"],
        )
        assert r.exit_code == 0, (kind, r.output)
        assert json.loads(
            r.output.strip().splitlines()[-1]
        )["n_vectors"] == 500

        r = CliRunner().invoke(
            cli, ["ann-index", "search", src, "emb_b", idx,
                  "--kind", kind, "--k", "3", "--rerank", "6"],
        )
        assert r.exit_code == 0, (kind, r.output)
        assert json.loads(r.output.strip().splitlines()[-1])["results"] > 0

        r = CliRunner().invoke(
            cli, ["ann-index", "compact", idx, "--kind", kind,
                  "--if-over", "1"],
        )
        assert r.exit_code == 0, (kind, r.output)
        st = json.loads(r.output.strip().splitlines()[-1])
        # staged files tripped the gauge with clean bucket dirs: the
        # knob takes the CHEAP tier (append-shaped staging fold)
        assert st["folded"] is True and st["compacted"] is False

        r = CliRunner().invoke(
            cli, ["ann-index", "health", idx, "--kind", kind],
        )
        assert r.exit_code == 0, (kind, r.output)
