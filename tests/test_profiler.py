"""Profiler E2E — port of the reference's exact assertions
(reference tests/test_profiler.py:8-61) plus coverage the reference
stubs (anomalies for real)."""

from sparvi_core_spark import profile_table


def test_basic_profile(spark, employees):
    p = profile_table(spark, "employees")
    assert p["row_count"] == 10
    assert p["completeness"]["name"]["nulls"] == 0
    assert p["completeness"]["age"]["nulls"] == 2
    assert p["completeness"]["salary"]["nulls"] == 2
    assert p["completeness"]["department"]["nulls"] == 1
    assert p["numeric_stats"]["salary"]["min"] == 50000
    assert p["numeric_stats"]["salary"]["max"] == 140000
    assert p["samples"], "samples should be present"
    assert p["duplicate_count"] == 0


def test_completeness_percentages(spark, employees):
    p = profile_table(spark, "employees", include_samples=False)
    assert p["completeness"]["age"]["null_percentage"] == 20.0
    assert p["completeness"]["department"]["distinct_count"] == 3
    assert p["completeness"]["department"]["distinct_percentage"] == 30.0


def test_numeric_quartiles_exact(spark, employees):
    p = profile_table(spark, "employees", include_samples=False)
    s = p["numeric_stats"]["salary"]
    # 8 non-null salaries 50k..140k: exact percentile_cont interpolation
    assert s["median"] == 95000.0
    assert s["q1"] == 67500.0
    assert s["q3"] == 115000.0
    assert round(s["avg"], 2) == 93750.0


def test_text_and_frequent(spark, employees):
    p = profile_table(spark, "employees", include_samples=False)
    assert p["text_length_stats"]["department"]["min_length"] == 2  # "HR"
    assert p["text_patterns"]["name"]["email_pattern_count"] == 0
    fv = p["frequent_values"]["department"]
    # HR/IT/Finance each x3; tie broken by value asc → Finance
    assert fv["frequency"] == 3
    assert fv["value"] == "Finance"


def test_anomaly_detection_row_count(spark, employees):
    """The reference's anomaly spec (its stub can't pass its own test;
    ours must): row-count change → anomaly with type row_count."""
    base = profile_table(spark, "employees", include_samples=False)
    historical = dict(base)
    historical["row_count"] = 100
    p = profile_table(
        spark, "employees", historical_data=historical, include_samples=False
    )
    types = [a["type"] for a in p["anomalies"]]
    assert "row_count" in types
    a = p["anomalies"][types.index("row_count")]
    assert a["severity"] == "high"
    assert "description" in a


def test_schema_shift_detection(spark, employees):
    base = profile_table(spark, "employees", include_samples=False)
    historical = dict(base)
    historical["completeness"] = dict(historical["completeness"])
    historical["completeness"]["legacy_col"] = {
        "nulls": 0, "null_percentage": 0, "distinct_count": 1,
        "distinct_percentage": 10,
    }
    del historical["completeness"]["department"]
    p = profile_table(
        spark, "employees", historical_data=historical, include_samples=False
    )
    kinds = {(s["type"], s["column"]) for s in p["schema_shifts"]}
    assert ("column_added", "department") in kinds
    assert ("column_removed", "legacy_col") in kinds


def test_profile_from_path(spark, sf_dir):
    p = profile_table(spark, f"{sf_dir}/region.parquet", include_samples=False)
    assert p["row_count"] == 5
    assert p["completeness"]["r_name"]["distinct_count"] == 5


def test_approx_mode(spark, views):
    exact = profile_table(spark, "lineitem", include_samples=False)
    approx = profile_table(
        spark,
        "lineitem",
        include_samples=False,
        config={"profiling": {"approx_distinct": True, "approx_percentiles": True}},
    )
    for col in exact["completeness"]:
        e = exact["completeness"][col]["distinct_count"]
        a = approx["completeness"][col]["distinct_count"]
        assert abs(a - e) <= max(5, 0.1 * e), f"{col}: approx {a} vs exact {e}"
    assert approx["numeric_stats"]["l_quantity"]["median"] is not None


def test_profile_tables_concurrent(spark, views):
    from sparvi_core_spark import profile_tables

    out = profile_tables(spark, ["region", "nation", "supplier"])
    assert set(out) == {"region", "nation", "supplier"}
    assert out["region"]["row_count"] == 5
    assert out["nation"]["row_count"] == 25
