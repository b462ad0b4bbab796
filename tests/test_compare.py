"""Profile comparison unit tests: anomalies, schema shifts, trends (D3-D5)."""

from sparvi_core_spark.profiler.compare import (
    build_trends,
    detect_anomalies,
    detect_schema_shifts,
)


def _profile(row_count=100, null_pct=None, avg=None, stdev=10.0, dup=0, ts="t0"):
    return {
        "timestamp": ts,
        "row_count": row_count,
        "duplicate_count": dup,
        "completeness": {
            "c": {
                "nulls": 0,
                "null_percentage": null_pct if null_pct is not None else 0.0,
                "distinct_count": 10,
                "distinct_percentage": 10.0,
            }
        },
        "numeric_stats": {
            "c": {"avg": avg if avg is not None else 50.0, "stdev": stdev}
        },
    }


def test_no_historical_no_anomalies():
    assert detect_anomalies(_profile(), None) == []
    assert detect_schema_shifts(_profile(), None) == []


def test_row_count_anomaly_severities():
    cur, prev = _profile(row_count=130), _profile(row_count=100)
    a = detect_anomalies(cur, prev)
    assert [x["type"] for x in a] == ["row_count"]
    assert a[0]["severity"] == "high"  # 30% > 20%
    a2 = detect_anomalies(_profile(row_count=110), prev)
    assert a2[0]["severity"] == "medium"  # 10%
    assert detect_anomalies(_profile(row_count=102), prev) == []  # 2% < 5%


def test_null_rate_anomaly():
    a = detect_anomalies(_profile(null_pct=40.0), _profile(null_pct=5.0))
    types = {x["type"] for x in a}
    assert "null_rate" in types
    nr = next(x for x in a if x["type"] == "null_rate")
    assert nr["column"] == "c"
    assert nr["severity"] == "high"  # 35-point move


def test_numeric_shift_anomaly():
    a = detect_anomalies(_profile(avg=90.0), _profile(avg=50.0, stdev=10.0))
    shift = next(x for x in a if x["type"] == "numeric_shift")
    assert shift["column"] == "c"  # 4 sigma > 3 sigma threshold
    assert detect_anomalies(_profile(avg=60.0), _profile(avg=50.0, stdev=10.0)) == []


def test_duplicate_anomaly():
    a = detect_anomalies(_profile(dup=5), _profile(dup=0))
    assert any(x["type"] == "duplicate_count" for x in a)


def test_trends_accumulation():
    profiles = [
        _profile(row_count=10, ts="t0"),
        _profile(row_count=20, ts="t1"),
        _profile(row_count=30, ts="t2"),
    ]
    t = build_trends(profiles)
    assert [p["value"] for p in t["row_counts"]] == [10, 20, 30]
    assert [p["timestamp"] for p in t["row_counts"]] == ["t0", "t1", "t2"]
    assert "c" in t["null_rates"] and len(t["null_rates"]["c"]) == 3
