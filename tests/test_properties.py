"""Property-based tests (hypothesis) for driver-side logic: comparators,
rule defaulting, anomaly symmetry. Kept Spark-free so hypothesis can run
hundreds of examples cheaply."""

from hypothesis import given, strategies as st

from sparvi_core_spark.profiler.compare import detect_anomalies
from sparvi_core_spark.validations.runner import _compare

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@given(a=finite, b=finite)
def test_comparator_pairs_consistent(a, b):
    """Verbose and symbolic operators always agree (validator.py:99-113)."""
    for verbose, sym in [
        ("equals", "=="), ("greater_than", ">"), ("less_than", "<"),
        ("greater_than_or_equal", ">="), ("less_than_or_equal", "<="),
        ("not_equals", "!="),
    ]:
        assert _compare(verbose, a, b) == _compare(sym, a, b)


@given(a=finite, b=finite)
def test_comparator_trichotomy(a, b):
    assert _compare("equals", a, b) + _compare(">", a, b) + _compare("<", a, b) == 1
    assert _compare(">=", a, b) == (not _compare("<", a, b))
    assert _compare("not_equals", a, b) == (not _compare("equals", a, b))


@given(lo=finite, hi=finite, x=finite)
def test_between_semantics(lo, hi, x):
    assert _compare("between", x, [lo, hi]) == (lo <= x <= hi)


@given(
    prev=st.integers(min_value=1, max_value=10**12),
    cur=st.integers(min_value=0, max_value=10**12),
)
def test_row_count_anomaly_threshold(prev, cur):
    """Anomaly iff relative change > 5%; severity high iff > 20%."""
    anomalies = detect_anomalies(
        {"row_count": cur, "completeness": {}, "numeric_stats": {}},
        {"row_count": prev, "completeness": {}, "numeric_stats": {}},
    )
    rc = [a for a in anomalies if a["type"] == "row_count"]
    change = abs(cur - prev) / prev
    assert bool(rc) == (change > 0.05)
    if rc:
        assert rc[0]["severity"] == ("high" if change > 0.2 else "medium")
