"""Mergeable profiles: batch-wise summaries must merge to what a
single whole-corpus profile computes — counts/min/max exactly; the
HLL distinct estimate within sketch error of the exact count on both
paths (single-scan sketches use the HIP estimator, merged ones the
composite estimator, so the two are close but not bit-identical)."""

import math

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.profiler.incremental import (
    merge_profiles,
    partition_profile,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _merged_dict(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_batched_merge_equals_single_scan(spark, orders):
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    # three arbitrary batches partitioning the table
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    parts = partition_profile(batches[0], cols, batch_id="b0")
    for i, b in enumerate(batches[1:], 1):
        parts = parts.unionByName(partition_profile(b, cols, batch_id=f"b{i}"))
    got = _merged_dict(merge_profiles(parts))

    whole = _merged_dict(
        merge_profiles(partition_profile(orders, cols, batch_id="all"))
    )
    exact = {
        c: orders.select(F.countDistinct(c)).first()[0] for c in cols
    }
    for c in cols:
        g, w = got[c], whole[c]
        assert g["n_rows"] == w["n_rows"]
        assert g["n_nulls"] == w["n_nulls"]
        # both the merged (composite estimator) and single-scan (HIP)
        # estimates must sit within sketch error of the exact count
        assert g["approx_distinct"] == pytest.approx(exact[c], rel=0.05), c
        assert w["approx_distinct"] == pytest.approx(exact[c], rel=0.05), c
        assert g["min_str"] == w["min_str"] and g["max_str"] == w["max_str"]
        if g["mean"] is not None:
            assert g["mean"] == pytest.approx(w["mean"], rel=1e-12)
            assert g["stddev"] == pytest.approx(w["stddev"], rel=1e-9)


def test_merge_is_batching_invariant(spark, orders):
    """Determinism pin: DIFFERENT batchings merge to the IDENTICAL
    estimate (union of the same value set → same registers), even
    though merged != single-scan."""
    cols = ["o_orderkey", "o_orderstatus"]
    by3 = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    by2 = [orders.filter(F.col("o_orderkey") % 2 == i) for i in range(2)]

    def merged(batches):
        parts = partition_profile(batches[0], cols, batch_id="0")
        for i, b in enumerate(batches[1:], 1):
            parts = parts.unionByName(
                partition_profile(b, cols, batch_id=str(i))
            )
        return _merged_dict(merge_profiles(parts))

    a, b = merged(by3), merged(by2)
    for c in cols:
        assert a[c]["approx_distinct"] == b[c]["approx_distinct"], c


def test_merged_stats_match_direct_aggregates(spark, orders):
    got = _merged_dict(
        merge_profiles(partition_profile(orders, ["o_totalprice"]))
    )["o_totalprice"]
    direct = orders.agg(
        F.count(F.lit(1)),
        F.countDistinct("o_totalprice"),
        F.min(F.col("o_totalprice").cast("double")),
        F.max(F.col("o_totalprice").cast("double")),
        F.avg("o_totalprice"),
        F.stddev_samp("o_totalprice"),
    ).first()
    assert got["n_rows"] == direct[0]
    # HLL default lg_k=12: ~1.6% standard error
    assert got["approx_distinct"] == pytest.approx(direct[1], rel=0.05)
    assert got["min"] == direct[2] and got["max"] == direct[3]
    assert got["mean"] == pytest.approx(direct[4], rel=1e-9)
    assert got["stddev"] == pytest.approx(direct[5], rel=1e-6)


def test_null_only_batch_merges_cleanly(spark):
    a = spark.createDataFrame(
        [(1.0,), (2.0,)], "x double"
    )
    b = spark.createDataFrame([(None,), (None,)], "x double")
    parts = partition_profile(a, batch_id="a").unionByName(
        partition_profile(b, batch_id="b")
    )
    got = _merged_dict(merge_profiles(parts))["x"]
    assert got["n_rows"] == 4 and got["n_nulls"] == 2
    assert got["mean"] == pytest.approx(1.5)
    assert got["stddev"] == pytest.approx(math.sqrt(0.5))
    assert got["min"] == 1.0 and got["max"] == 2.0


def test_non_numeric_columns_have_null_numeric_stats(spark, orders):
    got = _merged_dict(
        merge_profiles(partition_profile(orders, ["o_orderstatus"]))
    )["o_orderstatus"]
    assert got["mean"] is None and got["min"] is None
    assert got["min_str"] is not None
    assert got["approx_distinct"] >= 1


def test_summary_is_tiny(spark, orders):
    parts = partition_profile(orders)
    assert parts.count() == len(orders.columns)  # one row per column


def test_stream_profiles_merge_to_batch_equivalent(spark, tmp_path):
    """Micro-batch profiles written by the stream merge to the same
    stats as batch partition profiles over the same data (counts and
    min/max exact; one micro-batch here, so even the sketch agrees)."""
    from sparvi_core_spark.profiler.incremental import profile_stream_batches
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src = f"{SF_DIR}/events.parquet"
    store = str(tmp_path / "profiles")
    stream = stream_events(spark, src)
    q = profile_stream_batches(
        stream,
        store,
        cols=["user_id", "value"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = _merged_dict(merge_profiles(spark.read.parquet(store)))
    ev = spark.read.parquet(src)
    direct = ev.agg(
        F.count(F.lit(1)),
        F.min(F.col("value").cast("double")),
        F.max(F.col("value").cast("double")),
        F.avg("value"),
    ).first()
    assert got["value"]["n_rows"] == direct[0]
    assert got["value"]["min"] == direct[1]
    assert got["value"]["max"] == direct[2]
    assert got["value"]["mean"] == pytest.approx(direct[3], rel=1e-9)
    assert got["user_id"]["n_rows"] == direct[0]

    # restarting the SAME source against the same checkpoint adds
    # nothing (exactly-once summary rows)
    q2 = profile_stream_batches(
        stream,
        store,
        cols=["user_id", "value"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    again = _merged_dict(merge_profiles(spark.read.parquet(store)))
    assert again["value"]["n_rows"] == direct[0]


# ---------------------------------------------------------------------------
# Mergeable quantiles (KLL) and set-overlap (theta) sketches
# ---------------------------------------------------------------------------


def _empirical_rank(df, col, value):
    n = df.count()
    return df.filter(F.col(col).cast("double") <= value).count() / n


def test_merged_quantiles_within_rank_tolerance(spark, orders):
    """Quartiles from a 3-batch KLL merge must sit within the sketch's
    normalized rank error of the true rank. k=200 gives ~1.65% single
    sketch; one merge level stays under 3%."""
    cols = ["o_totalprice"]
    batches = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    parts = partition_profile(batches[0], cols, batch_id="b0")
    for i, b in enumerate(batches[1:], 1):
        parts = parts.unionByName(partition_profile(b, cols, batch_id=f"b{i}"))
    got = _merged_dict(merge_profiles(parts))["o_totalprice"]
    for q, key in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
        rank = _empirical_rank(orders, "o_totalprice", got[key])
        assert abs(rank - q) < 0.03, (key, got[key], rank)


def test_merged_quantiles_respect_requested_list(spark, orders):
    got = _merged_dict(
        merge_profiles(
            partition_profile(orders, ["o_totalprice"]), quantiles=[0.1, 0.9]
        )
    )["o_totalprice"]
    assert "p10" in got and "p90" in got and "p50" not in got
    assert got["p10"] < got["p90"]


def test_old_store_without_quantile_sketch_still_merges(spark, orders):
    """Summary stores written before the KLL column existed keep
    merging — no p* columns, every other stat intact."""
    parts = partition_profile(orders, ["o_totalprice"]).drop(
        "quantile_sketch"
    )
    got = _merged_dict(merge_profiles(parts))["o_totalprice"]
    assert "p50" not in got
    assert got["n_rows"] == orders.count()


def test_non_numeric_columns_have_null_quantiles(spark, orders):
    got = _merged_dict(
        merge_profiles(partition_profile(orders, ["o_orderstatus"]))
    )["o_orderstatus"]
    assert got["p25"] is None and got["p50"] is None and got["p75"] is None


def test_theta_overlap_exact_below_nominal_entries(spark, orders):
    """Below 2^lg_k distincts a theta sketch is in exact mode: the
    overlap report must EQUAL the exact set arithmetic."""
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap,
        theta_summary,
    )

    da = orders.filter(F.col("o_orderkey") % 2 == 0)
    db = orders.filter(F.col("o_orderkey") % 3 == 0)
    rep = {
        r["column"]: r.asDict()
        for r in theta_overlap(
            theta_summary(da, ["o_custkey"], batch_id="a"),
            theta_summary(db, ["o_custkey"], batch_id="b"),
        ).collect()
    }["o_custkey"]
    ea = da.select("o_custkey").distinct()
    eb = db.select("o_custkey").distinct()
    n_a, n_b = ea.count(), eb.count()
    n_i = ea.intersect(eb).count()
    n_u = ea.union(eb).distinct().count()
    assert round(rep["n_a"]) == n_a and round(rep["n_b"]) == n_b
    assert round(rep["n_intersection"]) == n_i
    assert round(rep["n_union"]) == n_u
    assert round(rep["n_only_a"]) == n_a - n_i
    assert round(rep["n_only_b"]) == n_b - n_i
    assert rep["jaccard"] == pytest.approx(n_i / n_u)


def test_theta_overlap_folds_batches_per_side(spark, orders):
    """Each side may arrive as MANY batch rows (one per ingest); the
    overlap folds them with theta_union_agg before comparing."""
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap,
        theta_summary,
    )

    da = orders.filter(F.col("o_orderkey") % 2 == 0)
    a_parts = theta_summary(
        da.filter(F.col("o_orderkey") % 4 == 0), ["o_custkey"], batch_id="a0"
    ).unionByName(
        theta_summary(
            da.filter(F.col("o_orderkey") % 4 == 2),
            ["o_custkey"],
            batch_id="a1",
        )
    )
    whole = theta_summary(da, ["o_custkey"], batch_id="a")
    rep = {
        r["column"]: r.asDict()
        for r in theta_overlap(a_parts, whole).collect()
    }["o_custkey"]
    # batched side == whole side → perfect overlap
    assert round(rep["n_only_a"]) == 0 and round(rep["n_only_b"]) == 0
    assert rep["jaccard"] == pytest.approx(1.0)


def test_theta_overlap_disjoint_sets(spark):
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap,
        theta_summary,
    )

    a = spark.range(0, 100).withColumnRenamed("id", "k")
    b = spark.range(100, 250).withColumnRenamed("id", "k")
    rep = {
        r["column"]: r.asDict()
        for r in theta_overlap(
            theta_summary(a, ["k"], batch_id="a"),
            theta_summary(b, ["k"], batch_id="b"),
        ).collect()
    }["k"]
    assert round(rep["n_intersection"]) == 0
    assert round(rep["n_union"]) == 250
    assert rep["jaccard"] == 0.0


def test_theta_overlap_matrix(spark, orders):
    """Pairwise matrix across 3 named subsets — exact below 2^lg_k,
    names ordered, diagonal absent."""
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap_matrix,
        theta_summary,
    )

    subs = {
        name: orders.filter(F.col("o_orderkey") % 3 == i)
        for i, name in enumerate(["a", "b", "c"])
    }
    mats = theta_overlap_matrix(
        {n: theta_summary(d, ["o_custkey"], batch_id=n) for n, d in subs.items()}
    ).collect()
    got = {(r["name_a"], r["name_b"]): r for r in mats}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (na, nb), r in got.items():
        ea = subs[na].select("o_custkey").distinct()
        eb = subs[nb].select("o_custkey").distinct()
        assert round(r["n_a"]) == ea.count()
        assert round(r["n_b"]) == eb.count()
        assert round(r["n_intersection"]) == ea.intersect(eb).count()


def test_theta_overlap_matrix_needs_two(spark, orders):
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap_matrix,
        theta_summary,
    )

    with pytest.raises(ValueError):
        theta_overlap_matrix({"a": theta_summary(orders, ["o_custkey"])})


def test_merged_comoments_match_single_scan_corr(spark, lineitem_or_orders=None):
    """3-batch co-moment merge reproduces F.corr over the whole table
    (power sums are exactly mergeable; tolerance only for float
    summation order)."""
    from sparvi_core_spark.profiler.incremental import (
        merge_comoments,
        partition_comoments,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    batches = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    parts = partition_comoments(batches[0], cols, batch_id="b0")
    for i, b in enumerate(batches[1:], 1):
        parts = parts.unionByName(
            partition_comoments(b, cols, batch_id=f"b{i}")
        )
    got = {
        (r["col_x"], r["col_y"]): r for r in merge_comoments(parts).collect()
    }
    assert len(got) == 3  # C(3,2) unordered pairs
    for (x, y), r in got.items():
        want = li.agg(F.corr(x, y)).first()[0]
        assert r["corr"] == pytest.approx(want, rel=1e-9), (x, y)
        assert r["n"] == li.count()


def test_comoments_pairwise_null_deletion(spark):
    from sparvi_core_spark.profiler.incremental import (
        merge_comoments,
        partition_comoments,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, None), (4.0, 8.0)],
        "x double, y double",
    )
    r = merge_comoments(partition_comoments(df, ["x", "y"])).first()
    assert r["n"] == 3  # rows where both present
    assert r["corr"] == pytest.approx(1.0)


def test_comoments_require_two_columns(spark):
    from sparvi_core_spark.profiler.incremental import partition_comoments

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        partition_comoments(df, ["x"])
