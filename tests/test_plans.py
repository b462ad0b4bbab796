"""Plan-shape regression tests: the physical plans we rely on at scale.

If any of these fail after a refactor, the operator still returns the
right rows but has lost its 100 TB story — treat as a bug.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sparvi_core_spark.plans import (
    has_broadcast_hash_join,
    has_broadcast_nested_loop_join,
    has_join,
    pushed_filters,
    scan_columns,
)

SF = "/root/testdata/sf0.001"


def test_pricing_summary_pushdown_and_pruning(spark):
    df = entrymod.q_pricing_summary(spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf}"
    cols = scan_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        f"column pruning lost: {cols}"
    )


def test_numeric_summary_reads_only_measures(spark):
    df = entrymod.q_numeric_summary(spark, SF)
    assert scan_columns(df) == {"l_quantity", "l_extendedprice", "l_discount"}


def test_embedding_topk_broadcasts_queries(spark):
    df = entrymod.q_embedding_topk(spark, SF)
    assert has_broadcast_nested_loop_join(df)
    pf = " ".join(pushed_filters(df))
    assert "vec_id" in pf, "query-side filter should reach the scan"


def test_region_revenue_broadcasts_dims(spark):
    df = entrymod.q_region_revenue(spark, SF)
    assert has_broadcast_hash_join(df), "dim joins must be broadcast, not sort-merge"


def test_asof_join_has_no_join_node(spark):
    left = spark.createDataFrame([(1, "2024-01-01 00:00:01", "x")],
                                 "user_id long, ts string, pid string").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame([(1, "2024-01-01 00:00:00", "y")],
                                  "user_id long, ts string, cid string").withColumn("ts", F.col("ts").cast("timestamp"))
    from sparvi_core_spark.operators.timeseries import asof_join

    assert not has_join(asof_join(left, right, key="user_id"))


def test_validation_rule_filter_pushdown(spark, views):
    df = spark.sql("SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0")
    pf = " ".join(pushed_filters(df))
    assert "l_quantity" in pf
    assert scan_columns(df) <= {"l_quantity"}


def test_profiler_scan_prunes_to_numeric_for_outliers(spark, views):
    # the outlier stack pass must only read numeric columns
    from sparvi_core_spark.coltypes import bucket_columns
    from sparvi_core_spark.profiler.engine import _stack_pairs

    df = views["lineitem"]
    b = bucket_columns(df.schema)
    pairs = _stack_pairs(df, b.numeric, "double")
    assert scan_columns(pairs) == set(b.numeric)


def test_shipping_priority_plan(spark):
    df = entrymod.q_shipping_priority(spark, SF)
    assert has_broadcast_hash_join(df)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "o_orderdate" in pf and "c_mktsegment" in pf


def test_forecast_revenue_fully_pushed(spark):
    df = entrymod.q_forecast_revenue(spark, SF)
    pf = " ".join(pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pf, f"{c} not pushed: {pf}"
    assert scan_columns(df) == {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice",
    }


def test_mix_corpora_bucketed_broadcasts_control_frames(spark):
    """The two-phase mixture plan must broadcast the (tiny) budget and
    cutoff frames — a shuffle join against them would defeat the point."""
    from sparvi_core_spark.operators.mixing import mix_corpora

    df = spark.range(1000).selectExpr(
        "id AS doc_id",
        "concat('d', CAST(id % 3 AS STRING)) AS domain",
        "100 + id % 50 AS n_tokens",
    )
    out = mix_corpora(df, {"d0": 0.5, "d1": 0.5}, 20_000, n_buckets=16)
    assert has_broadcast_hash_join(out)


def test_novelty_screen_no_reference_self_join(spark):
    """novelty_screen joins new x reference band hashes; the bucket-cap
    anti-joins must be broadcast (the cap frame is tiny by construction)."""
    df = entrymod.q_novelty_screen(spark, SF)
    assert has_broadcast_hash_join(df)


def test_fan_out_compact_gates_on_parallelism(spark):
    from sparvi_core_spark.plans.fanout import fan_out_compact

    par = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame([(i,) for i in range(10)], "x int").coalesce(1)
    assert fan_out_compact(small).rdd.getNumPartitions() == par

    wide = spark.range(1000).repartition(par + 4)
    # already at/above parallelism: returned unchanged, no extra shuffle
    assert fan_out_compact(wide) is wide


def test_fan_out_compact_estimates_without_rdd(spark, monkeypatch):
    """File-backed frames get their partition floor from the leaf
    files (Spark's bin-packing formula) — .rdd is never consulted, so
    AQE can't be tricked into executing upstream stages."""
    from pyspark.sql import DataFrame

    from sparvi_core_spark.plans import fanout

    def _boom(self):
        raise AssertionError(".rdd consulted for a file-backed frame")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = fanout.fan_out_compact(docs)
    monkeypatch.undo()
    # compact input at sf0.01: fanned out to defaultParallelism
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_fan_out_compact_passes_through_exchange_plans(spark, monkeypatch):
    """A frame with an upstream join/aggregate and no stat-able files
    passes through untouched instead of probing .rdd (which could run
    its query stages under AQE)."""
    from pyspark.sql import DataFrame, functions as F

    from sparvi_core_spark.plans import fanout

    left = spark.createDataFrame([(i, i % 3) for i in range(30)], "id int, k int")
    right = spark.createDataFrame([(0, "a"), (1, "b")], "k int, v string")
    joined = left.join(right, "k").groupBy("v").agg(F.count("*").alias("n"))

    def _boom(self):
        raise AssertionError(".rdd consulted for an exchange plan")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    assert fanout.fan_out_compact(joined) is joined
    monkeypatch.undo()


def test_scan_partition_estimate_matches_regime(spark):
    """The file-size estimate lands in the right regime on both sides
    of the gate: compact single-file inputs estimate far below
    defaultParallelism; the estimate grows linearly with bytes."""
    from sparvi_core_spark.plans.fanout import _estimated_scan_partitions

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    est = _estimated_scan_partitions(docs)
    assert est is not None
    assert 1 <= est < spark.sparkContext.defaultParallelism

    # in-memory frame: no input files -> None (caller falls back)
    mem = spark.createDataFrame([(1,)], "x int")
    assert _estimated_scan_partitions(mem) is None


def test_fan_out_compact_passes_through_exchanged_file_frames(spark, monkeypatch):
    """A frame with upstream joins/aggregates over LOCAL FILES is
    partitioned by its exchanges, not its leaf scans — the file-based
    estimate must not be consulted (it would misread the frame and
    inject a redundant repartition). Exchanged frames pass through
    untouched whatever their inputs."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.plans import fanout

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    agged = docs.groupBy("lang").agg(F.count("*").alias("n"))

    def _boom(df):
        raise AssertionError("file estimate consulted for an exchange plan")

    monkeypatch.setattr(fanout, "_estimated_scan_partitions", _boom)
    assert fanout.fan_out_compact(agged) is agged
    monkeypatch.undo()
