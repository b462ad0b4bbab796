"""Partitioned & bucketed sinks: pruning and shuffle-free co-located joins."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.plans import explain_str, pushed_filters
from sparvi_core_spark.sources.writers import write_bucketed, write_partitioned


def test_partitioned_write_prunes(spark, views, tmp_path):
    path = str(tmp_path / "orders_by_status")
    write_partitioned(views["orders"], path, ["o_orderstatus"])
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(df)
    # partition filter shows up as PartitionFilters, not a row filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert df.count() == views["orders"].filter("o_orderstatus = 'F'").count()


def test_bucketed_join_has_no_shuffle(spark, views):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(views["orders"], "b_orders", "o_custkey", 8)
    write_bucketed(views["customer"], "b_customer", "c_custkey", 8)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_training_shards_layout_and_determinism(spark, tmp_path):
    """write_training_shards: exactly one file per shard directory,
    shard membership and within-shard order identical across re-exports
    and input repartitionings."""
    import glob
    import os

    from sparvi_core_spark.sources.writers import write_training_shards

    df = spark.range(500).selectExpr(
        "id AS doc_id", "concat('text ', CAST(id AS STRING)) AS text"
    )
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_training_shards(df, p1, n_shards=8)
    write_training_shards(df.repartition(13), p2, n_shards=8)

    for p in (p1, p2):
        dirs = sorted(os.path.basename(d) for d in glob.glob(f"{p}/shard=*"))
        assert dirs == [f"shard={k}" for k in range(8)]
        for d in glob.glob(f"{p}/shard=*"):
            assert len(glob.glob(f"{d}/part-*.parquet")) == 1

    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    assert r1.count() == 500
    m1 = {r["shard"]: set() for r in r1.select("shard").distinct().collect()}
    for r in r1.collect():
        m1[r["shard"]].add(r["doc_id"])
    m2 = {k: set() for k in m1}
    for r in r2.collect():
        m2[r["shard"]].add(r["doc_id"])
    assert m1 == m2

    # within-shard row order identical across the two exports (read the
    # single part file directly: parquet preserves write order)
    import pyarrow.parquet as pq

    for k in range(8):
        f1 = glob.glob(f"{p1}/shard={k}/part-*.parquet")[0]
        f2 = glob.glob(f"{p2}/shard={k}/part-*.parquet")[0]
        ids1 = pq.read_table(f1, columns=["doc_id"])["doc_id"].to_pylist()
        ids2 = pq.read_table(f2, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids1 == ids2 and len(ids1) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, str(tmp_path / "bad"), n_shards=0)
