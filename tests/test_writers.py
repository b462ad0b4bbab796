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
