"""Salted aggregation/join correctness: results must equal unsalted plans."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" holds 90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(skewed):
    plain = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"], r["a"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("a"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["count_v"], r["sum_v"], r["min_v"], r["max_v"], r["avg_v"])
        for r in salted_agg(
            skewed,
            ["k"],
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max"), ("v", "avg")],
            salt_buckets=16,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        for i in range(5):
            assert abs(plain[k][i] - salted[k][i]) < 1e-9, (k, i)


def test_salted_agg_rejects_unknown_fn(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], [("v", "median")])


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(50)],
        "k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy("label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_rejects_outer(spark):
    """Right/full outer would emit unmatched right rows salt_buckets
    times — must raise instead of returning silently wrong results."""
    import pytest

    from sparvi_core_spark.operators.skew import salted_join

    l = spark.createDataFrame([(1, "x")], "k long, v string")
    r = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(l, r, "k", how=how)
    # left join still fine
    assert salted_join(l, r, "k", how="left").count() == 1


def test_skew_report_flags_hot_key(spark):
    from sparvi_core_spark.operators.skew import skew_report

    # one key owns half the rows
    hot = spark.range(5000).select(F.lit("megauser").alias("user_id"))
    tail = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id")
    )
    rep = skew_report(hot.unionByName(tail), "user_id", partitions=32)
    assert rep["total_rows"] == 10000
    assert rep["hot_keys"][0][0] == "megauser"
    assert rep["hot_keys"][0][1] == 5000
    assert rep["top_share"] == 0.5
    # ideal load = 10000/32 = 312.5 → factor = 16
    assert rep["skew_factor"] == 16.0
    assert rep["recommended_salt_buckets"] == 16
    assert rep["top_key_certified"] is True


def test_skew_report_uniform_keys_recommend_nothing(spark):
    from sparvi_core_spark.operators.skew import skew_report

    df = spark.range(6400).select(
        (F.col("id") % 3200).cast("string").alias("k")
    )
    rep = skew_report(df, "k", partitions=32)
    # every key has 2 rows; ideal = 200 → factor ≪ 1
    assert rep["skew_factor"] < 1
    assert rep["recommended_salt_buckets"] == 0
