"""latest_by_key / merge_upsert vs DuckDB QUALIFY row_number oracle."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from sparvi_core_spark.operators.ingest import (
    dedup_latest_fetch,
    latest_by_key,
    merge_upsert,
)

SF_DIR = "/root/testdata/sf0.001"


def test_latest_by_key_matches_qualify_oracle(spark):
    """Latest event per user on real data == DuckDB row_number()=1."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = (
        latest_by_key(df, ["user_id"], "ts", tie_col="event_id")
        .select("user_id", "event_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"SELECT user_id, event_id FROM '{SF_DIR}/events.parquet' "
        "QUALIFY row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1 "
        "ORDER BY user_id"
    ).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_latest_by_key_preserves_schema_and_null_payload(spark):
    df = spark.createDataFrame(
        [("k", 1, None), ("k", 2, "new-null"), ("j", 5, "x")],
        ["key", "v", "payload"],
    )
    # make the winner's payload NULL: winner is v=3 with NULL payload
    df = df.union(
        spark.createDataFrame(
            [("k", 3, None)], "key string, v bigint, payload string"
        )
    )
    out = latest_by_key(df, ["key"], "v").toPandas().set_index("key")
    assert list(out.columns) == ["v", "payload"]  # original order kept
    assert out.loc["k", "v"] == 3
    assert out.loc["k", "payload"] is None or pd.isna(out.loc["k", "payload"])
    assert out.loc["j", "payload"] == "x"


def test_merge_upsert_with_tombstones(spark):
    cols = ["url", "version", "text", "deleted"]
    existing = spark.createDataFrame(
        [
            ("a", 1, "old-a", False),
            ("b", 1, "old-b", False),
            ("c", 1, "old-c", False),
        ],
        cols,
    )
    updates = spark.createDataFrame(
        [
            ("a", 2, "new-a", False),   # update wins
            ("b", 2, None, True),       # tombstone deletes b
            ("d", 1, "new-d", False),   # brand-new key
            ("c", 0, "stale-c", False), # stale update loses
        ],
        cols,
    )
    out = (
        merge_upsert(existing, updates, ["url"], "version",
                     delete_col="deleted")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["url", "version", "text"]
    assert out.values.tolist() == [
        ["a", 2, "new-a"],
        ["c", 1, "old-c"],
        ["d", 1, "new-d"],
    ]


def test_merge_upsert_is_join_free(spark):
    cols = ["url", "version", "text"]
    a = spark.createDataFrame([("a", 1, "x")], cols)
    b = spark.createDataFrame([("a", 2, "y")], cols)
    plan = (
        merge_upsert(a, b, ["url"], "version")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "partial_max_by" in plan.lower() or "partial" in plan.lower()


def test_dedup_latest_fetch(spark):
    df = spark.createDataFrame(
        [
            ("u1", 10, "v1"),
            ("u1", 20, "v2"),
            ("u2", 5, "w1"),
        ],
        ["url", "fetched_at", "text"],
    )
    out = dedup_latest_fetch(df).toPandas().sort_values("url")
    assert out["text"].tolist() == ["v2", "w1"]


def test_latest_by_key_requires_payload(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("k", 1)], ["key", "v"])
    with _pytest.raises(ValueError, match="non-key"):
        latest_by_key(df, ["key", "v"], "v")
    with _pytest.raises(ValueError, match="non-empty"):
        latest_by_key(df, [], "v")
