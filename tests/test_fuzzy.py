"""Fuzzy (bounded edit-distance) matching: symmetric-delete blocking.

The DuckDB all-pairs `levenshtein` join is the exactness oracle: the
blocked Spark plan must return IDENTICAL pairs (no false positives —
verify step; no false negatives — the deletion-key completeness
property)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.fuzzy import (
    deletion_keys,
    fuzzy_join,
    fuzzy_self_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(pdf):
    return {
        (int(r.id_a), int(r.id_b), int(r.edit_distance))
        for r in pdf.itertuples()
    }


def test_deletion_keys_small(spark):
    row = (
        spark.range(1)
        .select(deletion_keys(F.lit("abc"), 1).alias("k"))
        .collect()[0]
    )
    assert set(row.k) == {"abc", "bc", "ac", "ab"}
    row2 = (
        spark.range(1)
        .select(deletion_keys(F.lit("ab"), 2).alias("k"))
        .collect()[0]
    )
    assert set(row2.k) == {"ab", "a", "b", ""}


def test_deletion_keys_empty_string(spark):
    row = (
        spark.range(1)
        .select(deletion_keys(F.lit(""), 2).alias("k"))
        .collect()[0]
    )
    assert row.k == [""]


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_match_allpairs_oracle(spark, d):
    """Blocked pairs == DuckDB all-pairs levenshtein join (exactness)."""
    df = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name")
        .limit(120)
    )
    got = _pairs_set(
        fuzzy_self_pairs(
            df, id_col="c_custkey", text_col="c_name", max_edits=d
        ).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW c AS SELECT * FROM '{SF_DIR}/customer.parquet' "
        "ORDER BY c_custkey LIMIT 120"
    )
    want = {
        (a, b, e)
        for a, b, e in con.execute(
            "SELECT x.c_custkey, y.c_custkey, "
            "levenshtein(x.c_name, y.c_name) FROM c x JOIN c y "
            "ON x.c_custkey < y.c_custkey "
            f"WHERE levenshtein(x.c_name, y.c_name) <= {d}"
        ).fetchall()
    }
    assert got == want
    assert len(want) > 0  # fixture actually exercises the operator


def test_self_pairs_insertion_and_substitution(spark):
    df = spark.createDataFrame(
        [
            (1, "spark"),
            (2, "spa rk"),   # insertion, d=1
            (3, "stark"),    # substitution, d=1
            (4, "sprk"),     # deletion, d=1
            (5, "flink"),    # unrelated
            (6, ""),         # empty vs empty edge
            (7, ""),
        ],
        ["doc_id", "text"],
    )
    got = _pairs_set(fuzzy_self_pairs(df, max_edits=1).toPandas())
    assert (1, 2, 1) in got
    assert (1, 3, 1) in got
    assert (1, 4, 1) in got
    assert (6, 7, 0) in got
    assert not any(5 in (a, b) for a, b, _ in got)


def test_two_edit_pairs(spark):
    df = spark.createDataFrame(
        [(1, "tokenizer"), (2, "tokeniser"), (3, "tokenzier"), (4, "toknzr")],
        ["doc_id", "text"],
    )
    got1 = _pairs_set(fuzzy_self_pairs(df, max_edits=1).toPandas())
    got2 = _pairs_set(fuzzy_self_pairs(df, max_edits=2).toPandas())
    assert (1, 2, 1) in got1
    assert (1, 3, 2) in got2 and (1, 3, 2) not in {p for p in got1}
    assert got1 <= got2


def test_long_strategy_error_raises(spark):
    df = spark.createDataFrame([(1, "x" * 100)], ["doc_id", "text"])
    with pytest.raises(Exception, match="max_len"):
        fuzzy_self_pairs(df, max_edits=1, max_len=64).toPandas()


def test_long_strategy_truncate_runs(spark):
    long_a = "y" * 100
    long_b = "y" * 99 + "z"
    df = spark.createDataFrame(
        [(1, long_a), (2, long_b)], ["doc_id", "text"]
    )
    got = _pairs_set(
        fuzzy_self_pairs(
            df, max_edits=1, max_len=64, long_strategy="truncate"
        ).toPandas()
    )
    assert (1, 2, 1) in got  # prefixes identical → blocked together


def test_max_bucket_caps_hot_key(spark):
    # 50 identical strings → one hot variant bucket; cap removes them
    rows = [(i, "dup") for i in range(50)] + [(100, "abc"), (101, "abd")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = _pairs_set(
        fuzzy_self_pairs(df, max_edits=1, max_bucket=10).toPandas()
    )
    assert (100, 101, 1) in capped
    assert not any(a < 50 and b < 50 for a, b, _ in capped)


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "initech")], ["id", "name"]
    )
    out = fuzzy_join(
        left, right, "id", "name", "id", "name", max_edits=1
    ).toPandas()
    assert set(out.columns) == {
        "id_l", "id_r", "name_l", "name_r", "edit_distance"
    }
    assert [(r.id_l, r.id_r, r.edit_distance) for r in out.itertuples()] == [
        (1, 10, 1)
    ]


def test_plan_is_equi_join_not_cartesian(spark):
    df = spark.createDataFrame([(1, "aa"), (2, "ab")], ["doc_id", "text"])
    plan = fuzzy_self_pairs(df, max_edits=1)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
