"""Training-shard export: deterministic membership, manifest fidelity,
hive read-back."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.sources.writers import (
    read_manifest,
    shard_assignment,
    write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from sparvi_core_spark.session import read_parquet_table

    return read_parquet_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )


def test_shard_membership_is_layout_invariant(spark, docs):
    a = {
        r["doc_id"]: r["shard"]
        for r in shard_assignment(docs, 8).select("doc_id", "shard").collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in shard_assignment(docs.repartition(13), 8)
        .select("doc_id", "shard")
        .collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # all shards populated


def test_write_and_read_back(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, n_shards=4, tokens_col="n_chars"
    )
    total = docs.count()
    assert manifest["n_shards"] == 4
    assert manifest["rows"] == total
    assert manifest["tokens"] == docs.agg(F.sum("n_chars")).first()[0]
    assert sum(s["rows"] for s in manifest["shards"]) == total
    # shards are balanced within hash tolerance (no empty, no megashard)
    rows = [s["rows"] for s in manifest["shards"]]
    assert min(rows) > 0 and max(rows) < 2 * total / 4

    # hive read-back restores the corpus with the shard column
    back = spark.read.parquet(path)
    assert back.count() == total
    assert "shard" in back.columns
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) == set(
        range(4)
    )
    # a single shard reads standalone (the loader-worker path)
    one = spark.read.parquet(os.path.join(path, "shard=0"))
    assert one.count() == manifest["shards"][0]["rows"]

    # manifest round-trips from disk
    assert read_manifest(path) == manifest

    # membership matches the pure-function contract
    got = {
        r["doc_id"]: r["shard"]
        for r in back.select("doc_id", "shard").collect()
    }
    want = {
        r["doc_id"]: r["shard"]
        for r in shard_assignment(docs, 4).select("doc_id", "shard").collect()
    }
    assert got == want


def test_rows_per_shard_derivation(spark, docs, tmp_path):
    total = docs.count()
    path = str(tmp_path / "shards_rps")
    manifest = write_training_shards(docs, path, rows_per_shard=max(1, total // 3))
    assert manifest["n_shards"] in (3, 4)  # ceil division
    assert manifest["rows"] == total
    assert manifest["tokens"] is None


def test_shard_arg_validation(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(
            docs, str(tmp_path / "x"), n_shards=2, rows_per_shard=10
        )
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(docs, 0)


def test_manifest_null_tokens_and_hadoop_read(spark, tmp_path):
    """A shard whose tokens_col is all-NULL reports tokens=None in the
    manifest (unknown, not a crash); the total sums the KNOWN shards.
    The manifest also reads back through the Hadoop FS API path."""
    rows = [(i, None if i % 2 == 0 else 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, ntok int")
    # n_shards=1 makes the single shard's sum well-defined but mixed;
    # an all-NULL corpus exercises the None branch end-to-end
    path = str(tmp_path / "mixed")
    m = write_training_shards(df, path, n_shards=2, tokens_col="ntok")
    assert m["rows"] == 40
    assert m["tokens"] == sum(10 for i in range(40) if i % 2 == 1)

    allnull = spark.createDataFrame(
        [(i, None) for i in range(10)], "doc_id long, ntok int"
    )
    path2 = str(tmp_path / "allnull")
    m2 = write_training_shards(allnull, path2, n_shards=2, tokens_col="ntok")
    assert all(s["tokens"] is None for s in m2["shards"])
    assert m2["tokens"] == 0  # no shard has a known count
    assert m2["rows"] == 10

    # Hadoop-FS read path returns the identical manifest
    assert read_manifest(path2, spark=spark) == m2
    assert read_manifest(path2) == m2
