"""Distributed Bloom filter (`operators/membership.py`).

The sharp guarantee is pinned sharply: zero false negatives on every
inserted key, measured false-positive rate within 3× of the requested
fpp, and BIT-EXACT equality against a pure-Python twin fed Spark's own
base hashes (pins partition accumulation + double hashing + the OR
combine). Merge ≡ joint build byte-for-byte; probe plan is
exchange-free.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.membership import (
    bloom_build,
    bloom_novel,
    bloom_params,
    bloom_probe,
    merge_blooms,
)

M64 = 1 << 64


@pytest.fixture(scope="module")
def keys(spark):
    ref = spark.range(0, 2000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    other = spark.range(2000, 7000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    return ref, other


def test_no_false_negatives(spark, keys):
    ref, _ = keys
    model = bloom_build(ref, "key", expected_n=2000, fpp=0.01)
    assert model.n_inserted == 2000
    probed = bloom_probe(ref, model, "key")
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_near_requested(spark, keys):
    ref, other = keys
    model = bloom_build(ref, "key", expected_n=2000, fpp=0.01)
    fp = (
        bloom_probe(other, model, "key")
        .filter(F.col("maybe_member"))
        .count()
    )
    assert fp / 5000 < 0.03  # 3× headroom over the asked-for 1%


def test_bit_exact_python_twin(spark):
    """Rebuild the bitmap in pure Python from Spark's base hashes —
    byte-for-byte equality pins the whole kernel."""
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(97)], ["key"]
    )
    model = bloom_build(df, "key", expected_n=97, fpp=0.05)
    hashes = df.select(
        F.xxhash64("key").alias("h1"),
        F.xxhash64(F.lit("sparvi-bloom-h2"), F.col("key")).alias("h2"),
    ).collect()
    bits = bytearray(model.m // 8)
    for r in hashes:
        h1, h2 = r["h1"] % M64, r["h2"] % M64
        for i in range(model.k):
            pos = ((h1 + i * h2) % M64) % model.m
            bits[pos >> 3] |= 1 << (pos & 7)
    assert bytes(bits) == model.bits


def test_merge_equals_joint_build(spark, keys):
    ref, _ = keys
    joint = bloom_build(ref, "key", expected_n=2000)
    a = bloom_build(
        ref.filter(F.length("key") % 2 == 0), "key", expected_n=2000
    )
    b = bloom_build(
        ref.filter(F.length("key") % 2 == 1), "key", expected_n=2000
    )
    merged = merge_blooms(a, b)
    assert merged.bits == joint.bits
    assert merged.n_inserted == 2000
    with pytest.raises(ValueError, match="geometry"):
        merge_blooms(a, bloom_build(ref, "key", expected_n=500))


def test_params_and_validation():
    m, k = bloom_params(1_000_000, 0.01)
    assert m % 8 == 0
    assert 9.5 < m / 1_000_000 < 9.7  # ~9.59 bits/key at 1%
    assert k == 7
    with pytest.raises(ValueError, match="expected_n"):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError, match="fpp"):
        bloom_params(10, 1.5)


def test_null_keys_skipped_and_null_verdict(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], ["key"]
    )
    model = bloom_build(df, "key", expected_n=10)
    assert model.n_inserted == 2
    rows = {r["key"]: r["maybe_member"] for r in bloom_probe(df, model, "key").collect()}
    assert rows["a"] is True and rows["b"] is True
    assert rows[None] is None


def test_mixed_null_single_partition_no_false_negatives(spark):
    """Regression: NULL and non-NULL keys in the SAME Arrow batch.

    When the hash columns were gated behind F.when(not-null, hash), a
    mixed batch arrived in pandas as float64 (int64 + NaN coercion) and
    .astype(int64) dropped low bits of the 64-bit xxhash — wrong bit
    positions, false negatives on inserted keys. repartition(1) forces
    every row into one batch so the coercion path is actually exercised
    (the original null test passed only because local[N] split 3 rows
    across partitions)."""
    n = 500
    ref = spark.range(0, n).select(
        F.concat(F.lit("k-"), F.col("id")).alias("key")
    )
    model = bloom_build(ref, "key", expected_n=n, fpp=0.01)
    probe = (
        spark.range(0, n)
        .select(
            F.when(F.col("id") % 7 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("k-"), F.col("id")))
            .alias("key")
        )
        .repartition(1)
    )
    rows = bloom_probe(probe, model, "key").collect()
    assert any(r["key"] is None for r in rows)
    for r in rows:
        if r["key"] is None:
            assert r["maybe_member"] is None
        else:
            assert r["maybe_member"] is True, (
                f"false negative on inserted key {r['key']!r}"
            )


def test_multi_column_key(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], ["a", "b"]
    )
    model = bloom_build(df, ["a", "b"], expected_n=10)
    probe = spark.createDataFrame(
        [(1, "x"), (1, "y")], ["a", "b"]
    )
    rows = {
        (r["a"], r["b"]): r["maybe_member"]
        for r in bloom_probe(probe, model, ["a", "b"]).collect()
    }
    assert rows[(1, "x")] is True
    # (1, "y") was never inserted — false only modulo fpp, which at
    # this size is ~0; assert not-True defensively
    assert rows[(1, "y")] is False


def test_bloom_novel_screen(spark, keys):
    ref, other = keys
    model = bloom_build(ref, "key", expected_n=2000, fpp=0.01)
    mixed = ref.limit(500).unionByName(other)
    novel = bloom_novel(mixed, model, "key")
    got = {r["key"] for r in novel.collect()}
    seen = {r["key"] for r in ref.limit(500).collect()}
    assert not (got & seen)  # nothing known leaks through
    assert len(got) > 4800  # ≥ 5000 new minus ~fpp over-drop


def test_probe_plan_is_exchange_free(spark, keys):
    ref, _ = keys
    model = bloom_build(ref, "key", expected_n=2000)
    plan = (
        bloom_probe(ref, model, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_fill_ratio_gauges_saturation(spark, keys):
    ref, _ = keys
    right = bloom_build(ref, "key", expected_n=2000)
    tiny = bloom_build(ref, "key", expected_n=50)
    assert 0.0 < right.fill_ratio() < 0.6
    assert tiny.fill_ratio() > right.fill_ratio()


def test_bloom_probe_is_stream_compatible(spark, keys, tmp_path):
    """The probe is stateless map-only, so the same call works on a
    readStream frame — the streaming ingest novelty fast path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from sparvi_core_spark.streaming.profile_stream import (
        run_stream_to_memory,
    )

    ref, _ = keys
    model = bloom_build(ref, "key", expected_n=2000, fpp=0.01)
    d = tmp_path / "bloom_stream"
    d.mkdir()
    rows = [("doc-5",), ("doc-10",), ("brand-new-a",), ("brand-new-b",)]
    pq_.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["key"]), preserve_index=False
        ),
        str(d / "part-0.parquet"),
    )
    batch = spark.read.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = bloom_novel(stream, model, "key")
    assert out.isStreaming
    run_stream_to_memory(out, "bloom_novel_t", output_mode="append")
    got = {r["key"] for r in spark.table("bloom_novel_t").collect()}
    assert got == {"brand-new-a", "brand-new-b"}
