"""Streaming top-k: merged Misra-Gries summaries must bracket the
exact counts within the published error bound, certify the top-k SET
on skewed data, and honestly refuse to certify near-uniform data."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.streaming.topk_stream import (
    topk_from_store,
    topk_stream_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def _stream_tokens(spark, df, tmp_path, name, capacity=512, files=3):
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src = str(tmp_path / f"src_{name}")
    df.repartition(files).write.parquet(src)
    store = str(tmp_path / f"store_{name}")
    stream = stream_events(
        spark, src, max_files_per_trigger=1 if files > 1 else None
    )
    q = topk_stream_batches(
        stream, "term", store, capacity=capacity,
        checkpoint=str(tmp_path / f"ckpt_{name}"),
    )
    q.awaitTermination()
    return store


@pytest.fixture(scope="module")
def tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")


def test_streamed_bounds_are_sound_on_real_tokens(spark, tokens, tmp_path):
    """Interval soundness on the real (near-uniform-ish) token corpus:
    every true count inside [lb, ub], totals exact. This corpus's
    counts cluster within a few of each other, so certification is
    NOT asserted here — that honesty is itself pinned in
    test_uniform_data_refuses_certification."""
    store = _stream_tokens(spark, tokens, tmp_path, "real")
    res = topk_from_store(spark, store, k=10)

    exact = {
        r["term"]: r["n"]
        for r in tokens.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res.total_rows == sum(exact.values())
    for v, lb, ub in res.topk:
        assert lb <= exact[v] <= ub, (v, lb, exact[v], ub)


def test_streamed_topk_certifies_skewed_data(spark, tmp_path):
    """Zipf-shaped stream: the top-k SET is certified and matches the
    exact groupBy top-k."""
    # value i appears ~3000/i times, i = 1..50: clear rank separation
    df = (
        spark.range(1, 51)
        .select(
            F.col("id"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(3000) / F.col("id")).cast("int"))
            ).alias("rep"),
        )
        .select(F.concat(F.lit("v"), F.col("id")).alias("term"))
    )
    store = _stream_tokens(spark, df, tmp_path, "zipf", capacity=256, files=3)
    res = topk_from_store(spark, store, k=5)

    exact = {
        r["term"]: r["n"]
        for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exact_top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:5]
    assert res.set_certified
    assert {v for v, _, _ in res.topk} == {v for v, _ in exact_top}
    for v, lb, ub in res.topk:
        assert lb <= exact[v] <= ub


def test_batch_range_restriction_counts_only_those_batches(spark, tokens, tmp_path):
    store = _stream_tokens(spark, tokens, tmp_path, "range", files=4)
    ids = sorted(
        r["batch_id"]
        for r in spark.read.parquet(store).select("batch_id").distinct().collect()
    )
    assert len(ids) == 4
    part = topk_from_store(spark, store, k=5, max_batch_id=ids[1])
    full = topk_from_store(spark, store, k=5)
    assert 0 < part.total_rows < full.total_rows


def test_uniform_data_refuses_certification(spark, tmp_path):
    # 5k distinct values, one occurrence each, tiny capacity: no top-k
    # is provable and the result must say so
    df = spark.range(5000).select(F.col("id").cast("string").alias("term"))
    store = _stream_tokens(spark, df, tmp_path, "uniform", capacity=64, files=2)
    res = topk_from_store(spark, store, k=5)
    assert not res.set_certified
    assert res.error_bound > 0


def test_mixed_capacity_store_rejected(spark, tokens, tmp_path):
    sub = tokens.limit(500)
    store = _stream_tokens(spark, sub, tmp_path, "cap_a", capacity=64, files=1)
    # second run with a different capacity appends to the same store
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src2 = str(tmp_path / "src_cap_b")
    sub.write.parquet(src2)
    q = topk_stream_batches(
        stream_events(spark, src2), "term", store, capacity=128,
        checkpoint=str(tmp_path / "ckpt_cap_b"),
    )
    q.awaitTermination()
    with pytest.raises(ValueError, match="mixes capacities"):
        topk_from_store(spark, store, k=5)


def test_empty_store_range(spark, tokens, tmp_path):
    store = _stream_tokens(spark, tokens.limit(100), tmp_path, "empty", files=1)
    res = topk_from_store(spark, store, k=5, min_batch_id=99)
    assert res.topk == [] and res.total_rows == 0 and res.set_certified


def test_grouped_streamed_topk(spark, tmp_path):
    """Per-group streaming top-k: skewed values per group, grouped
    report matches the exact per-group top-k and brackets counts."""
    from sparvi_core_spark.streaming.profile_stream import stream_events
    from sparvi_core_spark.streaming.topk_stream import (
        grouped_topk_from_store,
        grouped_topk_stream_batches,
    )

    df = (
        spark.range(1, 21)
        .select(
            F.col("id"),
            F.explode(F.array(F.lit("en"), F.lit("de"))).alias("lang"),
        )
        .select(
            "lang",
            F.col("id"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(800) / F.col("id")).cast("int"))
            ).alias("rep"),
        )
        .select("lang", F.concat(F.col("lang"), F.lit("_v"), F.col("id")).alias("term"))
    )
    src = str(tmp_path / "gsrc")
    df.repartition(3).write.parquet(src)
    store = str(tmp_path / "gstore")
    q = grouped_topk_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        "lang", "term", store, capacity=128,
        checkpoint=str(tmp_path / "gckpt"),
    )
    q.awaitTermination()
    res = grouped_topk_from_store(spark, store, k=3)
    assert set(res) == {"en", "de"}

    exact = {
        (r["lang"], r["term"]): r["n"]
        for r in df.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for g, r in res.items():
        assert r.set_certified, g
        want = sorted(
            ((t, n) for (gg, t), n in exact.items() if gg == g),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert {v for v, _, _ in r.topk} == {v for v, _ in want}
        for v, lb, ub in r.topk:
            assert lb <= exact[(g, v)] <= ub
