"""Corpus-preparation pipeline: attrition accounting and survivor rules."""

from pyspark.sql import functions as F

from sparvi_core_spark.operators.pipeline import prepare_corpus


def test_prepare_corpus_on_driver_docs(spark, views):
    clean, report = prepare_corpus(
        views["documents"], min_quality=0.2, dedup_threshold=0.5
    )
    assert report["input_docs"] == 500
    assert (
        report["output_docs"]
        == report["input_docs"]
        - report["low_quality_dropped"]
        - report["near_dup_dropped"]
    )
    assert report["near_dup_dropped"] > 0, "planted near-dups must be removed"
    assert "quality_score" in clean.columns
    assert clean.count() == report["output_docs"]


def test_prepare_corpus_antijoin_broadcast_is_size_gated(spark):
    """The survivor anti-join broadcast must be size-gated, never
    unconditional: losers can be a corpus-sized fraction of all docs,
    and a forced hint overrides every size check — the 100 TB OOM.
    Above the byte gate (simulated with broadcast_losers_max_bytes=0)
    and with autoBroadcast disabled, the plan must be a shuffle join;
    under the gate the measured-small losers frame is legitimately
    hinted."""
    from sparvi_core_spark.plans import (
        has_broadcast_hash_join,
        has_broadcast_nested_loop_join,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [(i, base) for i in range(6)] + [
        (99, "totally different words in this document " * 3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # "large" losers: gate at 0 rows -> no hint allowed anywhere
        clean, report = prepare_corpus(
            df, min_quality=0.0, dedup_threshold=0.8, broadcast_losers_max_bytes=0
        )
        assert not has_broadcast_hash_join(clean)
        assert not has_broadcast_nested_loop_join(clean)
        assert report["near_dup_dropped"] == 5
        # measured-small losers: the gate applies the hint even with
        # auto-broadcast off (that is the point of measuring)
        clean2, _ = prepare_corpus(df, min_quality=0.0, dedup_threshold=0.8)
        assert has_broadcast_hash_join(clean2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_prepare_corpus_cache_released_by_default(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean, report = prepare_corpus(df, min_quality=0.0)
    assert "cache" not in report
    # keep_cache=True returns the handle for targeted unpersist
    clean2, report2 = prepare_corpus(df, min_quality=0.0, keep_cache=True)
    assert report2["cache"] is not None
    assert report2["cache"].storageLevel.useMemory
    report2["cache"].unpersist()


def test_prepare_corpus_survivor_is_min_id(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [(10, base), (3, base), (99, "totally different words in this document " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean, report = prepare_corpus(df, min_quality=0.0, dedup_threshold=0.8)
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids == {3, 99}, "min-id survivor keeps 3, drops 10"
    assert report["near_dup_dropped"] == 1


def test_prepare_corpus_report_rides_caller_action(spark):
    """output_docs/near_dup_dropped resolve from the observe() metric
    filled by the caller's own action — and agree with it."""
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean, report = prepare_corpus(df, min_quality=0.0)
    n = clean.count()  # the caller's action fills the metric
    assert report.get("output_docs") == n  # .get() must resolve too
    assert report["output_docs"] == n
    assert report["near_dup_dropped"] == report["input_docs"] - report[
        "low_quality_dropped"
    ] - report["output_docs"]


def test_prepare_corpus_empty_and_all_filtered(spark):
    """Degenerate inputs must not crash: empty corpus, and a corpus
    where the quality filter drops everything."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    clean, report = prepare_corpus(empty, min_quality=0.0)
    assert report == {
        "input_docs": 0, "low_quality_dropped": 0, "near_dup_dropped": 0,
        "near_dup_clusters": 0, "output_docs": 0,
    }
    assert clean.count() == 0

    rows = [(1, "some words here for one document"), (2, "other words in another")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean2, report2 = prepare_corpus(df, min_quality=1.1)
    assert report2["output_docs"] == 0
    assert report2["low_quality_dropped"] == 2


def test_prepare_corpus_repetition_gate(spark):
    """Optional Gopher-style repetition thresholds extend the quality
    gate: a boilerplate doc (high top-gram char fraction) is dropped
    only when the threshold is set, and its attrition is counted in
    low_quality_dropped (combined gate, same stage)."""
    rows = [
        (1, "the cat sat on the mat and then the dog sat down too"),
        (2, "buy now buy now buy now buy now buy now buy now buy now"),
        (3, "line one\nline one\nline one\nline one\nsomething else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    clean_off, rep_off = prepare_corpus(df, min_quality=0.0)
    assert {r["doc_id"] for r in clean_off.select("doc_id").collect()} == {1, 2, 3}
    assert rep_off["low_quality_dropped"] == 0

    clean_on, rep_on = prepare_corpus(
        df, min_quality=0.0,
        max_dup_line_frac=0.3, max_top_gram_char_frac=0.2,
    )
    survivors = {r["doc_id"] for r in clean_on.select("doc_id").collect()}
    assert survivors == {1}  # 2: top-gram spam; 3: duplicate lines
    assert rep_on["input_docs"] == 3
    assert rep_on["low_quality_dropped"] == 2
    assert rep_on["output_docs"] == 1
