"""Incremental dedup (novelty_filter): new batch vs existing corpus."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.dedup import minhash_signatures, novelty_filter


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
        (3, "spark catalyst optimizer rewrites logical plans into physical plans"),
    ]
    reference = spark.createDataFrame(base, "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            # exact copy of ref 1 → matched at 1.0
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # near copy of ref 2 (one word changed) → matched
            (102, "one two three four five six seven eight nine ten twelve"),
            # genuinely new
            (103, "completely novel content about distributed shuffle services"),
            # too short to shingle → novel by contract
            (104, "hi"),
        ],
        "doc_id long, text string",
    )
    return reference, batch


def test_novelty_filter_basic(spark, corpus_and_batch):
    reference, batch = corpus_and_batch
    novel, matches = novelty_filter(batch, reference, threshold=0.5)
    novel_ids = {r["doc_id"] for r in novel.collect()}
    assert novel_ids == {103, 104}
    m = {(r["new_id"], r["ref_id"]): r["est_jaccard"] for r in matches.collect()}
    assert m[(101, 1)] == 1.0
    assert (102, 2) in m
    assert all(j >= 0.5 for j in m.values())
    assert novel.columns == batch.columns


def test_novelty_filter_precomputed_signatures(spark, corpus_and_batch):
    """The incremental contract: stored reference signatures give the
    same answer as re-reading the reference text."""
    reference, batch = corpus_and_batch
    sig_ref = minhash_signatures(reference)
    novel_a, _ = novelty_filter(batch, reference, threshold=0.5)
    novel_b, _ = novelty_filter(
        batch, reference_signatures=sig_ref, threshold=0.5
    )
    assert {r["doc_id"] for r in novel_a.collect()} == {
        r["doc_id"] for r in novel_b.collect()
    }
    with pytest.raises(ValueError, match="reference"):
        novelty_filter(batch)


def test_novelty_filter_no_reference_self_pairs(spark, corpus_and_batch):
    """Two identical docs WITHIN the new batch must both survive when
    neither matches the reference — the screen is new-vs-ref only."""
    reference, _ = corpus_and_batch
    batch = spark.createDataFrame(
        [
            (201, "entirely fresh text about columnar execution engines today"),
            (202, "entirely fresh text about columnar execution engines today"),
        ],
        "doc_id long, text string",
    )
    novel, matches = novelty_filter(batch, reference, threshold=0.5)
    assert {r["doc_id"] for r in novel.collect()} == {201, 202}
    assert matches.count() == 0


def test_novelty_filter_bucket_cap(spark):
    """A reference flooded with identical boilerplate collapses into one
    band bucket; the cap drops that bucket instead of joining the new
    batch against every copy."""
    boiler = "click here to unsubscribe from this mailing list right now"
    reference = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    batch = spark.createDataFrame(
        [(9001, boiler), (9002, "some actually new material worth keeping here")],
        "doc_id long, text string",
    )
    novel, matches = novelty_filter(batch, reference, threshold=0.5, max_bucket=100)
    # the boilerplate bucket was dropped: no candidate explosion...
    assert matches.count() == 0
    # ...and the caller sees the trade-off: the boilerplate copy passes
    # (the cap trades recall on mass-duplicated boilerplate for a
    # bounded join)
    assert {r["doc_id"] for r in novel.collect()} == {9001, 9002}
    # uncapped: the match is found
    _, m2 = novelty_filter(batch, reference, threshold=0.5, max_bucket=10_000)
    assert m2.filter("new_id = 9001").count() == 500
    # exact_prescreen closes the capped-bucket blind spot without
    # uncapping: the exact copy is matched at 1.0, the new doc survives
    novel3, m3 = novelty_filter(
        batch, reference, threshold=0.5, max_bucket=100, exact_prescreen=True
    )
    assert {r["doc_id"] for r in novel3.collect()} == {9002}
    assert m3.filter("new_id = 9001 AND est_jaccard = 1.0").count() == 500


def test_exact_prescreen_catches_short_docs(spark):
    """Docs too short to shingle are invisible to MinHash; the exact
    tier still matches their verbatim copies."""
    reference = spark.createDataFrame(
        [(1, "hi"), (2, "some normal length reference document here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "hi"), (11, "ok")], "doc_id long, text string"
    )
    novel_off, _ = novelty_filter(batch, reference, threshold=0.5)
    assert {r["doc_id"] for r in novel_off.collect()} == {10, 11}
    novel_on, m = novelty_filter(
        batch, reference, threshold=0.5, exact_prescreen=True
    )
    assert {r["doc_id"] for r in novel_on.collect()} == {11}
    assert [(r["new_id"], r["ref_id"]) for r in m.collect()] == [(10, 1)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact_prescreen"):
        from sparvi_core_spark.operators.dedup import minhash_signatures

        novelty_filter(
            batch,
            reference_signatures=minhash_signatures(reference),
            exact_prescreen=True,
        )
