"""Bigram LM perplexity: hand-checked probabilities, edge cases, and
the broadcast-model plan pin. DuckDB value parity lives in
tests/test_oracle_parity.py::test_local_perplexity_parity."""

from __future__ import annotations

import math

import pytest

from sparvi_core_spark.functions.lm import (
    BOS,
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(1, "a b a b"), (2, "a b"), (3, "")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_checked_probabilities(spark, tiny):
    lm = train_bigram_lm(tiny)
    counts = {(r["w1"], r["w2"]): r["n"] for r in lm.counts.collect()}
    # corpus bigrams: doc1 (<s>,a)(a,b)(b,a)(b,b→no) → (<s>,a),(a,b),(b,a),(a,b)? doc1 "a b a b":
    # ctx  = [<s>, a, b, a], words = [a, b, a, b]
    assert counts == {
        (BOS, "a"): 2,
        ("a", "b"): 3,
        ("b", "a"): 1,
    }
    ctx = {r["w1"]: r["c_total"] for r in lm.contexts.collect()}
    assert ctx == {BOS: 2, "a": 3, "b": 1}
    assert lm.vocab.first()["v"] == 3  # {<s>, a, b}

    scored = {r["doc_id"]: r for r in score_perplexity(tiny, lm, add_k=0.5).collect()}
    # doc2 "a b": p(a|<s>) = (2+.5)/(2+.5*3), p(b|a) = (3+.5)/(3+.5*3)
    p1, p2 = 2.5 / 3.5, 3.5 / 4.5
    nll = -(math.log(p1) + math.log(p2)) / 2
    assert scored[2]["n_bigrams"] == 2
    assert scored[2]["avg_neg_logp"] == pytest.approx(nll, abs=1e-6)
    assert scored[2]["perplexity"] == pytest.approx(math.exp(nll), abs=1e-4)
    # empty doc has no bigrams → not scored
    assert 3 not in scored


def test_unseen_pairs_and_disjoint_corpus(spark, tiny):
    lm = train_bigram_lm(tiny)
    other = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    r = score_perplexity(other, lm, add_k=0.5).first()
    # (<s>, z): context <s> IS trained (c_total=2) → p = 0.5/(2+1.5);
    # (z, q): wholly unseen context → p = k/(k·V) = 1/3
    assert r["n_bigrams"] == 2
    nll = -(math.log(0.5 / 3.5) + math.log(1 / 3)) / 2
    assert r["avg_neg_logp"] == pytest.approx(nll, abs=1e-6)


def test_min_count_prunes_pairs_not_contexts(spark, tiny):
    lm = train_bigram_lm(tiny, min_count=2)
    pairs = {(r["w1"], r["w2"]) for r in lm.counts.collect()}
    assert ("b", "a") not in pairs and ("a", "b") in pairs
    # context totals keep the pre-prune mass (probabilities stay ≤ 1)
    ctx = {r["w1"]: r["c_total"] for r in lm.contexts.collect()}
    assert ctx["b"] == 1


def test_broadcast_model_plan(spark, tiny):
    lm = train_bigram_lm(tiny)
    plan = (
        score_perplexity(tiny, lm, broadcast_model=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # corpus side never shuffles for the model joins
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_perplexity_filter_bands(spark, tiny):
    lm = train_bigram_lm(tiny)
    scored = {r["doc_id"]: r["perplexity"] for r in score_perplexity(tiny, lm).collect()}
    cut = (min(scored.values()) + max(scored.values())) / 2
    kept = perplexity_filter(tiny, lm, max_perplexity=cut)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {d for d, p in scored.items() if p <= cut}
    # schema: input columns + perplexity
    assert kept.columns == ["doc_id", "text", "perplexity"]


def test_add_k_validation(spark, tiny):
    lm = train_bigram_lm(tiny)
    with pytest.raises(ValueError):
        score_perplexity(tiny, lm, add_k=0.0)


def test_perplexity_buckets_thirds_and_modes(spark, views):
    """CCNet split: per-language buckets are ~thirds (exact mode makes
    the boundary deterministic); approx mode lands within sketch
    error; guards fire on bad cutoffs."""
    import pytest
    from pyspark.sql import functions as F

    from sparvi_core_spark.functions.lm import (
        perplexity_buckets,
        train_bigram_lm,
    )

    docs = spark.table("documents")
    lm = train_bigram_lm(docs)
    out = perplexity_buckets(docs, lm, by="lang", exact=True)
    pdf = out.groupBy("lang", "bucket").count().collect()
    per_lang = {}
    for r in pdf:
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r["count"]
    for lang, b in per_lang.items():
        n = sum(b.values())
        assert set(b) == {"head", "middle", "tail"}, (lang, b)
        # exact terciles: head is >= 1/3 (ties at the boundary fall
        # INTO head via <=), tail <= 1/3 + slack
        assert b["head"] >= n // 3, (lang, b)
        for k in b:
            assert abs(b[k] - n / 3) <= max(2, 0.15 * n), (lang, b)
    # every scored doc got a bucket
    assert out.filter(F.col("bucket").isNull()).count() == 0

    # corpus-wide (no by) + approx mode: same schema minus the group
    out2 = perplexity_buckets(docs, lm)
    assert out2.columns == ["doc_id", "n_bigrams", "perplexity", "bucket"]
    fr = out2.filter(F.col("bucket") == "head").count() / out2.count()
    assert 0.2 <= fr <= 0.5

    with pytest.raises(ValueError, match="cutoffs"):
        perplexity_buckets(docs, lm, cutoffs=(0.7, 0.3))
