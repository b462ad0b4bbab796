"""Interpolated Kneser-Ney trigram LM: hand-checked count tables, the
exact Σp = 1 normalization property (the canonical KN-implementation
validator) across seen/backoff/unseen contexts, parity with an
independent dict-based reference implementation, scoring edge cases,
and the broadcast-model plan pin."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from sparvi_core_spark.functions.knlm import (
    BOS,
    KNTrigramLM,
    kn_prob_table,
    score_perplexity_kn,
    train_kn_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_checked_count_tables(spark, tiny):
    lm = train_kn_lm(tiny)
    tri = {(r.u, r.v, r.w): r.c3 for r in lm.tri.collect()}
    # doc1 trigrams: (<s>,<s>,the) (<s>,the,cat) (the,cat,sat)
    # (cat,sat,on) (sat,on,the) (on,the,mat)
    assert tri[(BOS, BOS, "the")] == 2
    assert tri[(BOS, BOS, "a")] == 1
    assert tri[("sat", "on", "the")] == 2
    assert tri[("on", "the", "mat")] == 1
    ctx = {(r.u, r.v): (r.ctx_total, r.followers) for r in lm.tri_ctx.collect()}
    # context (on, the) continues to mat and log
    assert ctx[("on", "the")] == (2, 2)
    assert ctx[(BOS, BOS)] == (3, 2)
    # continuation: N1+(.,the,cat) = distinct u before (the, cat) = 1
    mid = {(r.v, r.w): r.cont for r in lm.mid.collect()}
    assert mid[("the", "cat")] == 1
    # "the" follows (sat, on) and (<s>, <s>): N1+(., the) counts
    # distinct PRECEDING v — on→the and <s>→the → 2
    uni = {r.w: r.cont_w for r in lm.uni.collect()}
    assert uni["the"] == 2
    consts = lm.consts.first()
    assert consts["vocab_size"] == len(uni)
    assert 0.01 <= consts["d3"] <= 0.99


def _context_rows(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_distribution_sums_to_one(spark, tiny):
    """Σ_w p(w|u,v) over vocab ∪ {OOV} must be exactly 1 at every
    order — seen trigram context, bigram-only backoff, fully unseen
    context. This identity fails under almost any formula bug."""
    lm = train_kn_lm(tiny)
    vocab = [r.w for r in lm.uni.collect()]
    words = spark.createDataFrame(
        [(w,) for w in vocab] + [("zzz_oov_zzz",)], ["w"]
    )
    contexts = _context_rows(
        spark,
        [
            ("on", "the"),        # seen trigram context
            (BOS, BOS),           # BOS context
            ("zzz", "the"),       # unseen u, seen v → bigram backoff
            ("zzz", "qqq"),       # fully unseen → unigram backoff
            ("the", "cat"),       # seen, single follower
        ],
    )
    probs = kn_prob_table(lm, contexts, words).collect()
    sums = defaultdict(float)
    for r in probs:
        assert r.p > 0, f"zero/negative prob at {(r.u, r.v, r.w)}"
        sums[(r.u, r.v)] += r.p
    for ctx, s in sums.items():
        assert s == pytest.approx(1.0, abs=1e-9), f"Σp({ctx}) = {s}"


def _ref_tokens(text):
    """The exact search_tokens tokenizer, independently in Python."""
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _reference_kn(train_texts, score_tokens_list):
    """Independent dict-based interpolated-KN trigram implementation
    (same math, no Spark) → list of per-doc avg negative logp."""
    tri = Counter()
    for text in train_texts:
        toks = _ref_tokens(text)
        padded = [BOS, BOS] + toks
        for i in range(len(toks)):
            tri[(padded[i], padded[i + 1], padded[i + 2])] += 1
    tri_ctx_total, tri_followers = Counter(), Counter()
    mid = Counter()
    for (u, v, w), c in tri.items():
        tri_ctx_total[(u, v)] += c
        tri_followers[(u, v)] += 1
        mid[(v, w)] += 1
    mid_ctx_total, mid_followers = Counter(), Counter()
    uni = Counter()
    for (v, w), c in mid.items():
        mid_ctx_total[v] += c
        mid_followers[v] += 1
        uni[w] += 1
    bigram_types = len(mid)  # N1+(..) = distinct (v, w) types
    V = len(uni)

    def discount(counter):
        n1 = sum(1 for c in counter.values() if c == 1)
        n2 = sum(1 for c in counter.values() if c == 2)
        d = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.75
        return min(max(d, 0.01), 0.99)

    d3, d2, d1 = discount(tri), discount(mid), discount(uni)
    p0 = 1.0 / (V + 1)

    def p(u, v, w):
        p1 = (max(uni.get(w, 0) - d1, 0.0) + d1 * V * p0) / bigram_types
        if v in mid_ctx_total:
            p2 = (
                max(mid.get((v, w), 0) - d2, 0.0)
                + d2 * mid_followers[v] * p1
            ) / mid_ctx_total[v]
        else:
            p2 = p1
        if (u, v) in tri_ctx_total:
            return (
                max(tri.get((u, v, w), 0) - d3, 0.0)
                + d3 * tri_followers[(u, v)] * p2
            ) / tri_ctx_total[(u, v)]
        return p2

    out = []
    for toks in score_tokens_list:
        padded = [BOS, BOS] + toks
        lps = [
            math.log(p(padded[i], padded[i + 1], padded[i + 2]))
            for i in range(len(toks))
        ]
        out.append(-sum(lps) / len(lps))
    return out


def test_matches_independent_reference(spark, tiny):
    """Per-doc NLL equals a from-scratch dict implementation on a
    corpus that exercises seen trigrams, backoffs, and OOV."""
    lm = train_kn_lm(tiny)
    probes = [
        (10, "the cat sat on the log"),   # seen pieces, recombined
        (11, "a dog sat"),                # short, backoff-heavy
        (12, "quantum flux the cat"),     # OOV tokens
    ]
    probe_df = spark.createDataFrame(probes, ["doc_id", "text"])
    got = {
        r.doc_id: r.avg_neg_logp
        for r in score_perplexity_kn(probe_df, lm).collect()
    }
    train_texts = [t for _, t in tiny.collect()]
    toks = [p[1].split() for p in probes]
    want = _reference_kn(train_texts, toks)
    for (doc_id, _), w in zip(probes, want):
        assert got[doc_id] == pytest.approx(w, abs=1e-6), doc_id


def test_scoring_edges_and_ordering(spark, tiny):
    import pyspark.sql.types as T

    lm = train_kn_lm(tiny)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    probes = spark.createDataFrame(
        [
            (20, "the cat sat on the mat"),   # training sentence
            (21, "mat log dog zzz qqq vvv"),  # word salad + OOV
            (22, "cat"),                      # single token
            (23, ""),                         # empty → dropped
            (24, None),                       # NULL → dropped
        ],
        schema,
    )
    rows = {r.doc_id: r for r in score_perplexity_kn(probes, lm).collect()}
    assert set(rows) == {20, 21, 22}
    assert rows[22]["n_tokens"] == 1
    # in-domain text must score far better than OOV salad
    assert rows[20]["perplexity"] < rows[21]["perplexity"]
    assert all(math.isfinite(r["perplexity"]) for r in rows.values())


def test_min_count_prunes_top_order_only(spark, tiny):
    lm = train_kn_lm(tiny, min_count=2)
    kept = {(r.u, r.v, r.w) for r in lm.tri.collect()}
    assert kept == {(BOS, BOS, "the"), ("sat", "on", "the")}
    # lower-order (continuation) tables are pre-prune: full vocabulary
    unpruned = train_kn_lm(tiny)
    assert {r.w for r in lm.uni.collect()} == {
        r.w for r in unpruned.uni.collect()
    }
    # but the top-order context totals follow the survivors: a pruned
    # context is GONE (backs off with weight 1), not half-counted
    ctxs = {(r.u, r.v): r.ctx_total for r in lm.tri_ctx.collect()}
    assert set(ctxs) == {(BOS, BOS), ("sat", "on")}
    assert ctxs[(BOS, BOS)] == 2 and ctxs[("sat", "on")] == 2
    probe = spark.createDataFrame([(30, "on the mat")], ["doc_id", "text"])
    row = score_perplexity_kn(probe, lm).first()
    assert math.isfinite(row["perplexity"])


def test_pruned_model_still_sums_to_one(spark, tiny):
    """The normalization property survives pruning: Σ_w p(w|u,v) = 1
    over vocab ∪ {OOV} on SURVIVING contexts, on contexts whose every
    trigram was pruned (pure backoff), and on unseen contexts. This is
    what the 100 TB story rests on — a pruned model must be a MODEL,
    not a leaky table. (With pre-prune totals kept, a surviving
    context whose siblings were pruned sums to < 1 — the exact bug
    this pins out.)"""
    lm = train_kn_lm(tiny, min_count=2)
    vocab = [r.w for r in lm.uni.collect()]
    words = spark.createDataFrame(
        [(w,) for w in vocab] + [("zzz_oov_zzz",)], ["w"]
    )
    contexts = _context_rows(
        spark,
        [
            (BOS, BOS),       # survives pruning (c3=2 trigram)
            ("sat", "on"),    # survives pruning
            ("on", "the"),    # every trigram pruned → pure backoff
            ("the", "cat"),   # every trigram pruned → pure backoff
            ("zzz", "qqq"),   # never seen
        ],
    )
    probs = kn_prob_table(lm, contexts, words).collect()
    sums = defaultdict(float)
    for r in probs:
        assert r.p > 0, f"zero/negative prob at {(r.u, r.v, r.w)}"
        sums[(r.u, r.v)] += r.p
    assert len(sums) == 5
    for ctx, s in sums.items():
        assert s == pytest.approx(1.0, abs=1e-9), f"Σp({ctx}) = {s}"


def test_kn_lm_size_gauge(spark, tiny, caplog):
    import logging

    from sparvi_core_spark.functions.knlm import kn_lm_size

    full = kn_lm_size(train_kn_lm(tiny))
    with caplog.at_level(logging.INFO, logger="sparvi_core_spark.functions.knlm"):
        pruned = kn_lm_size(train_kn_lm(tiny, min_count=2))
    assert full["broadcast_sane"] and pruned["broadcast_sane"]
    # pruning shrinks exactly the top-order tables
    assert pruned["tri_rows"] < full["tri_rows"]
    assert pruned["tri_ctx_rows"] < full["tri_ctx_rows"]
    assert pruned["mid_rows"] == full["mid_rows"]
    assert pruned["uni_rows"] == full["uni_rows"]
    assert pruned["est_broadcast_mb"] <= full["est_broadcast_mb"]
    assert any("KN-LM broadcast size" in r.message for r in caplog.records)


def test_broadcast_plan_pin(spark, tiny):
    lm = train_kn_lm(tiny)
    plan = (
        score_perplexity_kn(tiny, lm, broadcast_model=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_scale_reference_parity(spark, sf_dir):
    """Self-trained KN perplexity over the real documents fixture vs
    the dict reference — corpus-scale join/backoff coverage (every
    doc, thousands of distinct trigrams, all three backoff paths)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = train_kn_lm(docs)
    got = {
        r.doc_id: r.avg_neg_logp
        for r in score_perplexity_kn(docs, lm).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    texts = [t for _, t in rows]
    want = _reference_kn(texts, [_ref_tokens(t) for t in texts])
    assert len(got) == sum(1 for t in texts if _ref_tokens(t))
    for (doc_id, _), w in zip(rows, want):
        assert got[doc_id] == pytest.approx(w, abs=1e-6), doc_id


def test_merge_equals_joint_retrain(spark, tiny):
    from sparvi_core_spark.functions.knlm import merge_kn_lms

    half_a = tiny.filter("doc_id = 1")
    half_b = tiny.filter("doc_id >= 2")
    merged = merge_kn_lms(
        train_kn_lm(half_a), train_kn_lm(half_b)
    )
    joint = train_kn_lm(tiny)
    probe = spark.createDataFrame(
        [(80, "the cat sat on a zzz mat")], ["doc_id", "text"]
    )
    got = score_perplexity_kn(probe, merged).first()
    want = score_perplexity_kn(probe, joint).first()
    assert got["avg_neg_logp"] == want["avg_neg_logp"]
    assert got["perplexity"] == want["perplexity"]
    # merge-time pruning mirrors train-time pruning exactly
    m2 = merge_kn_lms(train_kn_lm(half_a), train_kn_lm(half_b), min_count=2)
    j2 = train_kn_lm(tiny, min_count=2)
    assert (
        score_perplexity_kn(probe, m2).first()["perplexity"]
        == score_perplexity_kn(probe, j2).first()["perplexity"]
    )
