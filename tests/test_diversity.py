"""Corpus diversity report: hand-checked metrics vs an independent
Python computation, edge cases (empty corpus, NULL text, single doc),
and the zipf_top head cap. DuckDB value parity lives in
tests/test_oracle_parity.py::test_local_diversity_parity."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sparvi_core_spark.operators.diversity import corpus_diversity


def _reference(texts, zipf_top=10_000):
    import re

    toks = []
    bigrams = []
    for t in texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
        toks.extend(ws)
        bigrams.extend(zip(ws, ws[1:]))
    freq = Counter(toks)
    n = len(toks)
    out = {
        "n_docs": len(texts),
        "n_tokens": n,
        "vocab_size": len(freq),
        "type_token_ratio": len(freq) / n if n else None,
        "distinct_2": (
            len(set(bigrams)) / len(bigrams) if bigrams else None
        ),
        "token_entropy": (
            math.log(n) - sum(c * math.log(c) for c in freq.values()) / n
            if n
            else None
        ),
        "top_token_frac": max(freq.values()) / n if n else None,
    }
    head = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:zipf_top]
    xs = [math.log(r + 1) for r in range(len(head))]
    ys = [math.log(c) for _, c in head]
    if len(xs) > 1:
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        var = sum((x - mx) ** 2 for x in xs) / len(xs)
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / len(xs)
        out["zipf_slope"] = cov / var if var > 0 else None
    else:
        out["zipf_slope"] = None
    return out


def test_hand_checked_report(spark):
    texts = ["a b a", "b c"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    row = corpus_diversity(df).first().asDict()
    want = _reference(texts)
    assert row["n_docs"] == 2 and row["n_tokens"] == 5
    assert row["vocab_size"] == 3
    assert row["type_token_ratio"] == pytest.approx(0.6, abs=1e-6)
    assert row["distinct_2"] == pytest.approx(1.0, abs=1e-6)
    assert row["token_entropy"] == pytest.approx(
        want["token_entropy"], abs=1e-6
    )
    assert row["top_token_frac"] == pytest.approx(0.4, abs=1e-6)
    assert row["zipf_slope"] == pytest.approx(want["zipf_slope"], abs=1e-6)


def test_matches_reference_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = corpus_diversity(docs).first().asDict()
    want = _reference([r.text for r in docs.select("text").collect()])
    for k, v in want.items():
        assert row[k] == pytest.approx(v, abs=1e-5), k


def test_edge_cases(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # empty corpus → one all-NULL/zero row, no crash
    empty = spark.createDataFrame([], schema)
    row = corpus_diversity(empty).first().asDict()
    assert row["n_docs"] == 0 and row["n_tokens"] == 0
    assert row["type_token_ratio"] is None
    assert row["zipf_slope"] is None
    # NULL/empty texts tokenize to nothing
    nulls = spark.createDataFrame([(1, None), (2, ""), (3, "x y")], schema)
    row = corpus_diversity(nulls).first().asDict()
    assert row["n_docs"] == 3 and row["n_tokens"] == 2
    assert row["distinct_2"] == pytest.approx(1.0)
    # a single type: zipf fit undefined (var = 0) → NULL, not error
    one = spark.createDataFrame([(1, "w w w")], schema)
    row = corpus_diversity(one).first().asDict()
    assert row["zipf_slope"] is None
    assert row["top_token_frac"] == pytest.approx(1.0)


def test_zipf_head_cap(spark):
    # 30 distinct tokens, zipf_top=10 → the fit uses only the head;
    # the rest of the report is unaffected by the cap
    texts = [" ".join(f"t{i:02d}" for i in range(30 - d)) for d in range(3)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    full = corpus_diversity(df, zipf_top=10_000).first().asDict()
    capped = corpus_diversity(df, zipf_top=10).first().asDict()
    assert capped["vocab_size"] == full["vocab_size"] == 30
    assert capped["token_entropy"] == full["token_entropy"]
    assert capped["zipf_slope"] != full["zipf_slope"]
    want = _reference(texts, zipf_top=10)
    assert capped["zipf_slope"] == pytest.approx(want["zipf_slope"], abs=1e-6)


def test_cache_freq_same_result(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = corpus_diversity(docs).first().asDict()
    cached = corpus_diversity(docs, cache_freq=True).first().asDict()
    assert plain == cached
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# corpus_divergence (r7): cross-corpus distribution shift. DuckDB value
# parity is the demoted pair `corpus_divergence` in test_oracle_parity.


def _div_reference(texts_a, texts_b, alpha=0.5):
    """Independent Python computation of every divergence column."""
    import re

    def freq(texts):
        c = Counter()
        for t in texts:
            c.update(
                w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w
            )
        return c

    fa, fb = freq(texts_a), freq(texts_b)
    union = set(fa) | set(fb)
    ta, tb, v = sum(fa.values()), sum(fb.values()), len(union)
    js = kl_ab = kl_ba = tvd = 0.0
    for tok in union:
        na, nb = fa.get(tok, 0), fb.get(tok, 0)
        p, q = na / ta, nb / tb
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
        ps = (na + alpha) / (ta + alpha * v)
        qs = (nb + alpha) / (tb + alpha * v)
        kl_ab += ps * math.log(ps / qs)
        kl_ba += qs * math.log(qs / ps)
        tvd += abs(p - q) / 2
    both = len(set(fa) & set(fb))
    return {
        "tokens_a": ta, "tokens_b": tb,
        "vocab_a": len(fa), "vocab_b": len(fb),
        "vocab_jaccard": round(both / v, 6),
        "js_divergence": round(js, 4), "kl_ab": round(kl_ab, 4),
        "kl_ba": round(kl_ba, 4), "tvd": round(tvd, 4),
    }


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_divergence_identical_corpora(spark):
    from sparvi_core_spark.operators.diversity import corpus_divergence

    texts = ["the quick brown fox", "jumps over the lazy dog"]
    r = corpus_divergence(_docs(spark, texts), _docs(spark, texts, 10)).first()
    assert r["js_divergence"] == 0.0 and r["kl_ab"] == 0.0
    assert r["tvd"] == 0.0 and r["vocab_jaccard"] == 1.0


def test_divergence_disjoint_corpora(spark):
    from sparvi_core_spark.operators.diversity import corpus_divergence

    r = corpus_divergence(
        _docs(spark, ["alpha beta gamma"]),
        _docs(spark, ["delta epsilon zeta"], 10),
    ).first()
    # JS of disjoint supports is exactly ln 2; all mass moved
    assert r["js_divergence"] == round(math.log(2), 4)
    assert r["tvd"] == 1.0 and r["vocab_jaccard"] == 0.0
    assert r["kl_ab"] > 0 and r["kl_ba"] > 0  # smoothed, finite


def test_divergence_matches_reference(spark):
    from sparvi_core_spark.operators.diversity import corpus_divergence

    a = ["the cat sat on the mat", "dogs and cats", "the end"]
    b = ["a dog ran fast", "the cat ran home", "cats cats cats"]
    got = corpus_divergence(_docs(spark, a), _docs(spark, b, 10)).first()
    want = _div_reference(a, b)
    assert got.asDict() == want
    # asymmetry is real: KL directions differ unless distributions match
    assert got["kl_ab"] != got["kl_ba"]


def test_divergence_empty_side_is_null_not_zero(spark):
    from sparvi_core_spark.operators.diversity import corpus_divergence

    r = corpus_divergence(
        _docs(spark, []), _docs(spark, ["some text"], 10)
    ).first()
    assert r["tokens_a"] == 0 and r["tokens_b"] == 2
    assert r["js_divergence"] is None and r["tvd"] is None
    both_empty = corpus_divergence(
        _docs(spark, []), _docs(spark, [], 10)
    ).first()
    assert both_empty["tokens_a"] == 0 and both_empty["js_divergence"] is None
