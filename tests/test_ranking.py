"""BM25 / TF-IDF ranking: semantics pins + plan shape.

DuckDB value parity lives in tests/test_oracle_parity.py
(test_local_bm25_parity / test_local_tfidf_parity); here: the tiny
hand-checkable fixture, query normalization, determinism, and the
no-wide-shuffle plan pin that carries the 100 TB claim.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window, functions as F

from sparvi_core_spark.operators.ranking import (
    bm25_search,
    search_tokens,
    tfidf_vectors,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "completely unrelated text here"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_hand_checked(spark, corpus):
    rows = bm25_search(corpus, "cat", top_n=None).collect()
    # only doc 1 contains the exact token "cat" ("cats" is a different
    # token — no stemming by design)
    assert [r["doc_id"] for r in rows] == [1]
    r = rows[0]
    assert r["tf_cat"] == 1 and r["dl"] == 6
    # N=5, df=1, avgdl=(6+6+5+4+0)/5=4.2: idf = ln(1+(5-1+0.5)/1.5)
    idf = math.log(1 + (5 - 1 + 0.5) / 1.5)
    norm = 1 + 1.2 * (1 - 0.75 + 0.75 * 6 / 4.2)
    assert r["bm25"] == pytest.approx(idf * (1 * 2.2) / norm, abs=1e-6)


def test_bm25_multi_term_and_ordering(spark, corpus):
    rows = bm25_search(corpus, "cat dog sat", top_n=None).collect()
    ids = [r["doc_id"] for r in rows]
    # docs 1 and 2 match two terms each, deterministic tie-break by id
    assert ids[0] == 1 and ids[1] == 2
    assert 4 not in ids and 5 not in ids  # zero-match docs dropped
    assert rows[0]["bm25"] >= rows[1]["bm25"]


def test_bm25_query_normalization(spark, corpus):
    # dup terms collapse; case and punctuation normalize through the
    # same tokenizer as documents
    a = bm25_search(corpus, "Cat, CAT cat!", top_n=None).collect()
    b = bm25_search(corpus, "cat", top_n=None).collect()
    assert [(r["doc_id"], r["bm25"]) for r in a] == [
        (r["doc_id"], r["bm25"]) for r in b
    ]
    with pytest.raises(ValueError):
        bm25_search(corpus, "!!!")


def test_bm25_plan_no_wide_shuffle(spark, corpus):
    """The whole score is projection + one single-row agg + broadcast +
    TakeOrderedAndProject — no hash-partitioned exchange anywhere, so
    cost is one scan at any corpus size."""
    plan = bm25_search(corpus, "cat sat")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_tfidf_hand_checked(spark, corpus):
    out = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_vectors(corpus).collect()
    }
    r = out[(3, "cats")]
    assert r["tf"] == 2 and r["df"] == 1
    # dl=5 ("cats and dogs and cats"); sklearn idf = ln((1+5)/(1+1))+1
    expected = (2 / 5) * (math.log(6 / 2) + 1)
    assert r["tfidf"] == pytest.approx(expected, abs=1e-6)
    # min_df prunes the hapax terms entirely
    pruned = tfidf_vectors(corpus, min_df=2).collect()
    assert all(r["df"] >= 2 for r in pruned)
    kept_terms = {r["term"] for r in pruned}
    assert "cats" not in kept_terms and "sat" in kept_terms


def test_tokenizer_matches_contract(spark):
    df = spark.createDataFrame([("A-b C_9 ",)], ["text"])
    toks = df.select(search_tokens("text").alias("t")).first()["t"]
    assert toks == ["a", "b", "c", "9"]


def test_bm25_repartition_invariant(spark, corpus):
    base = bm25_search(corpus, "cat dog sat", top_n=3).collect()
    shuffled = bm25_search(
        corpus.repartition(7), "cat dog sat", top_n=3
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in shuffled]


# ---------------------------------------------------------------------------
# rrf_fuse (r7): reciprocal rank fusion. DuckDB parity is the demoted
# pair `rrf_fuse` in test_oracle_parity.


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )


def test_rrf_hand_checked(spark):
    from sparvi_core_spark.operators.ranking import rrf_fuse

    a = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _ranking(spark, [(1, 11, 1), (1, 13, 2)])
    got = {
        r["doc_id"]: r.asDict()
        for r in rrf_fuse([a, b], k=60).collect()
    }
    # doc 11: 1/62 + 1/61 ; doc 10: 1/61 ; doc 13: 1/62 ; doc 12: 1/63
    assert got[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert got[11]["rank"] == 1 and got[11]["n_lists"] == 2
    assert got[10]["rrf_score"] == round(1 / 61, 6)
    assert got[13]["rrf_score"] == round(1 / 62, 6)
    # rank order: fused consensus first, then by score, ties by id
    assert [got[d]["rank"] for d in (11, 10, 13, 12)] == [1, 2, 3, 4]


def test_rrf_weights_and_topn(spark):
    from sparvi_core_spark.operators.ranking import rrf_fuse

    a = _ranking(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranking(spark, [(1, 11, 1), (1, 10, 2)])
    # symmetric lists, asymmetric weights: the heavier list decides
    got = {
        r["doc_id"]: r["rank"]
        for r in rrf_fuse([a, b], weights=[3.0, 1.0], top_n=1).collect()
    }
    assert got == {10: 1}
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_rrf_single_query_lists(spark):
    from sparvi_core_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(11, 1)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], query_col=None).collect()
    assert {r["doc_id"]: r["rank"] for r in rows} == {11: 1, 10: 2}


def test_rrf_hybrid_bm25_plus_hamming(spark, corpus):
    """The advertised use: fuse a lexical ranking with a vector-sketch
    ranking over the same ids — schema compatibility end to end."""
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk,
    )
    from sparvi_core_spark.operators.ranking import bm25_search, rrf_fuse

    lex = (
        bm25_search(corpus, "spark data", top_n=5)
        .select(
            F.lit(0).alias("query_id"),
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    import numpy as np

    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [
            (r["doc_id"], [float(x) for x in rng.normal(size=8)])
            for r in corpus.select("doc_id").collect()
        ],
        "vec_id long, embedding array<double>",
    )
    sk = binarize_embeddings(emb, bits=64, seed=2)
    vec = hamming_topk(sk, sk.filter("vec_id = 1"), k=5).select(
        F.lit(0).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused = rrf_fuse([lex, vec], k=60)
    rows = fused.collect()
    assert rows and {"query_id", "doc_id", "rrf_score", "n_lists", "rank"} <= {
        c for c in fused.columns
    }
    # every fused doc came from at least one retriever, capped at 2
    assert all(1 <= r["n_lists"] <= 2 for r in rows)
