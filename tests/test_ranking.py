"""BM25 / TF-IDF ranking: semantics pins + plan shape.

DuckDB value parity lives in tests/test_oracle_parity.py
(test_local_bm25_parity / test_local_tfidf_parity); here: the tiny
hand-checkable fixture, query normalization, determinism, and the
no-wide-shuffle plan pin that carries the 100 TB claim.
"""

from __future__ import annotations

import math

import pytest

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
