"""n-gram collision screen: planted-overlap semantics, occurrence vs
distinct counting, filtering action, and the broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.decontamination import (
    filter_ngram_contaminated,
    ngram_collisions,
    reference_ngram_keys,
)
from sparvi_core_spark.plans.inspect import has_broadcast_hash_join


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1 quotes the benchmark verbatim inside unrelated text;
    # doc 2 repeats the quoted trigram twice; doc 3 is clean;
    # doc 4 is too short to shingle at n=3
    rows = [
        (1, "alpha beta gamma the quick brown fox ends here"),
        (2, "x the quick brown y the quick brown z"),
        (3, "nothing to see in this document at all"),
        (4, "too short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def reference(spark):
    rows = [(100, "the quick brown fox jumps")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_collisions_planted(corpus, reference):
    out = {
        r["id"]: r.asDict()
        for r in ngram_collisions(corpus, reference, n=3).collect()
    }
    # reference trigrams: {the quick brown, quick brown fox, brown fox jumps}
    # doc 1 (7 trigrams): hits "the quick brown" + "quick brown fox"
    # doc 2 (7 trigrams): hits "the quick brown" twice (occurrences)
    assert set(out) == {1, 2}
    assert out[1]["n_ngrams"] == 7 and out[1]["n_collisions"] == 2
    assert out[2]["n_ngrams"] == 7 and out[2]["n_collisions"] == 2
    assert out[1]["collision_frac"] == pytest.approx(round(2 / 7, 4))


def test_distinct_counts_unique_ngrams(corpus, reference):
    out = {
        r["id"]: r.asDict()
        for r in ngram_collisions(corpus, reference, n=3, distinct=True).collect()
    }
    # doc 2's repeated "the quick brown" collapses to one unique hit,
    # and its 7 occurrences hold only 6 unique trigrams
    assert out[2]["n_collisions"] == 1
    assert out[2]["n_ngrams"] == 6


def test_filter_action(corpus, reference):
    kept = filter_ngram_contaminated(corpus, reference, n=3)
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    # a frac threshold above doc 1/2's 2-of-7 keeps everything
    kept_all = filter_ngram_contaminated(
        corpus, reference, n=3, min_collision_frac=0.5
    )
    assert kept_all.count() == 4


def test_precomputed_reference_keys(corpus, reference):
    keys = reference_ngram_keys(reference, n=3)
    via_keys = ngram_collisions(corpus, reference_keys=keys, n=3)
    direct = ngram_collisions(corpus, reference, n=3)
    assert sorted(map(tuple, via_keys.collect())) == sorted(
        map(tuple, direct.collect())
    )
    with pytest.raises(ValueError, match="exactly one"):
        ngram_collisions(corpus, reference, reference_keys=keys)
    with pytest.raises(ValueError, match="exactly one"):
        ngram_collisions(corpus)


def test_membership_join_is_broadcast(corpus, reference):
    """The corpus-side membership test must be a broadcast hash join —
    the whole point of the screen's scale design."""
    assert has_broadcast_hash_join(ngram_collisions(corpus, reference, n=3))


def test_string_keys_match_hashed_keys(corpus, reference):
    a = ngram_collisions(corpus, reference, n=3, hash_ngrams=True)
    b = ngram_collisions(corpus, reference, n=3, hash_ngrams=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_eval_contamination_report(spark, corpus, reference):
    """Eval-side audit: the planted benchmark item reports exactly the
    n-grams the corpus quotes, with occurrence counts; a clean item
    reports zero hits (and still appears)."""
    from sparvi_core_spark.operators.decontamination import (
        eval_contamination_report,
    )

    ref2 = reference.unionByName(
        spark.createDataFrame(
            [(101, "completely novel benchmark question here")],
            ["doc_id", "text"],
        )
    )
    rep = {
        r["id"]: r
        for r in eval_contamination_report(
            corpus, ref2, n=3
        ).collect()
    }
    assert set(rep) == {100, 101}
    # reference 100 = "the quick brown fox jumps" → trigrams:
    # (the quick brown), (quick brown fox), (brown fox jumps)
    r = rep[100]
    assert r["n_ngrams"] == 3
    # corpus contains "the quick brown" (doc1 once + doc2 twice) and
    # "quick brown fox" (doc1); "brown fox jumps" nowhere
    assert r["n_hit_ngrams"] == 2
    assert r["corpus_occurrences"] == 4
    assert r["hit_frac"] == round(2 / 3, 4)
    clean = rep[101]
    assert clean["n_hit_ngrams"] == 0
    assert clean["corpus_occurrences"] == 0
    assert clean["hit_frac"] == 0.0


def test_eval_report_duckdb_parity(spark, duck_con=None):
    """Local oracle pair: the eval-side report vs a DuckDB twin on
    word trigrams over the real documents table."""
    import duckdb

    from sparvi_core_spark.operators.decontamination import (
        eval_contamination_report,
    )
    from sparvi_core_spark.session import read_parquet_table

    SF = "/root/testdata/sf0.01"
    docs = read_parquet_table(spark, f"{SF}/documents.parquet")
    ref = docs.filter("doc_id % 50 = 0").select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    got = {
        r["id"]: (
            r["n_ngrams"],
            r["n_hit_ngrams"],
            r["hit_frac"],
            r["corpus_occurrences"],
        )
        for r in eval_contamination_report(
            docs, ref, n=3, hash_ngrams=False
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sh3 = (
        "list_transform(range(1, len(string_split(text, ' ')) - 1), i -> "
        "string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
        "|| ' ' || string_split(text, ' ')[i+2])"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""
WITH ref AS (
    SELECT doc_id + 10000 AS id, unnest({sh3}) AS k
    FROM documents WHERE doc_id % 50 = 0
      AND len(string_split(text, ' ')) >= 3
),
ref_d AS (SELECT DISTINCT id, k FROM ref),
corp AS (
    SELECT unnest({sh3}) AS k FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
hits AS (
    SELECT k, count(*) AS occ FROM corp
    WHERE k IN (SELECT DISTINCT k FROM ref_d) GROUP BY k
)
SELECT ref_d.id, count(*) AS n_ngrams,
       count(hits.occ) AS n_hit,
       round(count(hits.occ) * 1.0 / count(*), 4) AS frac,
       coalesce(sum(hits.occ), 0) AS occs
FROM ref_d LEFT JOIN hits ON ref_d.k = hits.k
GROUP BY ref_d.id
"""
        ).fetchall()
    }
    assert got == want and len(got) > 3
