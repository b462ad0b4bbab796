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
