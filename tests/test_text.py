"""Text analysis: language ID, quality features, token counts, fingerprints."""

import pytest

from sparvi_core_spark.functions.text import (
    fingerprints,
    language_id,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat and the dog are in the house for a while"),
        (1, "le chat et le chien sont dans la maison des amis"),
        (2, "el gato y la casa de los perros es una historia"),
        (3, "der hund und die katze sind ein team von hier"),
        (4, "xyzzy plugh qwerty"),                      # no stopwords
        (5, "word word word!!! ??? ,,, ..."),           # heavy punctuation
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(texts):
    got = {r["id"]: r["predicted_lang"] for r in language_id(texts).collect()}
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_features(texts):
    got = {r["id"]: r for r in quality_features(texts).collect()}
    assert got[0]["n_tokens"] == 12
    assert got[0]["punct_ratio"] == 0.0
    assert got[0]["stopword_ratio"] > 0.3
    assert got[5]["punct_ratio"] > 0.2
    # clean english text scores above punctuation soup
    assert got[0]["quality_score"] > got[5]["quality_score"]


def test_token_counts(texts):
    got = {r["id"]: r for r in token_counts(texts).collect()}
    assert got[0]["ws_tokens"] == 12
    assert got[0]["bpe_ish_tokens"] == 12  # plain words
    # punctuation expands under BPE-ish tokenization
    assert got[5]["bpe_ish_tokens"] > got[5]["ws_tokens"]


def test_fingerprints_stability(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # identical
        (2, "totally different words in this one right here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert len(got[0]) == 32


def test_quality_features_empty_doc(spark):
    """Empty / whitespace-only docs get zeroed features, not a
    divide-by-zero error (ANSI mode)."""
    from sparvi_core_spark.functions.text import quality_features

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the cat sat")], "doc_id long, text string"
    )
    got = {r["id"]: r.asDict() for r in quality_features(df).collect()}
    assert got[1]["n_tokens"] == 0
    assert got[1]["avg_token_len"] == 0.0
    assert got[1]["stopword_ratio"] == 0.0
    assert got[2]["n_tokens"] == 0
    assert got[3]["n_tokens"] == 3


def test_histogram_empty_input(spark):
    """All-null / empty column → empty histogram frame with the output
    schema, instead of a TypeError on float(None)."""
    from sparvi_core_spark.functions.stats import histogram

    empty = spark.createDataFrame([], "x double")
    out = histogram(empty, "x", bins=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["bin", "bin_lo", "bin_hi", "count"]

    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    assert histogram(allnull, "x", bins=5).count() == 0
