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
