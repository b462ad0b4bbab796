"""Compression-ratio quality signal: zlib reference twin, planted
repetitive/natural/random ordering, edge cases, band filter, and
string-id schema derivation."""

from __future__ import annotations

import random
import string
import zlib

import pytest

from sparvi_core_spark.operators.compression import (
    compression_filter,
    compression_ratio,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    soup = "".join(rng.choices(string.ascii_letters + string.digits, k=2000))
    rows = [
        (1, "spam template offer " * 100),                  # repetitive
        (2, " ".join(
            f"Sentence number {i} talks about {w} in a plain way."
            for i, w in enumerate(
                ["rivers", "engines", "markets", "gardens", "planets",
                 "music", "bridges", "harvests", "glaciers", "libraries"]
            )
        )),
        (3, soup),                                          # random soup
        (4, ""),                                            # empty
        (5, None),                                          # NULL
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_matches_zlib_reference(spark, corpus):
    got = {r["doc_id"]: r for r in compression_ratio(corpus).collect()}
    for doc_id, text in [(r["doc_id"], r["text"]) for r in corpus.collect()]:
        raw = (text or "").encode("utf-8")
        assert got[doc_id]["n_bytes"] == len(raw)
        if raw:
            comp = len(zlib.compress(raw, 1))
            assert got[doc_id]["n_compressed"] == comp
            assert got[doc_id]["compression_ratio"] == pytest.approx(
                len(raw) / comp, abs=1e-6
            )
        else:
            assert got[doc_id]["compression_ratio"] is None


def test_planted_ordering(spark, corpus):
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(corpus).collect()
    }
    # repetitive ≫ natural > random soup; soup barely compresses
    assert got[1] > 10
    assert 1.5 < got[2] < got[1]
    assert got[3] < 1.5


def test_filter_drops_both_tails_and_unmeasurable(spark, corpus):
    kept = compression_filter(corpus, max_ratio=8.0, min_ratio=1.5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    assert "compression_ratio" in kept.columns


def test_string_ids_and_level_guard(spark):
    df = spark.createDataFrame(
        [("a", "hello hello hello hello")], ["doc_id", "text"]
    )
    row = compression_ratio(df).first()
    assert row["doc_id"] == "a" and row["compression_ratio"] > 1
    with pytest.raises(ValueError, match="level"):
        compression_ratio(df, level=0)


def test_level_changes_bytes_not_signal(spark, corpus):
    r1 = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(corpus, level=1).collect()
    }
    r9 = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(corpus, level=9).collect()
    }
    # absolute ratios differ but the ordering (the signal) is identical
    order = lambda d: sorted(
        (k for k in d if d[k] is not None), key=lambda k: d[k]
    )
    assert order(r1) == order(r9)
