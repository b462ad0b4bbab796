"""Parity pins for the NumPy xxhash64 twin and the span featurizers.

The hashed-feature scoring kernels (NB, DSIR) are only correct if
``functions.xxh64np`` reproduces Spark's ``F.xxhash64`` bit-for-bit
over UTF-8 bytes AND the span featurizers produce exactly the JVM
featurizer's feature sequence — both pinned here against Spark itself.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from sparvi_core_spark.functions.xxh64np import xxh64_bytes, xxh64_spans


def _cases():
    rng = random.Random(7)
    cases = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "x" * 31, "x" * 32, "x" * 33, "y" * 63, "y" * 64,
        "z" * 65, "w" * 96, "v" * 100, "héllo wörld", "日本語テキスト",
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 🎉", "mixêd — éß",
    ]
    for _ in range(200):
        n = rng.randint(0, 80)
        cases.append(
            "".join(
                chr(
                    rng.choice(
                        [
                            rng.randint(97, 122),
                            rng.randint(0x80, 0x2FFF),
                            rng.randint(0x10000, 0x10500),
                        ]
                    )
                )
                for _ in range(n)
            )
        )
    return cases


def test_xxh64_matches_spark_xxhash64(spark):
    from pyspark.sql import functions as F

    cases = _cases()
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    want = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    got = [xxh64_bytes(c.encode("utf-8")) for c in cases]
    assert got == want


def test_xxh64_spans_equals_per_item():
    rng = random.Random(11)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 90)))
             for _ in range(150)]
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    starts = np.zeros(len(blobs), dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    got = xxh64_spans(buf, starts, lens)
    want = [xxh64_bytes(b) for b in blobs]
    assert got.tolist() == want


def test_word_token_spans_match_featurizer_twin():
    from sparvi_core_spark.functions.spanfeats import word_token_spans
    from sparvi_core_spark.operators.classify import _nb_featurizer

    feats = _nb_featurizer("word", 3, None)
    texts = [
        None, "", "   ", "Hello, WORLD! 42", "a--b__c",
        "héllo wörld KK", "日本語 then ascii9", "𝔞stral 🎉 mix",
        "ALL CAPS AND numbers 123 456", "x",
    ]
    buf, starts, lens, doc = word_token_spans(texts)
    got: dict[int, list[str]] = {i: [] for i in range(len(texts))}
    for s, l, d in zip(starts, lens, doc):
        got[int(d)].append(bytes(buf[s : s + l]).decode("utf-8"))
    want = {i: feats(t) for i, t in enumerate(texts)}
    assert got == want


def test_char_ngram_spans_match_featurizer_twin():
    from sparvi_core_spark.functions.spanfeats import char_ngram_spans
    from sparvi_core_spark.operators.classify import _nb_featurizer

    texts = [
        None, "", " a ", "Hello  World", "日本語テキスト", "𝔞🎉xy",
        "tab\tand\nnewline", "éß œ", "ab",
    ]
    for ns in ((2, 3), (1,), (4,)):
        feats = _nb_featurizer("char", ns, None)
        buf, starts, lens, doc, order = char_ngram_spans(texts, ns)
        s2, l2, d2 = starts[order], lens[order], doc[order]
        got: dict[int, list[str]] = {i: [] for i in range(len(texts))}
        for s, l, d in zip(s2, l2, d2):
            got[int(d)].append(bytes(buf[s : s + l]).decode("utf-8"))
        want = {i: feats(t) for i, t in enumerate(texts)}
        assert got == want, ns


def test_dsir_kgram_spans_match_expression(spark):
    """Word k-gram spans over the canonical buffer reproduce the JVM
    doc_features array (modulo hashing) for k up to 3."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.functions.spanfeats import (
        canonical_token_buffer,
        kgram_spans,
        word_token_spans,
    )
    from sparvi_core_spark.operators.selection import doc_features

    texts = [
        None, "", "one", "two words", "Three WORD doc!", "a b c d e",
        "héllo wörld again", "日本語 x y",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    want_rows = df.select(
        "i", doc_features("text", 3, None).alias("f")
    ).collect()
    want = {r["i"]: (r["f"] if r["f"] is not None else []) for r in want_rows}
    buf, starts, lens, doc = word_token_spans(texts)
    canon, c_starts = canonical_token_buffer(buf, starts, lens)
    got: dict[int, list[str]] = {i: [] for i in range(len(texts))}
    for k in (1, 2, 3):
        s, l, d = kgram_spans(c_starts, lens, doc, k)
        for ss, ll, dd in zip(s, l, d):
            got[int(dd)].append(bytes(canon[ss : ss + ll]).decode("utf-8"))
    assert got == want


def test_hashed_nb_kernel_equals_join_shape(spark):
    """The hashed-feature NB kernel must be bit-identical to the
    explode × broadcast-join × groupBy shape, including edge docs."""
    import sparvi_core_spark.operators.classify as C

    docs = spark.createDataFrame(
        [
            (1, "spam spam offer deal", "bad"),
            (2, "the paper presents results", "good"),
            (3, None, "good"),
            (4, "", "bad"),
            (5, "日本語テキスト mixed 42", "good"),
            (6, "astral 🎉 and KK", "bad"),
        ],
        "doc_id long, text string, label string",
    )
    old = C._HASHED_KERNEL_MAX_D
    try:
        for analyzer, char_n, d in (("word", 3, 64), ("char", (2, 3), 128)):
            model = C.train_nb(
                docs, "label", num_features=d, analyzer=analyzer,
                char_n=char_n,
            )
            C._HASHED_KERNEL_MAX_D = 1 << 22
            got = sorted(map(tuple, C.score_nb(docs, model).collect()))
            C._HASHED_KERNEL_MAX_D = 0
            want = sorted(map(tuple, C.score_nb(docs, model).collect()))
            assert got == want, (analyzer, d)
    finally:
        C._HASHED_KERNEL_MAX_D = old


def test_dsir_kernel_equals_join_shape(spark):
    import sparvi_core_spark.operators.selection as S

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta beta delta"),
            (3, None),
            (4, ""),
            (5, "single"),
            (6, "日本語 beta astral 🎉"),
        ],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id <= 2")
    old = S._HASHED_KERNEL_MAX_D
    try:
        for nb, ng in ((64, 2), (257, 3), (32, 1)):
            model = S.train_dsir(target, docs, num_buckets=nb, ngram_n=ng)
            S._HASHED_KERNEL_MAX_D = 1 << 22
            plan = S.score_dsir(docs, model)._jdf.queryExecution() \
                .executedPlan().toString()
            assert "MapInPandas" in plan and "Join" not in plan
            got = sorted(map(tuple, S.score_dsir(docs, model).collect()))
            S._HASHED_KERNEL_MAX_D = 0
            want = sorted(map(tuple, S.score_dsir(docs, model).collect()))
            assert got == want, (nb, ng)
    finally:
        S._HASHED_KERNEL_MAX_D = old
