"""BPE: hybrid and distributed trainers vs a pure-Python reference
(the published Sennrich et al. algorithm), plus encode round-trips."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.bpe import (
    EOW,
    _merge_pairs_py,
    bpe_encode,
    bpe_train,
    bpe_train_distributed,
    bpe_train_from_counts,
    merges_table,
    word_frequencies,
)


def reference_bpe(word_freqs, num_merges):
    """Independent re-implementation (dict-of-tuples state) following
    the published algorithm, used as the oracle."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in word_freqs}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + f
                )
        if not pairs:
            break
        m = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == m)
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower lowest"),
]


def test_merge_pairs_greedy_overlap():
    assert _merge_pairs_py(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_pairs_py(["a", "b", "b"], "b", "b") == ["a", "bb"]
    assert _merge_pairs_py(["x"], "a", "b") == ["x"]


def test_train_from_counts_matches_reference():
    wf = [("low", 6), ("lower", 3), ("newest", 6), ("widest", 3),
          ("lowest", 1)]
    got = bpe_train_from_counts(wf, 12)
    want = reference_bpe(wf, 12)
    assert got == want
    assert len(got) == 12


def test_hybrid_trainer_end_to_end(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    wf = {
        r.word: r.freq
        for r in word_frequencies(df).collect()
    }
    assert wf["low"] == 6 and wf["newest"] == 6 and wf["widest"] == 3
    got = bpe_train(df, 10)
    want = reference_bpe(sorted(wf.items()), 10)
    assert got == want


def test_distributed_trainer_matches_hybrid(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    hybrid = bpe_train(df, 8)
    dist = bpe_train_distributed(df, 8, checkpoint_every=3)
    assert dist == hybrid


def test_distributed_trainer_on_real_docs(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
    )
    hybrid = bpe_train(df, 6)
    dist = bpe_train_distributed(df, 6)
    assert dist == hybrid
    assert len(dist) == 6


def test_merges_table_shape(spark):
    m = bpe_train_from_counts([("aaab", 5)], 3)
    t = merges_table(spark, m).toPandas()
    assert list(t.columns) == ["rank", "left", "right", "merged"]
    assert t["rank"].tolist() == [0, 1, 2]
    assert (t["left"] + t["right"] == t["merged"]).all()


def test_encode_roundtrip_and_vocab_closure(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, 15)
    enc = bpe_encode(df, merges).toPandas().set_index("doc_id")
    raw = {i: t for i, t in CORPUS}
    vocab = {a + b for a, b in merges}
    for i, text in raw.items():
        toks = enc.loc[i, "tokens"]
        assert enc.loc[i, "n_tokens"] == len(toks)
        # round-trip: stripping EOW and concatenating reproduces text
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == text
        # vocab closure: every token is a base symbol (single char or
        # the EOW marker) or a learned merge
        for t in toks:
            assert t == EOW or len(t) == 1 or t in vocab, t


def test_encode_fewer_tokens_with_more_merges(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    n0 = (
        bpe_encode(df, bpe_train(df, 0))
        .agg(F.sum("n_tokens")).first()[0]
    )
    n15 = (
        bpe_encode(df, bpe_train(df, 15))
        .agg(F.sum("n_tokens")).first()[0]
    )
    assert n15 < n0  # merges compress


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok")], "doc_id long, text string"
    )
    enc = bpe_encode(df, [("o", "k")]).toPandas().set_index("doc_id")
    assert enc.loc[1, "n_tokens"] == 0
    assert enc.loc[2, "n_tokens"] == 0
    assert list(enc.loc[3, "tokens"]) == ["ok", EOW]
