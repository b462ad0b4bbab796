"""BPE vocabulary induction over a corpus (Sennrich et al. 2016).

`functions.text.vocab_coverage` answers "how big must the vocab be";
this module BUILDS the vocab: byte-pair-encoding merges learned from
corpus statistics, the standard subword tokenizer recipe.

The scale insight (and how real tokenizer trainers work): the
corpus-scale pass is the WORD-FREQUENCY COUNT — one explode + one
map-side-combined groupBy over 100 TB. Everything after operates on
the distinct-word table (tens of millions of rows, not trillions), so
the merge loop's input is vocab-scale. Three entry points:

- ``word_frequencies`` — the distributed corpus pass.
- ``bpe_train`` — the hybrid default: distributed word count, then the
  classic merge loop on the collected word table (bounded by
  ``max_words``; the driver holds words × avg_len symbols — the same
  trade HuggingFace `tokenizers` makes by training from word counts).
- ``bpe_train_distributed`` — the merge loop as Spark jobs over the
  word-symbol table, for when even the distinct-word table must stay
  distributed. Pair counting is an explode + groupBy per merge; the
  argmax is a 1-row ``orderBy.limit(1)`` (TakeOrdered, no full sort);
  the merge itself is an expression-level left-to-right fold over each
  word's symbol array. ``localCheckpoint`` every ``checkpoint_every``
  merges truncates the otherwise per-merge-growing lineage. One Spark
  job per merge — practical for hundreds of merges, not 32k; that is
  inherent to the algorithm's sequential dependency, which is why the
  hybrid is the default.

Both trainers emit the IDENTICAL merge sequence (tested against each
other and against a pure-Python reference): ties on pair count break
lexicographically so results are deterministic and engine-portable.

Tokens are whitespace words; symbols are the word's characters plus a
terminal ``</w>`` marker (the published formulation — so merges can't
cross word boundaries and a full word merge is representable).

``bpe_encode`` applies learned merges to documents. Applying k merges
can't be a static expression tree (each merge depends on the last), so
encoding is the one place this module runs Python on executors — an
Arrow-batched ``mapInPandas`` with the merge-rank dict broadcast, the
same pattern as `operators.multimodal`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over the corpus — the only corpus-scale pass."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.split(F.trim(t), r"\s+")
    return (
        df.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pairs_py(symbols: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train_from_counts(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop on a (word, freq) table — pure Python,
    vocab-scale input. Deterministic: ties break lexicographically."""
    vocab = {w: list(w) + [EOW] for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        top_n = max(pair_counts.values())
        # lexicographic MIN among max-count pairs (deterministic ties)
        best_pair = min(p for p, n in pair_counts.items() if n == top_n)
        merges.append(best_pair)
        a, b = best_pair
        vocab = {
            w: _merge_pairs_py(s, a, b) if a in s else s
            for w, s in vocab.items()
        }
    return merges


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Hybrid trainer (the default): distributed word count, local
    merge loop on the ``max_words`` most frequent words (covering the
    head is what matters for merge statistics; ties by word)."""
    wf = (
        word_frequencies(df, text_col, lowercase)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return bpe_train_from_counts([(r.word, r.freq) for r in wf], num_merges)


def _merge_expr(symbols: F.Column, a: str, b: str) -> F.Column:
    """Expression-level left-to-right greedy merge of (a, b) in a
    symbol array — the fold mirror of `_merge_pairs_py`."""
    merged = F.lit(a + b)
    empty = F.slice(F.array(F.lit("")), 1, 0)
    return F.aggregate(
        symbols,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train_distributed(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Fully-distributed merge loop (see module docstring for when).

    The subtle greedy-merge correctness point: merging left-to-right
    non-overlapping means "aaa" under pair (a,a) yields [aa, a] — the
    expression fold and the Python reference implement the identical
    rule, pinned by the equality test.
    """
    wf = word_frequencies(df, text_col, lowercase)
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(EOW))
    )
    state = wf.select("word", "freq", syms.alias("symbols")).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        pairs = F.zip_with(
            F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
            F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        best = (
            state.select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        state = state.withColumn(
            "symbols",
            F.when(
                F.array_contains("symbols", a),
                _merge_expr(F.col("symbols"), a, b),
            ).otherwise(F.col("symbols")),
        )
        if (it + 1) % checkpoint_every == 0:
            state = state.localCheckpoint()
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Persistable (rank, left, right, merged) table of a learned
    vocabulary — the artifact a tokenizer ships."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2:]
        )
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — documents encoded with
    the learned merges (lowest-rank merge first, the standard BPE
    encode). Arrow-batched ``mapInPandas`` with the rank dict shipped
    once per task via closure broadcast; per-word results are memoized
    within each batch (Zipf makes the cache hit rate high)."""
    ranks = {p: i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    b_ranks = sc.broadcast(ranks)

    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                text = (text or "")
                if lowercase:
                    text = text.lower()
                toks: list[str] = []
                for w in text.split():
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, rk)
                        cache[w] = got
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_col,
                    "n_tokens": n_col,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        encode_batches, schema=out_schema
    )
