"""Text-analysis functions for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all built-in expressions (split / filter /
regexp), no Python UDFs, so they run inside whole-stage codegen and
are DuckDB-oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: ties break toward the earlier language.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
    "es": ["el", "la", "de", "los", "las", "un", "una", "es", "en", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "den", "von", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "不"],
}

PUNCT_PATTERN = r"[.,!?;:]"
# BPE-ish tokenization: word pieces, digit runs, single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text_col: str) -> F.Column:
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def _stop_hits(tokens: F.Column, words: list[str]) -> F.Column:
    """Occurrence count (dups counted) of tokens in a stopword list."""
    stops = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stops, t)))


def language_scores(text_col: str = "text") -> dict[str, F.Column]:
    toks = _tokens(text_col)
    return {lang: _stop_hits(toks, words) for lang, words in STOPWORDS.items()}


def predicted_language(text_col: str = "text") -> F.Column:
    """Argmax of stopword-hit scores; unscored docs → 'und'.

    Expressed as a greatest-of chain so it stays a single projection.
    """
    scores = language_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # build the CASE in reverse so earlier languages win ties
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_score_expr(text_col: str = "text") -> F.Column:
    """The composite quality score as a single column expression:
    0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio),
    rounded to 4. Shared by ``quality_features`` and
    ``operators.pipeline.prepare_corpus`` (which attaches it with
    ``withColumn`` — a projection, no join)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_PATTERN), F.lit(0))
    )
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    tok_d = F.greatest(n_tokens, F.lit(1))
    chr_d = F.greatest(F.length(F.col(text_col)), F.lit(1))
    return F.round(
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * (stop_hits / tok_d)
        + 0.3 * (1 - punct / chr_d),
        4,
    )


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score (rounded, deterministic):

    - n_tokens: whitespace tokens
    - avg_token_len: chars-without-spaces / tokens
    - punct_ratio: punctuation chars / total chars
    - stopword_ratio: en-stopword occurrences / tokens
    - quality_score: 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio
      + 0.3·(1 − punct_ratio)
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    no_space = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_PATTERN), F.lit(0))
    )
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    # empty-doc guard: clamp denominators to 1 so empty/whitespace-only
    # documents get zeroed features instead of a divide-by-zero error
    tok_d = F.greatest(n_tokens, F.lit(1))
    chr_d = F.greatest(F.length(F.col(text_col)), F.lit(1))
    avg_token_len = F.round(no_space / tok_d, 4)
    punct_ratio = F.round(punct / chr_d, 4)
    stop_ratio = F.round(stop_hits / tok_d, 4)
    score = quality_score_expr(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    ws = F.size(_tokens(text_col))
    bpe = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_ish_tokens"),
    )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Content fingerprint per doc: lexicographic-min md5 over word
    n-gram shingles (a 1-hash MinHash — robust to reordering of a small
    fraction of the doc, cheap to compute in one explode+groupBy)."""
    from sparvi_core_spark.operators.dedup import shingles

    sh = shingles(df, id_col, text_col, n)
    return sh.groupBy("id").agg(
        F.min(F.md5(F.concat(F.lit("fp|"), F.col("shingle")))).alias("fingerprint")
    )


def normalize_text(text_col: str = "text") -> F.Column:
    """Canonical text form for exact-dup detection across formatting
    noise: lowercase, punctuation stripped, whitespace collapsed+trimmed.
    Pure built-ins — runs inside codegen."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        predicted_language(text_col).alias("predicted_lang"),
    )
