"""Text-analysis functions for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all built-in expressions (split / filter /
regexp), no Python UDFs, so they run inside whole-stage codegen and
are DuckDB-oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


# Ordered PII redaction rules. Patterns are kept in the common subset of
# Java regex (Spark) and RE2 (DuckDB/Go): no lookaround, no
# backreferences — which is what makes redaction oracle-checkable and
# portable to other engines. Order matters: emails first (so their
# digit runs are never half-eaten by the phone rules), then the
# dotted/dashed numeric shapes from most to least specific.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # E.164-style international numbers, then separator-style local ones
    ("phone_intl", r"\+\d{7,15}\b", "<PHONE>"),
    ("phone_us", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(text_col: str = "text") -> F.Column:
    """Replace common PII shapes (emails, IPv4s, SSNs, phone numbers)
    with typed placeholder tokens — the standard scrubbing pass before
    corpus text is used for training.

    A chain of ``regexp_replace`` calls (one per :data:`PII_PATTERNS`
    rule, applied in order) — a single codegen projection, no shuffle,
    no Python. Heuristic by design: it redacts the unambiguous textual
    shapes; entity-level NER is out of scope for an expression.
    """
    c = F.col(text_col)
    for _, pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def redact_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc redacted text: (id, text) with :func:`redact_pii` applied."""
    return df.select(
        F.col(id_col).alias("id"), redact_pii(text_col).alias("text")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 2,
) -> DataFrame:
    """Within-document repetition signals, per the published quality
    filters for LLM training corpora (duplicate-line and top-n-gram
    character fractions, as used by the Gopher/MassiveText and C4
    cleaning rules):

    - ``n_lines``: non-empty (after trim) newline-separated lines.
    - ``dup_line_frac``: line occurrences beyond the first occurrence
      of their text, over all line occurrences.
    - ``dup_line_char_frac``: characters in those beyond-first
      occurrences, over characters in all line occurrences.
    - ``top_gram``: the most frequent word ``gram_n``-gram (ties break
      to the lexicographically greatest gram — deterministic).
    - ``top_gram_count``: its occurrence count.
    - ``top_gram_char_frac``: count × len(gram) over total text chars —
      the fraction of the document spent repeating its favourite
      phrase.

    High values of any fraction mark boilerplate/spam for the quality
    filter. All ratios are rounded to 4 for engine-portable comparison.

    Plan shape (scales linearly — no per-doc quadratic work, no
    all-pairs): two explodes (lines, grams) each followed by a
    two-level aggregation with map-side partials, then one equi-join on
    the doc id. Docs with no qualifying lines/grams keep a row with
    zeroed fractions (left joins from the id spine).
    """
    from sparvi_core_spark.operators.dedup import shingles

    ids = df.select(F.col(id_col).alias("id"), F.length(F.col(text_col)).alias("__chars"))

    # NB: the explicit lambda matters — F.trim has an optional second
    # parameter, so passing it bare makes transform() feed the element
    # INDEX into it as the trim-character set
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    line_stats = (
        df.select(F.col(id_col).alias("id"), F.explode(lines).alias("line"))
        .groupBy("id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("line"))
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.sum(F.col("cnt") - 1).alias("dup_occ"),
            F.sum((F.col("cnt") - 1) * F.col("len")).alias("dup_chars"),
            F.sum(F.col("cnt") * F.col("len")).alias("line_chars"),
        )
    )

    gram_counts = (
        shingles(df, id_col, text_col, gram_n)
        .groupBy("id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gram_stats = gram_counts.groupBy("id").agg(
        F.max(
            F.struct(
                F.col("cnt").alias("c"),
                (F.col("cnt") * F.length("shingle")).alias("chars"),
                F.col("shingle").alias("g"),
            )
        ).alias("top")
    )

    out = (
        ids.join(line_stats, "id", "left")
        .join(gram_stats, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            F.round(
                F.coalesce(
                    F.col("dup_occ") / F.greatest(F.col("n_lines"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(
                    F.col("dup_chars") / F.greatest(F.col("line_chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("dup_line_char_frac"),
            F.col("top.g").alias("top_gram"),
            F.coalesce(F.col("top.c"), F.lit(0)).cast("bigint").alias("top_gram_count"),
            F.round(
                F.coalesce(
                    F.col("top.chars") / F.greatest(F.col("__chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("top_gram_char_frac"),
        )
    )
    return out


def strip_markup(text_col: str = "text") -> F.Column:
    """Plain text from HTML-ish markup: drop script/style blocks whole,
    strip tags, decode the common entities, collapse whitespace — the
    pre-tokenization extraction step of a web-corpus pipeline.

    Deliberately regex-based, not a DOM parse: a real HTML parser is a
    per-row Python library call (the slow path, and no lxml in minimal
    clusters); the regex chain runs inside whole-stage codegen and
    covers the overwhelmingly common cases. Patterns stay in the
    Java-regex ∩ RE2 ∩ POSIX subset so an identical chain runs in the
    DuckDB oracle (same contract as ``redact_pii``). Malformed nesting
    degrades to leaving text in place — extraction bias is "keep too
    much", never "drop content silently".
    """
    c = F.col(text_col)
    # script/style: content is code, not text — remove block + payload
    # ((?s) so . crosses newlines; non-greedy to the matching close tag)
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    # comments, then any remaining tag
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"</?[a-zA-Z][^>]*>", " ")
    # the five XML predefined entities + nbsp + numeric code points for
    # space-ish chars are the bulk of real-web entity mass
    for ent, rep in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def extract_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, extracted) — :func:`strip_markup` over a corpus."""
    return df.select(
        F.col(id_col).alias("id"), strip_markup(text_col).alias("extracted")
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


def vocab_coverage(
    df: DataFrame,
    k_values: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-coverage curve for vocabulary sizing: for each ``k``, what
    fraction of ALL token occurrences the ``k`` most frequent terms
    cover → (k, vocab_terms, covered_tokens, total_tokens, coverage).
    The standard question before fixing a tokenizer vocab ("does 32k
    cover 99.5%?"). ``vocab_terms`` ≤ k when the corpus has fewer
    distinct terms.

    Scale shape: term counts are one explode + map-side-combined
    groupBy (vocab-sized output); the top-``max(k)`` selection is
    ``orderBy(desc).limit`` — Catalyst plans TakeOrderedAndProject
    (per-partition heaps, merge of k×partitions rows), NEVER a full
    vocab sort; the cumulative sum then runs over a k-bounded frame
    (one small task), and the corpus total rides a broadcast 1-row agg.
    Driver/merge memory is O(max(k)) — fine for real vocab sizes
    (≤ ~1M); ties broken by term for cross-engine determinism.
    """
    if not k_values or any(k < 1 for k in k_values):
        raise ValueError(f"k_values must be positive ints, got {k_values}")
    ks = sorted(set(int(k) for k in k_values))
    toks = _tokens(text_col)
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("term")).limit(ks[-1])
    w = Window.orderBy(F.desc("n"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number().over(w).alias("rank"), F.sum("n").over(w).alias("cum")
    )
    k_df = df.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    # per k: the largest rank ≤ k (vocab may be smaller than k)
    per_k = (
        F.broadcast(k_df)
        .join(ranked, ranked["rank"] <= k_df["k"])
        .groupBy("k")
        .agg(
            F.max("rank").alias("vocab_terms"),
            F.max("cum").alias("covered_tokens"),
        )
    )
    return (
        per_k.crossJoin(F.broadcast(total))
        .select(
            "k",
            "vocab_terms",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens") / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )
