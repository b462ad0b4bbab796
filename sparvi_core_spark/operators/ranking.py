"""Full-text relevance ranking over the corpus: TF-IDF and BM25.

No analog in the reference engine (its surface stops at profiling /
validation; SURVEY.md §2.8) — part of the training-data-pipeline
extension surface: corpus search ("find the documents about X"),
query-anchored quality triage, and near-duplicate *candidate* seeding
by shared rare terms all reduce to a ranked term match.

Scale design (the part that matters at 100 TB):

:func:`bm25_search` never builds an inverted index and never shuffles
the corpus. For a query of Q terms the whole score is a per-row
projection: ``tf_i = size(filter(tokens, t = term_i))`` per query term
(array expressions over the one tokenization), document length from the
same array, and the corpus constants (N, avgdl, df_i) from ONE single-row
aggregate that is broadcast back with a 1-row cross join — the same
agg→literals shape the profiler uses for outlier bounds (J4). The plan
is: scan → project → one-row agg (map-side partials, tree reduction) →
broadcast → project → ``TakeOrderedAndProject`` for the top-k. Zero
wide shuffles, so it scales with the scan. Honest cost accounting: the
corpus IS read twice — once under the stats aggregate, once for the
scored output — both scans column-pruned to (id, text); that is the
price of keeping the constants out of the driver (no collect) and the
plan shuffle-free, and it matches the profiler's two-job outlier shape.

That shape is right for interactive queries (Q ≲ 100s of terms — each
term is one more array-filter pass over the token array). For scoring
against a large term VOCABULARY (thousands of weighted terms), use
:func:`tfidf_vectors`, which explodes tokens once and equi-joins the
(broadcastable) term table — fan-out bounded by matching terms only.

DuckDB oracle parity: the tokenizer is ``lower`` + split on
``[^a-z0-9]+`` — expressible identically in DuckDB
(``regexp_split_to_array``), and scores are rounded so summation-order
ULP drift cannot flip the comparison.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

# lowercase alnum-run tokenizer — the standard IR normalization; the
# same regex works verbatim in DuckDB's regexp_split_to_array for the
# oracle pairs
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


def search_tokens(text_col: str = "text") -> F.Column:
    """``array<string>`` of lowercase alnum tokens (empties dropped)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_PATTERN),
        lambda t: t != "",
    )


def bm25_search(
    docs: DataFrame,
    query: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = 20,
    round_to: int = 6,
) -> DataFrame:
    """Rank documents against ``query`` → (id, bm25, dl, tf_*).

    Okapi BM25 with the Lucene non-negative idf,
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``:

    ``score = Σ_i idf_i · tf_i·(k1+1) / (tf_i + k1·(1 − b + b·dl/avgdl))``

    Documents matching no query term are dropped (score 0 — not a
    result). Ties are broken by id for deterministic output. ``top_n=
    None`` returns every matching document (the filterable-score shape;
    e.g. "drop docs that look like the boilerplate query").

    Per-term tf columns ride along (``tf_<term>``) so callers can see
    WHY a document ranked; duplicate query terms are collapsed (scoring
    a term twice double-counts it in every BM25 formulation — callers
    who want term weighting should use :func:`tfidf_vectors`).
    """
    terms = [query] if isinstance(query, str) else list(query)
    # normalize query terms through the SAME tokenizer as documents;
    # collapse duplicates, keep first-seen order
    seen: dict[str, None] = {}
    for t in terms:
        for piece in re.split(TOKEN_SPLIT_PATTERN, t.lower()):
            if piece and piece not in seen:
                seen[piece] = None
    terms = list(seen)
    if not terms:
        raise ValueError(f"query {query!r} contains no indexable terms")

    # shuffle-free plan (1-row agg→literals + TakeOrdered): a compact
    # input would otherwise tokenize and score in ONE task — fan out
    # first (no-op at scale; measured sf0.1: 1.8 s → 0.8 s)
    from sparvi_core_spark.plans.fanout import fan_out_compact

    docs = fan_out_compact(docs)
    toks = search_tokens(text_col)
    tf_cols = [f"tf_{t}" for t in terms]

    # closure factory, NOT a default-arg lambda: a two-parameter lambda
    # would be treated by F.filter as its (element, index) form
    def _tf(term: str) -> F.Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        *[_tf(t).alias(c) for t, c in zip(terms, tf_cols)],
    )

    # ONE single-row aggregate carries every corpus constant: N, avgdl,
    # and df per query term (docs containing it). Broadcast back as a
    # 1-row cross join — agg→literals, no driver action, no shuffle.
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(c) > 0).cast("long")).alias(f"df_{t}")
            for t, c in zip(terms, tf_cols)
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    n, avgdl = F.col("n_docs").cast("double"), F.col("avgdl")
    score = F.lit(0.0)
    for t, c in zip(terms, tf_cols):
        tf = F.col(c).cast("double")
        df = F.col(f"df_{t}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        score = score + idf * (tf * (k1 + 1.0)) / F.when(norm != 0, norm).otherwise(
            F.lit(1.0)
        )

    out = (
        scored.filter(
            sum((F.col(c) for c in tf_cols[1:]), F.col(tf_cols[0])) > 0
        )
        .select(
            F.col("id").alias(id_col),
            F.round(score, round_to).alias("bm25"),
            "dl",
            *tf_cols,
        )
        .orderBy(F.desc("bm25"), F.col(id_col))
    )
    return out.limit(top_n) if top_n is not None else out


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Sparse TF-IDF weights: one row per (doc, term) → ``tfidf``.

    ``tf = count(term in doc) / dl``, ``idf = ln((1+N)/(1+df)) + 1``
    (sklearn's smoothed formulation — never zero, so rare-term weight
    is preserved).

    Plan: tokenize once, explode, count per (id, term) — one shuffle on
    the composite key, map-side combined; df per term rides a second
    small groupBy over the already-reduced (id, term) frame; corpus N
    joins back as a broadcast 1-row agg. At 100 TB the (id, term) frame
    is the classic inverted-index build — linear in corpus tokens, and
    ``min_df`` prunes hapax noise before the join back.
    """
    toks = search_tokens(text_col)
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    tf = exploded.groupBy("id", "dl", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df = df.filter(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    joined = tf.join(df, "term").crossJoin(F.broadcast(n_docs))
    idf = (
        F.log(
            (F.lit(1.0) + F.col("n_docs").cast("double"))
            / (F.lit(1.0) + F.col("df").cast("double"))
        )
        + 1.0
    )
    tfidf = (F.col("n").cast("double") / F.col("dl")) * idf
    return joined.select(
        F.col("id").alias(id_col),
        "term",
        F.col("n").alias("tf"),
        "df",
        F.round(tfidf, round_to).alias("tfidf"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    weights: list[float] | None = None,
    query_col: str | None = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    top_n: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al. SIGIR'09) of N ranked
    lists — the standard way hybrid search merges lexical (BM25) and
    vector (ANN) rankings without score calibration:

    ``rrf_score(d) = Σ_lists w_l / (k + rank_l(d))``

    Each input needs (``query_col``, ``id_col``, ``rank_col``) —
    exactly what :func:`bm25_search` (per-query via a literal
    query_id), ``similarity.cosine_topk`` and
    ``binary_sketch.hamming_topk`` emit. A document absent from a list
    simply contributes nothing (the defining property: RRF needs no
    score normalization across heterogeneous retrievers).
    ``query_col=None`` fuses single-query lists. ``n_lists`` rides
    along (how many retrievers surfaced the doc). Ties break by id.

    Scale: the inputs are already top-k-bounded per query (Q×k rows
    each), so the union + one map-side-combined groupBy + per-query
    window run on candidate-pool-sized data, never corpus-sized —
    fusion cost is independent of corpus size by construction.
    """
    if not rankings:
        raise ValueError("rankings must be a non-empty list")
    w = weights if weights is not None else [1.0] * len(rankings)
    if len(w) != len(rankings):
        raise ValueError(
            f"got {len(w)} weights for {len(rankings)} rankings"
        )
    keys = ([query_col] if query_col else []) + [id_col]
    parts = []
    for df, wi in zip(rankings, w):
        contrib = F.lit(float(wi)) / (
            F.lit(int(k)) + F.col(rank_col).cast("double")
        )
        parts.append(df.select(*keys, contrib.alias("contrib")))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = un.groupBy(*keys).agg(
        F.round(F.sum("contrib"), round_to).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    win = Window.partitionBy(
        *([query_col] if query_col else [])
    ).orderBy(F.desc("rrf_score"), F.asc(id_col))
    out = fused.withColumn("rank", F.row_number().over(win))
    return out.filter(F.col("rank") <= top_n) if top_n else out
