"""Cross-document duplicated-span detection (exact substring dedup).

The published result (Lee et al., "Deduplicating Training Data Makes
Language Models Better") deduplicates at the SUBSTRING level: a ~50
token span appearing in more than one document is memorization fuel
even when the documents as wholes are unrelated — whole-doc near-dup
(MinHash) and doc-local repetition (``repetition_stats``) both miss it.
The reference engine has nothing in this family; this is part of the
training-data-pipeline extension surface.

The suffix-array construction of the paper is single-machine; the
distributable equivalent is rolling token windows: every W-token
window, hashed, grouped for document frequency. That is what this
module implements, Spark-first:

- **Linear, never doc×doc**: windows explode to O(total tokens) rows
  (the inherent cost of substring-level screening — the same as the
  paper's suffix array input), but the shuffle carries 32-byte md5
  keys, the doc-frequency groupBy gets map-side partial aggregation,
  and flagged windows come back to documents via a LEFT SEMI join on
  the hash — no pair enumeration anywhere, so a window shared by 10⁶
  docs costs 10⁶ rows, not 10¹² pairs.
- **Exact coverage, one per-doc window pass**: overlapping flagged
  windows are merged into maximal spans with a running-max-end interval
  sweep partitioned by doc — per-task memory is bounded by one
  document's windows, the same bound as reading the doc.
- md5 (not a faster hash) keeps the operator oracle-checkable across
  engines — the module-wide convention from ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparvi_core_spark.operators.dedup import tokens_col


def _windows(
    docs: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(id, pos, whash) for every ``window``-token span; pos is the
    0-based start token index. Docs shorter than ``window`` emit
    nothing."""
    toks = tokens_col(text_col)
    m = F.size(toks) - (window - 1)
    acc = F.slice(toks, 1, m)
    for j in range(2, window + 1):
        acc = F.zip_with(
            acc, F.slice(toks, j, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return (
        docs.filter(F.size(toks) >= window)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(acc).alias("pos", "__w"),
        )
        .select("id", "pos", F.md5(F.col("__w")).alias("whash"))
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = 50,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans per document: ``(id, span_start,
    span_end)`` in token offsets (end exclusive), where every
    ``window``-token window inside the span appears in ≥ ``min_docs``
    documents. Overlapping flagged windows are merged.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    w = _windows(docs, id_col, text_col, window)
    flagged_hashes = (
        w.groupBy("whash")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("whash")
    )
    flagged = w.join(flagged_hashes, on="whash", how="left_semi").select(
        "id", "pos", (F.col("pos") + window).alias("end")
    )
    ww = Window.partitionBy("id").orderBy("pos")
    # a new maximal span starts when this window begins past the
    # furthest end seen so far (two projections: a window expression
    # cannot nest inside another window function's argument)
    prev_end = F.max("end").over(ww.rowsBetween(Window.unboundedPreceding, -1))
    marked = flagged.withColumn(
        "__new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("long")
    )
    seg = F.sum("__new").over(ww.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marked.withColumn("__seg", seg)
        .groupBy("id", "__seg")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select("id", "span_start", "span_end")
    )


def substring_dup_stats(
    docs: DataFrame,
    window: int = 50,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span report — the filterable score:
    ``(id, n_tokens, dup_spans, dup_tokens, dup_token_frac)``. Every
    input document appears (zero rows of coverage → zeros), so the
    result joins back 1:1 for threshold filtering (the paper's
    train-time policy: drop or trim documents dominated by duplicated
    spans)."""
    spans = duplicated_spans(docs, window, min_docs, id_col, text_col)
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        base.join(per_doc, on="id", how="left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    window: int = 50,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The paper's TRIM policy: excise every duplicated span from the
    text instead of dropping whole documents (ExactSubstr's deletion
    mode — the tool removes every occurrence of a duplicated
    substring; keeping one canonical copy is a policy layer callers
    can add by anti-joining a winner per span hash before this).

    Returns ``(id, text, n_tokens_removed)`` for EVERY input document:

    - docs with no flagged spans pass their text through BYTE-IDENTICAL
      (no re-tokenization damage on the untouched 99%+ of the corpus);
    - trimmed docs are rebuilt as the surviving tokens joined by single
      spaces — whitespace-normalized by construction, same as the
      token-sequence view the span offsets are defined on (newlines
      inside removed-adjacent text are not preserved; run this BEFORE
      line-structure-sensitive stages);
    - a fully-covered doc becomes the empty string (filter on
      ``text != ''`` for the paper's drop-when-nothing-left behavior).

    Scale shape: :func:`duplicated_spans` (linear window explode,
    hash-keyed shuffle) + per-doc span arrays collected by one groupBy
    (bounded: merged spans per doc ≤ tokens/window), broadcast-joined
    back, and the excision itself is one map-side ``filter`` with the
    element index tested against the span array — no shuffle beyond
    the span computation, no Python.
    """
    spans = duplicated_spans(docs, window, min_docs, id_col, text_col)
    per_doc = spans.groupBy("id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    toks = tokens_col(text_col)
    rhs = per_doc.select(F.col("id").alias("__rid"), "__spans")
    joined = docs.join(
        rhs, docs[id_col] == rhs["__rid"], "left"
    ).drop("__rid")
    inside = lambda i: F.exists(
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    kept = F.filter(toks, lambda x, i: ~inside(i))
    removed = F.aggregate(
        F.col("__spans"),
        F.lit(0).cast("bigint"),
        lambda acc, sp: acc + (sp["e"] - sp["s"]),
    )
    return joined.select(
        F.col(id_col).alias("id"),
        F.when(F.col("__spans").isNull(), F.col(text_col))
        .otherwise(F.array_join(kept, " "))
        .alias("text"),
        F.coalesce(removed, F.lit(0)).cast("bigint").alias(
            "n_tokens_removed"
        ),
    )


def dedup_paragraphs(
    docs: DataFrame,
    min_df: int = 2,
    keep: str = "first",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide PARAGRAPH dedup — the Dolma/RefinedWeb stage
    between whole-doc near-dup and substring span trimming: a
    paragraph (``\\n\\n``-separated, trimmed, empties dropped)
    appearing in ≥ ``min_df`` documents is boilerplate fuel (cookie
    banners, license blocks, navigation) and is excised from every
    document — except, under ``keep="first"``, its one canonical
    occurrence (globally smallest ``(doc id, position)``), Dolma's
    seen-before semantics made deterministic; ``keep="none"`` removes
    every occurrence (the paper's strict mode).

    Returns ``(id, text, n_paras_kept, n_paras_removed)`` for EVERY
    input document:

    - docs with no removed paragraphs pass their text BYTE-IDENTICAL
      (the untouched bulk of the corpus is never rewritten);
    - rewritten docs are the surviving paragraphs re-joined with
      ``\\n\\n`` (paragraph-internal text untouched; the original
      inter-paragraph whitespace is canonicalized by construction);
    - NULL text stays NULL with zero counts.

    Scale shape: one posexplode to (md5, id, pos) rows — the shuffle
    carries 32-byte hashes, never paragraph text — one map-side-
    combined doc-frequency groupBy, an inner hash-join back (flagged
    hashes only), one per-doc position collect (bounded by a doc's
    paragraph count), and the rewrite is a map-side indexed filter.
    No pair enumeration: a paragraph shared by 10⁶ docs costs 10⁶
    rows. md5 keys keep it oracle-checkable (module convention).
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    paras = F.filter(
        F.transform(F.split(F.col(text_col), r"\n\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    exploded = docs.select(
        F.col(id_col).alias("id"), F.posexplode(paras).alias("pos", "p")
    ).select("id", "pos", F.md5("p").alias("phash"))
    flagged = (
        exploded.groupBy("phash")
        .agg(
            F.count_distinct("id").alias("df"),
            F.min(F.struct(F.col("id"), F.col("pos"))).alias("keeper"),
        )
        .filter(F.col("df") >= min_df)
        .select("phash", "keeper")
    )
    removals = exploded.join(flagged, "phash")
    if keep == "first":
        removals = removals.filter(
            (F.col("id") != F.col("keeper.id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
    per_doc = removals.groupBy("id").agg(
        F.collect_list("pos").alias("__drop"),
        F.count(F.lit(1)).alias("__n_removed"),
    )
    rhs = per_doc.select(
        F.col("id").alias("__rid"), "__drop", "__n_removed"
    )
    joined = docs.join(
        rhs, docs[id_col] == rhs["__rid"], "left"
    ).drop("__rid")
    kept = F.filter(
        paras, lambda x, i: ~F.array_contains(F.col("__drop"), i)
    )
    n_paras = F.size(paras)
    return joined.select(
        F.col(id_col).alias("id"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("__drop").isNull(), F.col(text_col))
        .otherwise(F.array_join(kept, "\n\n"))
        .alias("text"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(n_paras - F.coalesce("__n_removed", F.lit(0)))
        .cast("bigint")
        .alias("n_paras_kept"),
        F.coalesce("__n_removed", F.lit(0)).cast("bigint").alias(
            "n_paras_removed"
        ),
    )
