"""Corpus-level boilerplate line removal (CCNet-style line dedup).

Doc-LOCAL repetition is handled by
:func:`~sparvi_core_spark.functions.text.repetition_stats`; this module
removes lines that repeat ACROSS documents — navigation chrome, cookie
banners, footers — which per-document filters cannot see (each copy
looks unique inside its page). The published recipe (CCNet; also used
in RefinedWeb/Gopher pipelines) drops every line whose document
frequency exceeds a threshold, keeping the rest of the page.

No analog in the reference engine — part of the
training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- ONE corpus-scale shuffle computes line document-frequencies:
  lines are keyed by ``md5`` digest, so the exchange carries 32-byte
  keys, not page-length strings (md5 rather than a faster hash keeps
  the operator oracle-checkable across engines — the module-wide
  convention from ``operators.dedup``); ``count_distinct(doc)`` gets
  map-side partial aggregation.
- The flagged-line frame (lines OVER the threshold) is small by
  definition — boilerplate is the heavy tail's head — and joins back
  against the exploded lines on the 32-byte key; AQE picks broadcast
  when it fits.
- Reassembly is one ``groupBy(doc)`` of the surviving lines with an
  order-preserving sorted ``collect_list`` — per-doc memory is the
  document itself, the same bound as reading it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_doc_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Document frequency of every distinct (trimmed) line:
    ``(line_key, line, doc_freq)``. Lines shorter than
    ``min_line_chars`` after trimming are ignored (blank separators and
    one-character lines are not boilerplate evidence)."""
    lines = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
    ).select("__doc", F.trim(F.col("__raw")).alias("line"))
    lines = lines.filter(F.length("line") >= min_line_chars)
    return (
        lines.groupBy(F.md5(F.col("line")).alias("line_key"))
        .agg(
            F.first("line").alias("line"),
            F.count_distinct("__doc").alias("doc_freq"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 10,
    min_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Strip every line appearing in ≥ threshold documents; returns
    ``docs`` with ``text_col`` rebuilt from the surviving lines (same
    columns, same row count — a fully-boilerplate page becomes the
    empty string; chain a quality filter to drop it).

    Threshold = ``min_docs``, or ``max(min_docs, ceil(min_frac ×
    n_docs))`` when ``min_frac`` is given (one count job to resolve the
    corpus size). Lines shorter than ``min_line_chars`` are never
    removed. Line order and intra-doc blank lines below the length
    floor are preserved.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    threshold = min_docs
    if min_frac is not None:
        if not 0.0 < min_frac <= 1.0:
            raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
        import math

        n_docs = docs.count()
        threshold = max(min_docs, math.ceil(min_frac * n_docs))
    flagged = (
        line_doc_frequencies(docs, id_col, text_col, min_line_chars)
        .filter(F.col("doc_freq") >= threshold)
        .select("line_key")
    )
    exploded = docs.select(
        *[F.col(c) for c in docs.columns],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    trimmed = F.trim(F.col("__line"))
    keyed = exploded.withColumn(
        "__key",
        F.when(F.length(trimmed) >= min_line_chars, F.md5(trimmed)),
    )
    survivors = keyed.join(
        flagged, keyed["__key"] == flagged["line_key"], "left_anti"
    )
    other_cols = [c for c in docs.columns if c != text_col]
    rebuilt = (
        survivors.groupBy(F.col(id_col).alias("__gid"))
        .agg(
            *[F.first(c).alias(c) for c in other_cols if c != id_col],
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
            ).alias(text_col),
        )
    )
    # docs whose EVERY line was flagged vanish from the grouped frame;
    # restore them with empty text so row count is invariant
    rebuilt = rebuilt.withColumnRenamed("__gid", id_col).select(*docs.columns)
    all_ids = docs.select(*[c for c in docs.columns if c != text_col])
    emptied = all_ids.join(
        rebuilt.select(F.col(id_col).alias("__kept")),
        all_ids[id_col] == F.col("__kept"),
        "left_anti",
    ).withColumn(text_col, F.lit("")).select(*docs.columns)
    return rebuilt.unionByName(emptied)
