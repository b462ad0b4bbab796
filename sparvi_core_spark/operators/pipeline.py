"""End-to-end training-corpus preparation: the engine's operators
composed into the standard LLM-data pipeline shape:

    quality-score → quality-filter → near-dup detection → survivor keep

One call produces the cleaned corpus plus a per-stage attrition report —
the numbers a data curator actually monitors.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.functions.text import quality_features
from sparvi_core_spark.operators.dedup import dedup_clusters, minhash_dedup_pairs


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    dedup_threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    keep_cache: bool = False,
    broadcast_losers_max: int = 4_000_000,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (clean_df, report).

    clean_df: surviving rows of ``docs`` plus a ``quality_score``
    column. Near-dup clusters keep their minimum-id member (the
    deterministic survivor from ``dedup_clusters``).

    report: {input_docs, low_quality_dropped, near_dup_dropped,
    output_docs, near_dup_clusters}.

    All heavy stages are the scale-hardened operators (LSH candidate
    join, CC label propagation). The survivor anti-join's broadcast is
    SIZE-GATED, never assumed: ``losers`` is every near-dup
    non-survivor, which on a duplicate-heavy corpus is a large fraction
    of all documents — an unconditional broadcast hint would OOM the
    driver at scale. ``losers`` is counted first (cheap: it derives
    from the checkpointed cluster labels) and hinted only when at most
    ``broadcast_losers_max`` rows; above that the anti-join shuffles
    ids and AQE picks the strategy.

    ``keep_cache=True`` leaves the intermediate quality-filtered frame
    persisted so the caller's immediate write of ``clean`` is a cache
    scan; the handle is returned as ``report["cache"]`` — unpersist it
    (not ``spark.catalog.clearCache()``) when done. With the default
    ``False`` the cache is released before returning and the caller's
    first action recomputes the quality join once.
    """
    n_input = docs.count()

    q = quality_features(docs, id_col, text_col).select(
        F.col("id"), F.col("quality_score")
    )
    scored = docs.join(
        q, docs[id_col] == q["id"], "left"
    ).drop("id")
    kept_quality = scored.filter(
        F.coalesce(F.col("quality_score"), F.lit(0.0)) >= min_quality
    )
    # consumed by the count, the MinHash+LSH stage, and the final
    # anti-join — materialize ONCE instead of recomputing the quality
    # join three times (persist, not localCheckpoint: spillable to disk
    # and evictable, which is what you want for a corpus-sized frame)
    kept_quality = kept_quality.persist()
    n_quality = kept_quality.count()

    pairs = minhash_dedup_pairs(
        kept_quality,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=dedup_threshold,
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster")).select("id")
    n_clusters = clusters.select("cluster").distinct().count()
    n_losers = losers.count()

    # losers can be corpus-sized (20-50% of docs on a duplicate-heavy
    # corpus), so the broadcast hint is applied only under a measured
    # row count; otherwise the anti-join shuffles ids only — cheap —
    # and AQE still broadcasts at runtime if the size estimate allows.
    right = F.broadcast(losers) if n_losers <= broadcast_losers_max else losers
    clean = kept_quality.join(
        right,
        kept_quality[id_col] == losers["id"],
        "left_anti",
    )
    n_output = clean.count()

    report = {
        "input_docs": n_input,
        "low_quality_dropped": n_input - n_quality,
        "near_dup_dropped": n_quality - n_output,
        "near_dup_clusters": n_clusters,
        "output_docs": n_output,
    }
    if keep_cache:
        report["cache"] = kept_quality
    else:
        kept_quality.unpersist()
    return clean, report
