"""Incremental, mergeable profiles: profile each ingest batch once,
combine sketches later — never rescan the corpus.

The reference profiles a table by scanning it (profile_engine.py runs
its aggregations against the live warehouse table). At 100 TB with
daily ingest that is the wrong shape: the data that arrived in March
hasn't changed by April, but a full profile rescans it anyway. This
module makes profiles ASSOCIATIVE:

- ``partition_profile`` reduces one batch/partition to a tiny
  per-column summary row: exact counts, min/max/sum/sum-of-squares,
  and a Datasketches HLL sketch (``hll_sketch_agg``, Spark >= 3.5) for
  distincts — the one statistic that is NOT naively mergeable as a
  number but IS mergeable as a sketch.
- ``merge_profiles`` combines any set of summary rows with plain sums,
  min/max, and ``hll_union_agg``. Counts and min/max merge exactly.
  The distinct estimate is deterministic and within the sketch's error
  bounds, but NOT bit-identical to a single scan's: Spark's
  Datasketches HLL reports the tighter HIP estimator on a directly-fed
  sketch and falls back to the composite estimator after a union
  (HIP history can't survive merging), so the two differ by ~1σ
  (~1.6% at lg_k=12). Tests pin both against the exact count.

The merged output derives mean and sample stddev from (n, Σx, Σx²).
The Σx² route can lose precision when stddev ≪ |mean| (catastrophic
cancellation: ~15 significant digits in the double accumulator;
fine for profile display, not for metrology). Null-only batches keep
NULL aggregates and merge cleanly.

Stats carried per column: ``n_rows``, ``n_nulls``, ``distinct_sketch``
(binary), ``quantile_sketch`` (Datasketches KLL, numeric columns only),
and for numeric columns ``min/max/sum/sum_sq`` (doubles).
Non-numeric columns carry NULL numeric stats; min/max of strings/dates
ride separately as ``min_str``/``max_str`` (ISO-stringified, so the
summary schema is column-type-independent and batches with drifting
schemas still union).

Quantiles are the other classically non-mergeable statistic (the
reference computes exact ``percentile_cont`` quartiles per scan,
profile_engine.py:340-358); they ride here as a KLL sketch
(``kll_sketch_agg_double``, Spark >= 4.0): mergeable, bounded size
(~<1 KB at k=200), and with a PROVEN rank-error bound (~1.65% at the
default k — Karnin-Lang-Liberty, FOCS'16) rather than a heuristic one.
``merge_profiles`` folds the batch sketches with
``kll_sketch_merge_double`` and reports p25/p50/p75; rank error adds
across merges only logarithmically (the bound holds for any merge
tree). Older summary stores written before this column existed still
merge — the sketch columns are simply absent from the output.

``theta_summary`` / ``theta_overlap`` extend the same
profile-once-merge-later contract to SET questions between corpus
versions or ingest batches ("how many ids/doc-fingerprints are shared /
new / retired?"): theta sketches (``theta_sketch_agg``) support not
just union but INTERSECTION and DIFFERENCE estimates, which HLL cannot
(inclusion-exclusion on HLL unions loses error control). Below ~4k
distincts a theta sketch is in exact mode, so small-table tests pin
exact equality; at scale the estimate carries the published theta error
bounds. ``operators.mixing.corpus_diff`` answers the same question
exactly with a full shuffle of both sides; this is the
O(sketch-size) route when both sides are already profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.coltypes import bucket_columns


def partition_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    lg_k: int = 12,
    batch_id: str = "",
    kll_k: int = 200,
) -> DataFrame:
    """One summary row per column for ONE batch: long format
    ``(batch_id, column, n_rows, n_nulls, distinct_sketch,
    quantile_sketch, min_str, max_str, min, max, sum, sum_sq)``. One
    map-side-combined aggregation over the batch; output size is
    O(columns)."""
    from sparvi_core_spark.plans.fanout import fan_out_compact

    # the wide sketch agg (HLL + KLL per column) is partial-agg bound:
    # a compact batch (few scan partitions) would run it nearly serial
    # (measured sf0.1 lineitem: 5.4 s → 1.3 s). No-op at scale.
    df = fan_out_compact(df)
    cols = cols or df.columns
    numeric = set(bucket_columns(df.schema).numeric)

    per_col = []
    for c in cols:
        v = F.col(c)
        d = v.cast("double") if c in numeric else F.lit(None).cast("double")
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(v.isNull()).alias("n_nulls"),
                F.hll_sketch_agg(v.cast("string"), lg_k).alias(
                    "distinct_sketch"
                ),
                F.kll_sketch_agg_double(d, kll_k).alias("quantile_sketch"),
                F.min(v.cast("string")).alias("min_str"),
                F.max(v.cast("string")).alias("max_str"),
                F.min(d).alias("min"),
                F.max(d).alias("max"),
                F.sum(d).alias("sum"),
                F.sum(d * d).alias("sum_sq"),
            ).alias(f"__p_{c}")
        )
    row = df.agg(*per_col)
    stacked = row.select(
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p")
    )
    return stacked.select(F.lit(batch_id).alias("batch_id"), "p.*")


def merge_profiles(parts: DataFrame, quantiles: list[float] | None = None) -> DataFrame:
    """Combine summary rows (any number of batches) into corpus-wide
    per-column stats: exact counts/min/max/mean/stddev plus the HLL
    ``approx_distinct`` and (when the store carries ``quantile_sketch``)
    KLL-approximate ``p25/p50/p75`` — or any requested ``quantiles``,
    emitted as ``p{100q:g}`` columns. Input size is batches × columns —
    trivially small next to the data; this never touches the corpus.

    Sketch folding: ``kll_sketch_merge_double`` is a pairwise scalar
    function, so the batch sketches fold through ``reduce`` over a
    ``collect_list`` — sound because the input is the SUMMARY table
    (O(batches) tiny binaries per column), never corpus rows, and KLL
    merge is associative with the error bound independent of the merge
    tree shape."""
    n = F.sum("n_rows")
    nn = F.sum("n_nulls")
    s = F.sum("sum")
    ss = F.sum("sum_sq")
    n_vals = (n - nn).cast("double")
    mean = s / n_vals
    # sample variance from the merged power sums
    var = F.when(
        n_vals > 1, (ss - s * s / n_vals) / (n_vals - 1)
    )
    aggs = [
        n.alias("n_rows"),
        nn.alias("n_nulls"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"))
        ).alias("approx_distinct"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev"),
    ]
    if "quantile_sketch" in parts.columns:
        aggs.append(
            F.collect_list("quantile_sketch").alias("__qsketches")
        )
    merged = parts.groupBy("column").agg(*aggs)
    if "quantile_sketch" not in parts.columns:
        return merged
    arr = F.col("__qsketches")
    folded = F.when(
        F.size(arr) > 0,
        F.reduce(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ),
    )
    merged = merged.withColumn("__qmerged", folded).drop("__qsketches")
    qcols = [
        F.when(
            F.kll_sketch_get_n_double(F.col("__qmerged")) > 0,
            F.kll_sketch_get_quantile_double(F.col("__qmerged"), F.lit(q)),
        ).alias(f"p{100 * q:g}")
        for q in (quantiles or [0.25, 0.5, 0.75])
    ]
    return merged.select("*", *qcols).drop("__qmerged")


def theta_summary(
    df: DataFrame,
    cols: list[str] | None = None,
    lg_k: int = 12,
    batch_id: str = "",
) -> DataFrame:
    """Per-column theta sketch of the DISTINCT value set of one batch /
    corpus version: long format ``(batch_id, column, theta_sketch)``.
    One aggregation pass; output is O(columns × sketch size).

    Store these alongside the :func:`partition_profile` rows: unlike
    the HLL distinct sketch, theta sketches later support intersection
    and difference estimates (:func:`theta_overlap`), i.e. "how much of
    version B's key set is new vs version A" without rescanning either
    version. Values are sketched as strings (same canonicalization as
    the HLL column) so any column type participates."""
    from sparvi_core_spark.plans.fanout import fan_out_compact

    df = fan_out_compact(df)  # same partial-agg parallelism floor
    cols = cols or df.columns
    per_col = [
        F.theta_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"__t_{c}")
        for c in cols
    ]
    row = df.agg(*per_col)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__t_{c}").alias("theta_sketch"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select(F.lit(batch_id).alias("batch_id"), "p.*")


def theta_overlap(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set-relationship estimates between two :func:`theta_summary`
    frames (same columns; each may span many batch rows — batches are
    first union-folded per side): per column, estimated distinct counts
    ``n_a``, ``n_b``, ``n_union``, ``n_intersection``, ``n_only_a``
    (A∖B), ``n_only_b`` (B∖A), and ``jaccard``.

    All arithmetic happens on the SKETCHES (theta supports proper
    intersection/difference with error bounds — the reason this column
    exists next to the HLL one); nothing rescans data. Below the
    sketch's nominal-entries threshold (2^lg_k) every estimate is
    exact. Exact-counterpart oracle: ``operators.mixing.corpus_diff``
    (full-shuffle route over the raw tables)."""

    def _fold(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("column").agg(
            F.theta_union_agg(F.col("theta_sketch")).alias(out)
        )

    fa = _fold(a, "__sa")
    fb = _fold(b, "__sb")
    j = fa.join(fb, "column", "inner")
    # intersection of exactly the two per-side sketches: stack the two
    # sketch columns and run the intersection aggregate per column
    stacked = j.select(
        "column",
        F.explode(F.array(F.col("__sa"), F.col("__sb"))).alias("__s"),
    )
    inter = stacked.groupBy("column").agg(
        F.theta_sketch_estimate(
            F.theta_intersection_agg(F.col("__s"))
        ).alias("n_intersection")
    )
    est = j.select(
        "column",
        F.theta_sketch_estimate(F.col("__sa")).alias("n_a"),
        F.theta_sketch_estimate(F.col("__sb")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("__sa"), F.col("__sb"))
        ).alias("n_union"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("__sa"), F.col("__sb"))
        ).alias("n_only_a"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("__sb"), F.col("__sa"))
        ).alias("n_only_b"),
    )
    out = est.join(inter, "column", "inner")
    return out.select(
        "column",
        "n_a",
        "n_b",
        "n_union",
        "n_intersection",
        "n_only_a",
        "n_only_b",
        F.when(
            F.col("n_union") > 0, F.col("n_intersection") / F.col("n_union")
        ).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def profile_stream_batches(
    stream_df: DataFrame,
    path: str,
    cols: list[str] | None = None,
    lg_k: int = 12,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Streaming front end for the mergeable-profile store: every
    micro-batch reduces to its ``partition_profile`` rows (one small
    agg over JUST the new data) appended to a parquet summary table.
    ``merge_profiles(spark.read.parquet(path))`` then answers
    corpus-since-forever questions — the stream is profiled
    continuously without any reprocessing, and the summary table grows
    by O(columns) per micro-batch.

    Returns the started ``StreamingQuery`` (``available_now=True``
    drains the current source and stops — the test/batch-catchup
    trigger; pass False for a continuous run).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            partition_profile(batch_df, cols, lg_k, batch_id=str(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def theta_overlap_matrix(summaries: dict[str, DataFrame]) -> DataFrame:
    """Pairwise value-set overlap across N named corpora/versions from
    their :func:`theta_summary` frames: one row per (column, name_a,
    name_b) with ``n_a``, ``n_b``, ``n_intersection``, ``jaccard``
    (names ordered ``name_a < name_b``; each side union-folded over its
    batch rows first).

    The contamination-matrix view: N corpus versions or split
    members compare in O(N² × columns × sketch) — never a scan of any
    corpus. Intersections use ``theta_intersection_agg`` over the
    per-pair sketch pairs (the proper sketch intersection, not
    inclusion-exclusion); union for jaccard is the pairwise
    ``theta_union``. Exact below 2^lg_k per side.
    """
    if len(summaries) < 2:
        raise ValueError(
            f"need at least 2 summaries, got {len(summaries)}"
        )
    folded = None
    for name, df in summaries.items():
        f = df.groupBy("column").agg(
            F.theta_union_agg(F.col("theta_sketch")).alias("sk")
        ).select(F.lit(name).alias("name"), "column", "sk")
        folded = f if folded is None else folded.unionByName(f)
    a = folded.select(
        F.col("name").alias("name_a"), "column", F.col("sk").alias("ska")
    )
    b = folded.select(
        F.col("name").alias("name_b"), "column", F.col("sk").alias("skb")
    )
    pairs = a.join(b, "column").filter(F.col("name_a") < F.col("name_b"))
    stacked = pairs.select(
        "column", "name_a", "name_b",
        F.explode(F.array(F.col("ska"), F.col("skb"))).alias("sk"),
    )
    inter = stacked.groupBy("column", "name_a", "name_b").agg(
        F.theta_sketch_estimate(
            F.theta_intersection_agg(F.col("sk"))
        ).alias("n_intersection")
    )
    est = pairs.select(
        "column", "name_a", "name_b",
        F.theta_sketch_estimate(F.col("ska")).alias("n_a"),
        F.theta_sketch_estimate(F.col("skb")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("ska"), F.col("skb"))
        ).alias("n_union"),
    )
    return est.join(inter, ["column", "name_a", "name_b"]).select(
        "column", "name_a", "name_b", "n_a", "n_b", "n_intersection",
        F.when(
            F.col("n_union") > 0, F.col("n_intersection") / F.col("n_union")
        ).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def partition_comoments(
    df: DataFrame,
    cols: list[str],
    batch_id: str = "",
) -> DataFrame:
    """Per-batch pairwise co-moment sums for numeric ``cols``: one row
    per unordered column pair ``(batch_id, col_x, col_y, n, sum_x,
    sum_y, sum_xx, sum_yy, sum_xy)`` — everything a Pearson correlation
    needs, and all of it EXACTLY mergeable by addition (no sketch, no
    error bound). ``n`` counts rows where BOTH columns are non-null
    (pairwise deletion, the same convention as ``F.corr``).

    One aggregation over the batch; output is O(cols²) rows. The
    batch-side cost is the same one scan ``numeric_correlations`` pays
    — the difference is it never has to be paid again.
    """
    from sparvi_core_spark.plans.fanout import fan_out_compact

    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns, got {cols!r}")
    df = fan_out_compact(df)
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    per_pair = []
    for x, y in pairs:
        cx = F.col(x).cast("double")
        cy = F.col(y).cast("double")
        both = cx.isNotNull() & cy.isNotNull()
        vx = F.when(both, cx)
        vy = F.when(both, cy)
        per_pair.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.count(vx).alias("n"),
                F.sum(vx).alias("sum_x"),
                F.sum(vy).alias("sum_y"),
                F.sum(vx * vx).alias("sum_xx"),
                F.sum(vy * vy).alias("sum_yy"),
                F.sum(vx * vy).alias("sum_xy"),
            ).alias(f"__c_{x}_{y}")
        )
    row = df.agg(*per_pair)
    stacked = row.select(
        F.explode(
            F.array(*[F.col(f"__c_{x}_{y}") for x, y in pairs])
        ).alias("p")
    )
    return stacked.select(F.lit(batch_id).alias("batch_id"), "p.*")


def merge_comoments(parts: DataFrame) -> DataFrame:
    """Fold co-moment rows from any number of batches into corpus-wide
    Pearson correlations: ``(col_x, col_y, n, corr)``. Plain sums —
    the merged correlation is EXACTLY the single-scan correlation over
    the concatenated rows (pinned in tests), modulo the usual
    power-sum cancellation caveat documented on ``merge_profiles``."""
    g = parts.groupBy("col_x", "col_y").agg(
        F.sum("n").alias("n"),
        F.sum("sum_x").alias("sx"),
        F.sum("sum_y").alias("sy"),
        F.sum("sum_xx").alias("sxx"),
        F.sum("sum_yy").alias("syy"),
        F.sum("sum_xy").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    corr = F.when(
        (n > 1) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )
    return g.select("col_x", "col_y", "n", corr.alias("corr"))
