"""Streaming distribution-drift monitor: continuous PSI against a
frozen baseline, with zero reprocessing.

``functions.stats.psi_drift_report`` compares two SNAPSHOTS by
rescanning both sides. On a live 100 TB ingest that shape re-reads
ever-growing history every time someone asks "are we drifting?". This
module makes drift MERGEABLE, the same contract as
``profiler.incremental``:

- ``fit_drift_baseline`` runs ONCE over the reference snapshot: per
  numeric column, equi-height bin boundaries (reference quantiles, the
  same right-closed rule as ``psi_drift_report``) and the reference
  bin counts. Output is O(columns × bins) — a baseline you can store
  next to the checkpoint and reuse across job restarts.
- ``drift_stream_batches`` reduces each micro-batch to its binned
  counts against those FIXED boundaries (map-only bin expression + a
  tiny groupBy over just the new rows) and appends them to a parquet
  summary store. The stream is never rescanned; the store grows by
  O(columns × bins) per micro-batch.
- ``drift_report`` answers PSI-per-column for ANY batch subset (all
  history, last N batches, a backfill range) by SUMMING stored counts
  — binned counts are exactly mergeable, so the reported PSI over a
  union of micro-batches is identical to a from-scratch PSI over the
  concatenated rows, not an approximation of it (pinned in
  tests/test_drift_stream.py against ``psi_drift_report``).

Boundary freezing is what makes this sound: PSI terms from different
micro-batches are only addable when every batch was binned against the
SAME boundaries. That is also the operationally right semantics for
monitoring — the question is "does live traffic still look like the
reference?", so the reference defines the bins, not the drifting
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def fit_drift_baseline(
    ref: DataFrame,
    columns: list[str] | None = None,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
    categorical_cols: list[str] | None = None,
    top_categories: int = 20,
) -> DataFrame:
    """Freeze a drift baseline from a reference snapshot: one row per
    (column, bin) with the binning spec and the reference count. Long
    format ``(column, bin, n_ref, bounds array<double>,
    categories array<string>)`` — the spec columns are repeated per
    row so the frame is self-contained (write it with
    ``.write.parquet`` and reload with ``spark.read.parquet``; it is
    O(columns × bins)).

    Numeric ``columns`` bin by reference quantiles (``approx=True``
    flips the quantile pass to the GK sketch — the 100 TB path; the
    binning itself is exact either way). ``categorical_cols`` bin by
    the reference's ``top_categories`` most frequent values (ties
    broken by value for determinism) with every other value — and
    values unseen at baseline time — clamped into one OTHER bucket;
    the analog of the numeric edge-bin clamp, so category churn shows
    up as mass moving into OTHER rather than a schema error.
    """
    from pyspark.sql import types as T

    empty_schema = (
        "column string, bin int, n_ref bigint, "
        "bounds array<double>, categories array<string>"
    )
    # explicitness is tracked PER SIDE: passing only categorical_cols
    # must not subject the auto-discovered numeric columns to the
    # strict no-spec check (an all-NULL numeric field anywhere in the
    # frame would spuriously raise), and vice versa
    columns_explicit = columns is not None
    cats_explicit = categorical_cols is not None
    if columns is None:
        columns = [
            f.name
            for f in ref.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    categorical_cols = categorical_cols or []
    if not columns and not categorical_cols:
        return ref.sparkSession.createDataFrame([], empty_schema)

    parts = []
    bounds: dict[str, list[float]] = {}
    if columns:
        ps = [i / bins for i in range(1, bins)]

        def qexpr(c: str):
            e = (
                F.percentile_approx(c, ps, accuracy)
                if approx
                else F.percentile(c, ps)
            )
            return e.alias(c)

        brow = ref.agg(*[qexpr(c) for c in columns]).first()
        bounds = {
            c: [float(b) for b in brow[c]]
            for c in columns
            if brow[c] is not None
        }
    cats: dict[str, list[str]] = {}
    for c in categorical_cols:
        top = (
            ref.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(top_categories)
            .collect()
        )
        if top:
            cats[c] = [r["v"] for r in top]
    # a column the CALLER asked to monitor but that yields no binning
    # spec (all-NULL, or empty reference) must not silently vanish
    # from the baseline — it would never be monitored and nobody would
    # know. Auto-discovered columns (columns=None) may be skipped:
    # nothing specific was requested.
    dropped = (
        [c for c in columns if c not in bounds] if columns_explicit else []
    ) + (
        [c for c in categorical_cols if c not in cats] if cats_explicit else []
    )
    if dropped:
        raise ValueError(
            f"fit_drift_baseline: no binning spec computable for "
            f"requested column(s) {dropped} (all-NULL or empty "
            "reference) — these columns would be silently "
            "unmonitored. Drop them from the request or fix the "
            "reference snapshot."
        )
    if not bounds and not cats:
        return ref.sparkSession.createDataFrame([], empty_schema)
    counts = _binned_counts(ref, bounds, cats).withColumnRenamed("n", "n_ref")
    bmap = (
        F.create_map(
            *[
                x
                for c, bs in bounds.items()
                for x in (F.lit(c), F.array(*[F.lit(b) for b in bs]))
            ]
        )
        if bounds
        else F.lit(None).cast("map<string,array<double>>")
    )
    cmap = (
        F.create_map(
            *[
                x
                for c, vs in cats.items()
                for x in (F.lit(c), F.array(*[F.lit(v) for v in vs]))
            ]
        )
        if cats
        else F.lit(None).cast("map<string,array<string>>")
    )
    return counts.withColumn("bounds", bmap[F.col("column")]).withColumn(
        "categories", cmap[F.col("column")]
    )


def _bounds_map(baseline: DataFrame) -> tuple[dict[str, list[float]], dict[str, list[str]]]:
    has_cats = "categories" in baseline.columns
    sel = ["column", "bounds"] + (["categories"] if has_cats else [])
    bounds: dict[str, list[float]] = {}
    cats: dict[str, list[str]] = {}
    for r in baseline.select(*sel).distinct().collect():
        if r["bounds"] is not None:
            bounds[r["column"]] = list(r["bounds"])
        elif has_cats and r["categories"] is not None:
            cats[r["column"]] = list(r["categories"])
    return bounds, cats


def _binned_counts(
    df: DataFrame,
    bounds: dict[str, list[float]],
    cats: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(column, bin, n) for one frame against FIXED specs — numeric
    columns use the same right-closed bin rule as ``psi_drift_report``;
    categorical columns map listed values to their index and everything
    else (incl. values unseen at baseline time) to the OTHER bucket
    (index = len(categories)). NULLs in a column contribute nothing to
    that column."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            sum(
                ((F.col(c) > F.lit(float(b))).cast("int") for b in bs),
                F.lit(0),
            ).alias("bin"),
        )
        for c, bs in bounds.items()
    ]
    for c, vs in (cats or {}).items():
        v = F.col(c).cast("string")
        idx = F.array_position(F.array(*[F.lit(x) for x in vs]), v)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(v.isNull(), F.lit(None).cast("int")).otherwise(
                    F.when(idx > 0, (idx - 1).cast("int")).otherwise(
                        F.lit(len(vs))  # OTHER bucket
                    )
                ).alias("bin"),
            )
        )
    return (
        df.select(F.explode(F.array(*structs)).alias("cb"))
        .filter(F.col("cb.bin").isNotNull())
        .groupBy(
            F.col("cb.column").alias("column"), F.col("cb.bin").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_stream_batches(
    stream_df: DataFrame,
    baseline: DataFrame,
    path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Reduce every micro-batch to its binned counts against the
    frozen ``baseline`` and append them to the parquet store at
    ``path`` as ``(batch_id, column, bin, n)``.

    The bin expression is map-side only; the per-batch groupBy touches
    just the new rows. Returns the started ``StreamingQuery``
    (``available_now=True`` drains the current source and stops — the
    test/backfill trigger; pass False for a continuous run).
    """
    bounds, cats = _bounds_map(baseline)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _binned_counts(batch_df, bounds, cats)
            .select(F.lit(int(batch_id)).alias("batch_id"), "column", "bin", "n")
            .write.mode("append")
            .parquet(path)
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def drift_report(
    spark: SparkSession,
    path: str,
    baseline: DataFrame,
    min_batch_id: int | None = None,
    max_batch_id: int | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-column PSI of the streamed traffic (optionally restricted to
    a ``batch_id`` range) against the baseline: ``(column, psi, n_ref,
    n_cur)``, same reading as ``psi_drift`` (< 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted).

    Exact, not approximate: summing the stored per-batch bin counts
    reproduces precisely the counts a single scan of those batches'
    rows would produce, so this matches ``psi_drift_report`` run on
    the concatenated data with the same boundaries. Cost is O(store
    size) = O(batches × columns × bins); the raw stream is never
    touched.
    """
    store = spark.read.parquet(path)
    if min_batch_id is not None:
        store = store.filter(F.col("batch_id") >= min_batch_id)
    if max_batch_id is not None:
        store = store.filter(F.col("batch_id") <= max_batch_id)
    cur = store.groupBy("column", "bin").agg(F.sum("n").alias("n_cur"))
    ref = baseline.select("column", "bin", "n_ref")
    per_bin = ref.join(cur, ["column", "bin"], "full_outer").select(
        "column",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = per_bin.groupBy("column").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    fr = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    fc = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return (
        per_bin.join(tot, "column")
        .filter(F.col("t_cur") > 0)
        .select(
            "column",
            ((fc - fr) * F.log(fc / fr)).alias("term"),
            "t_ref",
            "t_cur",
        )
        .groupBy("column", "t_ref", "t_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            "column",
            "psi",
            F.col("t_ref").alias("n_ref"),
            F.col("t_cur").alias("n_cur"),
        )
    )
