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
(binary), and for numeric columns ``min/max/sum/sum_sq`` (doubles).
Non-numeric columns carry NULL numeric stats; min/max of strings/dates
ride separately as ``min_str``/``max_str`` (ISO-stringified, so the
summary schema is column-type-independent and batches with drifting
schemas still union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.coltypes import bucket_columns


def partition_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    lg_k: int = 12,
    batch_id: str = "",
) -> DataFrame:
    """One summary row per column for ONE batch: long format
    ``(batch_id, column, n_rows, n_nulls, distinct_sketch, min_str,
    max_str, min, max, sum, sum_sq)``. One map-side-combined
    aggregation over the batch; output size is O(columns)."""
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


def merge_profiles(parts: DataFrame) -> DataFrame:
    """Combine summary rows (any number of batches) into corpus-wide
    per-column stats: exact counts/min/max/mean/stddev plus the HLL
    ``approx_distinct``. Input size is batches × columns — trivially
    small next to the data; this never touches the corpus."""
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
    merged = parts.groupBy("column").agg(
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
    )
    return merged


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
