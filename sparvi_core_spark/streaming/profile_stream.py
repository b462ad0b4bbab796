"""Structured Streaming surface: windowed quality profiling over streams.

The reference has no streaming at all (SURVEY §2.8) — this is the
Spark-native extension for stream-shaped tables like ``events``:
continuous per-window data-quality metrics (the same null/count/numeric
families the batch profiler computes) with watermarked late-data
handling.

The transformation is defined once and applied identically to batch and
streaming DataFrames — unit tests assert batch/stream result equality
via the ``availableNow`` trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce a ``TIMESTAMP_NTZ`` event-time column to ``TIMESTAMP``.

    Watermarks and stateful streaming operators require ``TIMESTAMP``
    event time; parquet written without UTC adjustment (plain
    pandas/pyarrow writers) reads back as NTZ in Spark 4. The cast
    reinterprets the wall clock in the session timezone — the engine
    pins ``spark.sql.session.timeZone=UTC`` (session.py), so it is an
    exact, DST-free relabeling. Applied to batch AND streaming inputs so
    the batch/stream unification contract (identical output schemas)
    holds.
    """
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_quality_metrics(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window profile: counts, null counts, numeric min/max/avg.

    Works on both batch and streaming inputs (watermark is only applied
    to streaming inputs — required there for state cleanup; a batch
    DataFrame ignores it).
    """
    numeric_cols = numeric_cols or []
    group_cols = group_cols or []
    df = ensure_event_time(df, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.round(F.avg(c), 4).alias(f"avg_{c}"),
        ]
    out = df.groupBy(
        F.window(F.col(ts_col), window).alias("w"), *group_cols
    ).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("w", *group_cols)],
    )


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory/file.

    Schema is mandatory for streaming file sources; it is taken from a
    batch read of the same path (driver-side metadata only). Nanosecond
    parquet timestamps get the same long→timestamp conversion the batch
    registry applies, so downstream transformations are identical.
    """
    import os
    import tempfile

    from sparvi_core_spark.session import _nanos_timestamp_columns

    raw_schema = spark.read.parquet(path).schema
    stream_path = path
    if os.path.isfile(path):
        # streaming file sources monitor a DIRECTORY; expose a single
        # file through a symlink in a scratch dir
        d = tempfile.mkdtemp(prefix="sparvi_stream_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        stream_path = d
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stream_path)
    for c in _nanos_timestamp_columns(path):
        df = df.withColumn(
            c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))")
        )
    return df


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
):
    """Drain a stream into an in-memory table via availableNow (test /
    batch-backfill harness; production sinks are parquet/kafka).

    Returns the terminated ``StreamingQuery`` — its ``recentProgress``
    carries per-batch watermark / late-row-drop / state-size metrics."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
