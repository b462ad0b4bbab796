"""Continuous validation: the reference's rule DSL applied to every
micro-batch of a stream, with results appended to a queryable store.

The reference validates a table on demand (validator.py:67-139 runs
each rule's SQL once against the warehouse). On a live ingest the
question changes from "is the table valid?" to "was THIS batch valid,
and when did rules start failing?" — per-batch validation catches a
bad deploy/upstream change at the batch that introduced it, instead
of diluting it into a full-table scan hours later.

Mechanics: each micro-batch is registered as the rule SQL's temp view
(so the SAME YAML/JSON rules run unmodified batch or streaming — the
engine's standard unification contract), the full runner executes
(defaulting, comparator pairs, per-rule error isolation all
inherited), and one row per rule lands in the parquet store:
``(batch_id, name, is_valid, actual_value, expected_value, error)``.
The store is the monitoring surface: "failures by rule over the last
N batches" is a tiny parquet scan, never a replay of the stream.

Caveats, stated honestly: rules that reference OTHER tables still see
the batch for ``view_name`` but the full registered view for the
others (cross-table rules become batch×reference checks — usually
what you want for FK-style rules); rules about global properties
(e.g. total row count thresholds) are per-batch properties here — use
the profile summary store (``profiler.incremental``) for
corpus-since-forever questions.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


def validate_stream_batches(
    stream_df: DataFrame,
    rules: list[dict[str, Any]],
    view_name: str,
    path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Run ``rules`` (the reference rule DSL) against every micro-batch
    of ``stream_df``, registered as temp view ``view_name``; append one
    result row per (batch, rule) to the parquet store at ``path``.

    Returns the started ``StreamingQuery``. ``available_now=True``
    drains the current source and stops — the test/backfill trigger.
    """
    from sparvi_core_spark.validations.runner import run_validations

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.createOrReplaceTempView(view_name)
        results = run_validations(spark, rules)
        rows = [
            (
                int(batch_id),
                r["name"],
                bool(r["is_valid"]),
                # actual/expected stringified: rule values are
                # heterogeneous (ints, floats, between-pairs) and the
                # store needs one stable schema
                None if r.get("actual_value") is None else str(r["actual_value"]),
                json.dumps(r.get("expected_value")),
                r.get("error"),
            )
            for r in results
        ]
        spark.createDataFrame(
            rows,
            "batch_id long, name string, is_valid boolean, "
            "actual_value string, expected_value string, error string",
        ).write.mode("append").parquet(path)

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def validation_history(
    spark: SparkSession,
    path: str,
    min_batch_id: int | None = None,
) -> DataFrame:
    """Per-rule pass/fail rollup over the stored batches: ``(name,
    n_batches, n_failed, first_failed_batch, last_failed_batch)`` —
    the "when did this rule start failing?" query, O(store size)."""
    store = spark.read.parquet(path)
    if min_batch_id is not None:
        store = store.filter(F.col("batch_id") >= min_batch_id)
    failed = F.when(~F.col("is_valid"), F.col("batch_id"))
    return store.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.count_if(~F.col("is_valid")).alias("n_failed"),
        F.min(failed).alias("first_failed_batch"),
        F.max(failed).alias("last_failed_batch"),
    )
