"""Streaming Count-Min: mergeable counter cells per micro-batch,
point-frequency estimates over any batch range — never a rescan of
the stream.

The batch tier (``operators.sketch.cms_build``) collects the counter
matrix in one pass; a stream can't be rescanned, but CMS matrices ADD
(Cormode & Muthukrishnan 2005 — the same mergeable-summaries contract
as the Misra-Gries store in ``topk_stream``). So each micro-batch
reduces to its own cell frame — at most depth × width rows however
large the batch — appended to a parquet store; any batch range merges
at read time into one :class:`~sparvi_core_spark.operators.sketch.CMSketch`
by summing cells. The one-sided guarantee survives the merge exactly:
estimates never undercount, and the overcount bound e·N/width is
computed from the merged N.

Store shape: ``(batch_id, depth, width, salt, __r, __p, __c)`` —
O(depth × width) per micro-batch. Replayed batches rewrite
byte-identical cells (the kernel is deterministic), and the reader
drops exact duplicate ``(batch_id, __r, __p)`` rows, so the common
replay (append landed, checkpoint didn't) cannot double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparvi_core_spark.operators.sketch import (
    _CMS_SALT,
    _cms_cells,
    _cms_check,
    CMSketch,
)


def cms_stream_batches(
    stream_df: DataFrame,
    cols: str | list[str],
    path: str,
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
    salt: str = _CMS_SALT,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Reduce every micro-batch to its Count-Min cell frame over the
    key ``cols`` and append it to the parquet store at ``path``. Each
    batch costs one scan of JUST the new rows + an O(depth × width)
    write. Returns the started ``StreamingQuery``."""
    _cms_check(depth, width)
    keys = [cols] if isinstance(cols, str) else list(cols)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _cms_cells(batch_df, keys, depth, width, weight_col, salt)
            .select(
                F.lit(int(batch_id)).alias("batch_id"),
                F.lit(int(depth)).alias("depth"),
                F.lit(int(width)).alias("width"),
                F.lit(salt).alias("salt"),
                "__r",
                "__p",
                "__c",
            )
            .write.mode("append")
            .parquet(path)
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def cms_from_store(
    spark: SparkSession,
    path: str,
    min_batch_id: int | None = None,
    max_batch_id: int | None = None,
) -> CMSketch:
    """Merge the stored per-batch cells (optionally restricted to a
    batch-id range) into one :class:`CMSketch` — identical to
    ``cms_build`` over the concatenated batches (pinned in tests).
    Raises if the store mixes geometries or salts (those sketches are
    not addable)."""
    cells = spark.read.parquet(path)
    if min_batch_id is not None:
        cells = cells.filter(F.col("batch_id") >= min_batch_id)
    if max_batch_id is not None:
        cells = cells.filter(F.col("batch_id") <= max_batch_id)
    geoms = [
        (r["depth"], r["width"], r["salt"])
        for r in cells.select("depth", "width", "salt").distinct().collect()
    ]
    if not geoms:
        raise ValueError(
            f"no stored batches in range at {path} "
            f"(min={min_batch_id}, max={max_batch_id})"
        )
    if len(geoms) > 1:
        raise ValueError(
            f"store mixes sketch geometries/salts, not mergeable: {geoms}"
        )
    depth, width, salt = geoms[0]
    merged = (
        cells.dropDuplicates(["batch_id", "__r", "__p"])  # replay guard
        .groupBy("__r", "__p")
        .agg(F.sum("__c").alias("__c"))
        .collect()
    )
    counts = [[0] * width for _ in range(depth)]
    for r in merged:
        counts[r["__r"]][r["__p"]] = int(r["__c"])
    return CMSketch(
        counts=tuple(tuple(row) for row in counts),
        depth=int(depth),
        width=int(width),
        salt=salt,
        n_items=sum(counts[0]) if depth else 0,
    )
