"""Sink-side helpers: partitioned and bucketed writes.

The reference's sinks are JSON/YAML artifacts (profiles, rules); a
Spark engine's sinks are tables. Two layouts matter at 100 TB:

- **partitioned parquet** (`partitionBy`): partition pruning turns
  predicate pushdown into skipped directories — the first lever for
  scan cost on date/tenant-keyed facts.
- **bucketed tables** (`bucketBy` + `saveAsTable`): co-located joins —
  two tables bucketed on the join key by the same bucket count join
  with NO shuffle exchange on either side (asserted in tests). This is
  the offline answer to the repeated-shuffle-join problem: pay the
  shuffle once at write time, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    df.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    out: str = "shard",
) -> DataFrame:
    """Add the deterministic shard id column (no shuffle, no action):
    ``shard = xxhash64(id, salt) mod n_shards`` — a pure function of
    the row, reproducible off-cluster from (id, salt, n_shards)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        out,
        F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(n_shards)).cast(
            "int"
        ),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    salt: str = "shard",
    mode: str = "overwrite",
    fmt: str = "parquet",
    rows_per_shard: int | None = None,
    tokens_col: str | None = None,
) -> dict:
    """Export a corpus as exactly ``n_shards`` shard directories
    (``shard=K/part-*``), the layout training dataloaders consume (one
    worker per shard, resumable by shard id). Pass ``rows_per_shard``
    instead of ``n_shards`` to derive the count from one corpus scan
    (``ceil(rows / rows_per_shard)``).

    Three properties a ``df.repartition(n).write`` does NOT give:

    - **Deterministic membership**: ``shard_assignment`` above — a
      pure function of the row, so re-running the export (or
      re-exporting after an upstream re-run) puts every document in
      the same shard, and appending new docs moves nobody. Round-robin
      repartition depends on input partitioning and is not
      reproducible.
    - **Deterministic within-shard order**: rows are sorted inside each
      shard by a second keyed hash — a reproducible global shuffle,
      which is exactly what sequential shard readers need (stable
      batches across re-exports, no correlated-document runs from
      upstream ordering).
    - **One file per shard**: the write is repartitioned BY the shard
      column into ``n_shards`` partitions, so each directory holds a
      single part file (every row of shard K routes to one partition;
      ``spark.sql.files.maxRecordsPerFile`` can split it if set).
      Balance follows hash uniformity (CV ~ 1/√(docs/shard)).

    One shuffle total. ``partitionBy`` directories mean a reader can
    open shard K with partition pruning (``WHERE shard = K``).

    Returns — and writes to ``<path>/_manifest.json`` — a manifest the
    loader can trust without listing the store::

        {"n_shards": N, "rows": total, "tokens": total_or_null,
         "salt": ..., "id_col": ..., "format": ...,
         "shards": [{"shard": k, "rows": r, "tokens": t_or_null}, ...]}

    Every shard id in ``range(n_shards)`` appears (an empty shard —
    possible only for tiny corpora — appears with ``rows=0``), and the
    per-shard stats are one groupBy over the SAME frame that was
    written.
    """
    if (n_shards is None) == (rows_per_shard is None):
        raise ValueError("pass exactly one of n_shards / rows_per_shard")
    if rows_per_shard is not None:
        if rows_per_shard < 1:
            raise ValueError(
                f"rows_per_shard must be >= 1, got {rows_per_shard}"
            )
        total = df.count()
        n_shards = max(1, -(-total // rows_per_shard))
    sharded = shard_assignment(df, n_shards, id_col=id_col, salt=salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        # leading with the partition column satisfies FileFormatWriter's
        # required ordering — otherwise it injects its own (unstable)
        # sort by partition columns and destroys the keyed order
        .sortWithinPartitions(
            "shard", F.xxhash64(F.col(id_col), F.lit(salt + "|ord"))
        )
        .write.mode(mode)
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )

    agg = [F.count(F.lit(1)).alias("rows")]
    if tokens_col is not None:
        agg.append(F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
    stats = {
        r["shard"]: r for r in sharded.groupBy("shard").agg(*agg).collect()
    }
    def _tok(k):
        # a shard whose tokens_col is all-NULL sums to NULL — report it
        # as None (unknown), never crash on int(None)
        if tokens_col is None or k not in stats:
            return None
        t = stats[k]["tokens"]
        return int(t) if t is not None else None

    shards = [
        {
            "shard": k,
            "rows": int(stats[k]["rows"]) if k in stats else 0,
            "tokens": _tok(k),
        }
        for k in range(n_shards)
    ]
    manifest = {
        "n_shards": n_shards,
        "rows": sum(s["rows"] for s in shards),
        # total over the shards with KNOWN token counts (None = unknown)
        "tokens": (
            sum(s["tokens"] for s in shards if s["tokens"] is not None)
            if tokens_col is not None
            else None
        ),
        "salt": salt,
        "id_col": id_col,
        "format": fmt,
        "shards": shards,
    }
    import json

    _hadoop_write_text(
        df.sparkSession, path, "_manifest.json", json.dumps(manifest)
    )
    return manifest


def _hadoop_write_text(spark, dir_path: str, name: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so the
    destination can be ANY scheme the data write supports (s3a://,
    hdfs://, file:) — a local ``open()`` would crash on remote stores
    after the shards were already written.

    Torn-write-safe (r11): manifests and stream-intent markers are the
    indexes' commit points, and a bare ``fs.create(overwrite)`` that
    dies mid-write leaves a half-written JSON — an unreadable index.
    Protocol here: write the FULL content to a hidden ``.{name}.tmp``,
    delete the target, rename the tmp over it. A crash mid-tmp-write
    leaves the old file intact (tmp is garbage, overwritten by the
    next attempt); a crash between the delete and the rename leaves
    the fully-written tmp, which :func:`_hadoop_read_text` falls back
    to (and heals) — so a reader always sees either the old or the new
    content, never a torn file."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path, name)
    tmp = jvm.org.apache.hadoop.fs.Path(dir_path, f".{name}.tmp")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(
            f"atomic text write failed: rename {tmp} -> {p} returned "
            f"false (the fully-written tmp is left for the read-side "
            f"fallback)"
        )


def _hadoop_read_text(spark, dir_path: str, name: str) -> str:
    """Read a small text file written by :func:`_hadoop_write_text`.
    If the target is missing but its fully-written ``.{name}.tmp``
    exists, a writer crashed between its delete and its rename —
    finish the swap (rename tmp into place) and read the result."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path, name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        tmp = jvm.org.apache.hadoop.fs.Path(dir_path, f".{name}.tmp")
        if fs.exists(tmp) and fs.rename(tmp, p):
            pass  # healed the crashed writer's swap
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def read_manifest(path: str, spark=None) -> dict:
    """Load the shard manifest written by ``write_training_shards``.

    With a ``spark`` session the read goes through the Hadoop
    FileSystem API (any scheme: s3a://, hdfs://, file:); without one it
    falls back to the local filesystem."""
    import json

    if spark is not None:
        return json.loads(_hadoop_read_text(spark, path, "_manifest.json"))
    import os

    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (requires a warehouse dir /
    catalog — bucketing metadata lives in the catalog, not in parquet)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustered layout — multi-dimensional data skipping
# ---------------------------------------------------------------------------
#
# Sorting a table by one column gives file-level min/max skipping on
# THAT column only. Interleaving the bits of several columns' bucket
# ranks (the Morton / Z-order curve — public technique, used by Delta
# OSS `OPTIMIZE ZORDER BY`) keeps every z-column's value range narrow
# within each file, so a parquet reader's row-group/file pruning works
# for predicates on ANY of them. At 100 TB the write is one stats pass
# (quantile sketch, map-side combined) + one range shuffle — the same
# cost as a global sort, paid once, and every later scan with a
# selective predicate on a z column skips most files.


def interleave_bits(bucket_cols: list, bits: int):
    """Morton code: interleave ``bits`` low bits of each int column.
    Column j contributes bit i to output position ``i * k + j``.
    Requires ``bits * len(cols) <= 63`` (fits a signed long)."""
    k = len(bucket_cols)
    if k == 0:
        raise ValueError("need at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*cols = {bits * k} exceeds 63")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def _rank_expr(bnds: list, v, lo: int, hi: int):
    """upper-bound binary search over sorted literal boundaries:
    returns the count of boundaries <= ``v`` as a nested-WHEN tree."""
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        v >= F.lit(float(bnds[mid])), _rank_expr(bnds, v, mid + 1, hi)
    ).otherwise(_rank_expr(bnds, v, lo, mid))


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    mode: str = "quantile",
) -> "F.Column":
    """Z-order key over numeric columns.

    Per-column bucket ranks come from ONE stats pass over ``df``:
    ``mode="quantile"`` uses ``approx_percentile`` boundaries (robust
    to skew — equal-population buckets), ``mode="uniform"`` uses
    min/max with ``width_bucket``. Ranks are then bit-interleaved.
    NULLs rank in bucket 0. Numeric columns only — cast dates and
    timestamps to epoch numbers first.
    """
    n_buckets = 1 << bits
    if mode == "quantile":
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = df.agg(
            *[
                # low sketch accuracy on purpose: boundaries only need
                # ±1-bucket precision, and the default (10000) makes
                # the stats pass the dominant cost at 255 quantiles
                F.percentile_approx(
                    F.col(c).cast("double"), qs, 8 * n_buckets
                ).alias(c)
                for c in cols
            ]
        ).first()
        bucket_cols = []
        for c in cols:
            bnds = [b for b in (row[c] or []) if b is not None]
            v = F.col(c).cast("double")
            # rank = number of boundaries <= v (0 .. n_buckets-1), as a
            # balanced binary-search CASE WHEN tree: log2(n) codegen'd
            # comparisons per row. (A higher-order filter() over the
            # boundary array is interpreted per element — measured 14×
            # slower end-to-end at 255 boundaries.) NULL v fails every
            # >= test and lands in rank 0.
            bucket_cols.append(_rank_expr(bnds, v, 0, len(bnds)))
    elif mode == "uniform":
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).first()
        bucket_cols = []
        for c in cols:
            mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
            if mn is None or mx is None or mx <= mn:
                bucket_cols.append(F.lit(0))
                continue
            wb = (
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(mn), F.lit(mx),
                    F.lit(n_buckets),
                )
                - 1
            )
            # width_bucket returns n_buckets+1 for v == max; clamp
            bucket_cols.append(
                F.coalesce(
                    F.least(wb, F.lit(n_buckets - 1)), F.lit(0)
                )
            )
    else:
        raise ValueError(f"mode must be 'quantile' or 'uniform', got {mode!r}")
    return interleave_bits(bucket_cols, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 64,
    bits: int = 8,
    mode: str = "quantile",
    write_mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_files`` files clustered on the Z-order
    curve of ``zorder_cols``: one stats pass + one range shuffle
    (``repartitionByRange`` samples the z-key to build balanced
    ranges), rows sorted by z within each file so row-group stats are
    tight too.

    Both pre-shuffle passes (the stats agg and the range-boundary
    sampling + z-key compute) run at the INPUT's parallelism, so a
    compact input is fanned out first (``plans.fanout``; measured
    sf0.1 lineitem: 7.3 s → 4.7 s; no-op at scale)."""
    from sparvi_core_spark.plans.fanout import fan_out_compact

    df = fan_out_compact(df)
    z = zorder_key(df, zorder_cols, bits=bits, mode=mode)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(write_mode)
        .format(fmt)
        .save(path)
    )


def zone_map(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max for ``cols`` — the zone map a skipping reader
    (parquet footer pruning) effectively sees. One column-pruned scan."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        )
    )


def skipping_ratio(zmap: DataFrame, col: str, lo, hi) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` scan can skip
    outright from the zone map (file range disjoint from the query
    range). The quantitative evidence for a layout choice."""
    total, skipped = (
        zmap.agg(
            F.count(F.lit(1)),
            F.count_if(
                (F.col(f"max_{col}") < F.lit(lo))
                | (F.col(f"min_{col}") > F.lit(hi))
            ),
        ).first()
    )
    return (skipped / total) if total else 0.0
