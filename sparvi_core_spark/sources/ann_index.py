"""IVF index ON STORAGE — the ANN-at-100-TB layout: corpus vectors
written as parquet hive-partitioned by their IVF cell, so a search
touches only the probed cells' files via PARTITION PRUNING at the
scan. This is the piece that turns the in-memory IVF operators
(`operators.similarity`) into a serving path: at rest, a query with
nprobe=2 over k=4096 cells reads ~0.05% of the corpus bytes — the
scan never sees the rest, which is strictly better than any
post-scan filter.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- **Write once, prune forever.** `write_ivf_index` pays one
  assignment pass (broadcast centroids, `ivf_assign` — no corpus
  shuffle beyond the partitioned-write exchange) and one
  cluster-by-cell write. Every subsequent search is
  scan-of-probed-cells only; the pruning happens in the file listing,
  before a single corpus byte moves (plan-pinned: `PartitionFilters`
  carries the bucket predicate, and `inputFiles()` shrinks to the
  probed cells).
- **Self-describing index.** Centroids ride INSIDE the index dir as
  `_centroids/` parquet (underscore-prefixed → invisible to the data
  scan), plus `_ivf_manifest.json` (k, dim, column names, row count,
  per-cell rows — the skew report). A reader needs only the path.
- **File sizing is a knob, not an accident.** `files_per_bucket`
  salts the pre-write repartition so each cell lands in a bounded
  number of files — one file per cell for small indexes, more when a
  cell would otherwise exceed a task's appetite. Mega-cell skew is
  visible in the manifest and fixable by re-clustering (the
  `curation` module's job), not hidden by the writer.
- **Search cost model.** probe (tiny query side × broadcast
  centroids) → prune (file listing) → `cosine_topk_bucketed` on the
  surviving cells (per-cell equi-join + top-k, BLAS engine opt-in).
  Driver state is O(#probed cells) bucket ids — bounded by k, never
  by the corpus or the query count.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_ivf_manifest.json"
CENTROIDS_DIR = "_centroids"


def write_ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    files_per_bucket: int = 1,
) -> dict:
    """Assign every vector to its nearest centroid and write the
    corpus parquet-partitioned by cell (``bucket=<i>/`` dirs), with
    the centroid table and a manifest stored inside the index.
    Carries ALL of ``vectors``' columns (payload included), so
    retrieving a search hit's payload is a lookup INSIDE the pruned
    cells — never a second full-corpus scan. NULL vectors get no cell
    (``ivf_assign``'s contract) and are NOT indexed — their count is
    recorded in the manifest as ``dropped_null``. Returns the
    manifest dict."""
    from sparvi_core_spark.operators.similarity import ivf_assign
    from sparvi_core_spark.sources.writers import _hadoop_write_text

    if files_per_bucket < 1:
        raise ValueError(
            f"files_per_bucket must be >= 1, got {files_per_bucket}"
        )
    for c in ("bucket", "__slice"):
        if c in vectors.columns:
            raise ValueError(f"vectors already has a {c!r} column")
    spark = vectors.sparkSession
    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias(id_col), "bucket")
    data = vectors.join(assigned, id_col)
    # one task-group per (cell, slice): each cell lands in at most
    # files_per_bucket files regardless of input layout
    slice_col = F.pmod(
        F.xxhash64(F.col(id_col), F.lit("ivf-slice")),
        F.lit(files_per_bucket),
    )
    (
        data.withColumn("__slice", slice_col)
        .repartition(F.col("bucket"), F.col("__slice"))
        .drop("__slice")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
    cent = centroids.select("bucket", "centroid")
    cent.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{CENTROIDS_DIR}"
    )
    # per-cell rows: one groupBy over the assignment, k rows collected
    per_cell = {
        int(r["bucket"]): int(r["n"])
        for r in assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    dim_row = cent.select(F.size("centroid").alias("d")).first()
    n_vectors = sum(per_cell.values())
    manifest = {
        "format": "sparvi-ivf-index/1",
        "id_col": id_col,
        "vec_col": vec_col,
        "k": cent.count(),
        "dim": int(dim_row["d"]) if dim_row else None,
        "n_vectors": n_vectors,
        "dropped_null": vectors.count() - n_vectors,
        "files_per_bucket": files_per_bucket,
        "rows_per_bucket": {str(b): n for b, n in sorted(per_cell.items())},
    }
    _hadoop_write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    files_per_bucket: int | None = None,
) -> dict:
    """The daily ingest operation: assign a NEW batch against the
    STORED centroids and append it into the existing cell partitions —
    no rebuild, and no existing file is rewritten (parquet append into
    ``bucket=<i>/`` dirs). The manifest is updated in place:
    ``rows_per_bucket``/``n_vectors``/``dropped_null`` accumulate and
    ``appends`` counts the batches, so cell skew and growth stay
    visible across the index's life. Returns the updated manifest.

    Centroids are NOT moved by an append (that would silently
    invalidate every prior assignment); watch
    :func:`ivf_index_health`'s ``mean_distance`` creep to decide when
    a re-train + rewrite is due. Single-writer by contract — plain
    parquet has no commit protocol, so two concurrent appends race on
    the manifest (same as every bare-parquet append pipeline)."""
    from sparvi_core_spark.operators.similarity import ivf_assign
    from sparvi_core_spark.sources.writers import _hadoop_write_text

    spark = new_vectors.sparkSession
    _, cents, manifest = read_ivf_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    fpb = manifest["files_per_bucket"] if files_per_bucket is None else files_per_bucket
    if fpb < 1:
        raise ValueError(f"files_per_bucket must be >= 1, got {fpb}")
    for c in (id_col, vec_col):
        if c not in new_vectors.columns:
            raise ValueError(
                f"new_vectors is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    for c in ("bucket", "__slice"):
        if c in new_vectors.columns:
            raise ValueError(f"new_vectors already has a {c!r} column")
    # dim check BEFORE any file lands: one tiny agg over the batch
    dims = new_vectors.select(
        F.min(F.size(vec_col)).alias("lo"), F.max(F.size(vec_col)).alias("hi")
    ).first()
    if dims["lo"] is not None and (
        dims["lo"] != manifest["dim"] or dims["hi"] != manifest["dim"]
    ):
        raise ValueError(
            f"batch vector dims [{dims['lo']}, {dims['hi']}] do not match "
            f"the index dim {manifest['dim']}"
        )
    assigned = ivf_assign(
        new_vectors, cents, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias(id_col), "bucket")
    data = new_vectors.join(assigned, id_col)
    slice_col = F.pmod(
        F.xxhash64(F.col(id_col), F.lit("ivf-slice")),
        F.lit(fpb),
    )
    (
        data.withColumn("__slice", slice_col)
        .repartition(F.col("bucket"), F.col("__slice"))
        .drop("__slice")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )
    per_cell = {
        int(r["bucket"]): int(r["n"])
        for r in assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_new = sum(per_cell.values())
    rows = dict(manifest["rows_per_bucket"])
    for b, n in per_cell.items():
        rows[str(b)] = rows.get(str(b), 0) + n
    manifest["rows_per_bucket"] = {
        b: rows[b] for b in sorted(rows, key=int)
    }
    manifest["n_vectors"] += n_new
    manifest["dropped_null"] += new_vectors.count() - n_new
    manifest["appends"] = manifest.get("appends", 0) + 1
    _hadoop_write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def ivf_index_health(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell report over the STORED index (one row per centroid:
    n, frac, mean/p95/max distance — `operators.ann_health.ivf_health`
    on the index's own files). The append-pipeline's "when do I
    rebuild" gauge: ``mean_distance`` creeping up across appends means
    centroid drift; ``frac`` spread means hot cells. Full-scan audit
    by design — run it at audit cadence, not per query."""
    from sparvi_core_spark.operators.ann_health import ivf_health

    data, cents, manifest = read_ivf_index(spark, path)
    return ivf_health(
        data.drop("bucket"),
        cents,
        id_col=manifest["id_col"],
        vec_col=manifest["vec_col"],
    )


def read_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, dict]:
    """Open an index: ``(data, centroids, manifest)``. ``data`` is the
    full partitioned corpus frame (bucket column included — filter it
    yourself or use :func:`search_ivf_index`, which prunes)."""
    from sparvi_core_spark.sources.writers import _hadoop_read_text

    manifest = json.loads(_hadoop_read_text(spark, path, MANIFEST))
    if manifest.get("format") != "sparvi-ivf-index/1":
        raise ValueError(
            f"{path}/{MANIFEST} is not a sparvi-ivf-index/1 manifest"
        )
    data = spark.read.parquet(path)
    cents = spark.read.parquet(f"{path}/{CENTROIDS_DIR}")
    return data, cents, manifest


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    engine: str = "expr",
) -> DataFrame:
    """Top-k cosine search against a stored index, reading ONLY the
    probed cells: queries are probed into their ``nprobe`` nearest
    centroids (broadcast — queries are the small side by contract),
    the distinct probed cell ids (≤ k, driver-bounded) become a
    partition-pruning ``bucket IN (...)`` on the index scan, and
    `cosine_topk_bucketed` finishes per cell. Same output contract as
    ``cosine_topk_ivf`` on the same (vectors, centroids, nprobe) —
    asserted in tests — but the non-probed cells never leave disk.
    Query frame must carry the manifest's ``id_col``/``vec_col``."""
    from sparvi_core_spark.operators.similarity import (
        cosine_topk_bucketed,
        ivf_assign_probes,
    )

    data, cents, manifest = read_ivf_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    for c in (id_col, vec_col):
        if c not in queries.columns:
            raise ValueError(
                f"queries is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    qp = ivf_assign_probes(
        queries, cents, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias(id_col), "bucket")
    qp = qp.cache()  # probed twice: distinct cells + the query join
    probed = sorted(
        r["bucket"] for r in qp.select("bucket").distinct().collect()
    )  # bounded by k centroids
    pruned = data.filter(F.col("bucket").isin(probed))
    q = queries.select(id_col, vec_col).join(qp, id_col)
    return cosine_topk_bucketed(
        pruned,
        q,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col="bucket",
        engine=engine,
    )
