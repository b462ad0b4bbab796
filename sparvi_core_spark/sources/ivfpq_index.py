"""IVF-PQ index ON STORAGE — the billion-scale ANN serving layout:
the corpus is persisted as PQ CODES (``m`` small ints per vector)
hive-partitioned by IVF cell, with the coarse centroids and residual
codebook riding inside the index dir. Search never touches a float
corpus vector: probe → partition-prune the coded scan at the FILE
LISTING → ADC (asymmetric distance computation) over the codes of the
probed cells only → optional exact re-rank of the few survivors from a
separate float store.

This composes the two halves the package already has:
`sources.ann_index` (cell-partitioned storage + pruning, which stores
RAW floats) and `operators.quantization.ivfpq_encode/ivfpq_search`
(the in-memory IVFADC kernels). Why the composition is THE layout at
scale: 1e9 × dim-768 float64 vectors are ~6 TB at rest (3 TB float32),
while m=16 codes + an id are ~25 GB — a ~200× smaller index whose
probed slice fits executor memory at any corpus size. This is the same
reason FAISS's default billion-scale index is IndexIVFPQ.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- **Codes on disk, floats optional.** The data files hold
  ``(id, codes array<int>)`` only; parquet's RLE/bit-packed encoding
  stores each code in ~⌈log2 ks⌉ bits, so the on-disk index is within
  ~2× of the raw ``m·log2(ks)/8`` bytes/vector floor without any
  bespoke binary packing. The float corpus is needed only if exact
  re-rank is requested (``store_floats=True``), and lives in its own
  cell-partitioned ``_floats/`` store so re-rank fetches are pruned
  to the probed cells too.
- **Search cost model.** probe (tiny query side × broadcast
  centroids) → prune (file listing — non-probed cells never leave
  disk, same plan-pinned mechanism as ``search_ivf_index``) →
  per-cell ADC kernel (one ``m × ks`` lookup table per (query, cell),
  ``m`` gathers per candidate — no per-candidate float math) →
  bounded top-k merge. Re-rank adds one pruned join of
  O(queries × rerank) candidate ids against the float store.
- **Write/append mirror the float index's lifecycle.** One
  assignment + residual-encode pass (the BLAS encode engine is
  map-only — zero shuffles before the partitioned-write exchange),
  parquet-append for daily batches (assign + encode the NEW batch
  only, O(batch) never O(index)), manifest accumulation, id
  uniqueness enforced before any file lands. Codebooks are FROZEN at
  write time: appending encodes against the stored codebook (moving
  it would silently corrupt every stored code), so codebook drift is
  a retrain-to-new-path event, exactly like centroid drift in
  ``ann_index.retrain_ivf_index``.
- **Recall envelope.** ADC distances are quantized: the true
  neighbor can lose to a quantization artifact even inside a probed
  cell. ``rerank=R`` (R ≥ k) recovers this by exact-scoring the top-R
  ADC candidates — recall@k is then bounded by cell recall alone
  (the IVF trade-off; raise ``nprobe``). Tests pin the recall
  ordering: rerank ≥ ADC-only on the same probes.

Single-WRITER by contract, like ``append_ivf_index`` — but readers
never quiesce: every verb is snapshot-committed (the ONE manifest
write publishes counts and both stores' live file lists together; see
``sources.ann_index``), so an in-flight search finishes against the
snapshot it planned with and ``vacuum_ivfpq_index`` retires replaced
files after a retention window.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sparvi_core_spark.sources.ann_index import (
    STAGING_DIR,
    _index_fs,
    _locked,
    _locked_df_first,
    _read_text,
    _require_unique_ids,
    _staging_files,
    _write_text,
)

MANIFEST = "_ivfpq_manifest.json"
CENTROIDS_DIR = "_centroids"
CODEBOOK_DIR = "_codebook"
FLOATS_DIR = "_floats"
ROTATION_DIR = "_rotation"
FORMAT = "sparvi-ivfpq-index/2"


def _write_rotation(spark: SparkSession, path: str, rotation) -> int:
    """Persist the OPQ rotation as `_rotation/` parquet (row, vals) —
    a dim × dim float table is too big for the JSON manifest at
    dim-768 (~7 MB) but trivial as one parquet file. Returns dim."""
    dim = len(rotation)
    for row in rotation:
        if len(row) != dim:
            raise ValueError(
                f"rotation must be square, got {dim}x{len(row)}"
            )
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(rotation)]
    spark.createDataFrame(
        rows, "row int, vals array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{ROTATION_DIR}")
    return dim


def _read_rotation(spark: SparkSession, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/{ROTATION_DIR}").collect()
    return [list(r["vals"]) for r in sorted(rows, key=lambda r: r["row"])]


def _slice_col(id_col: str, fpb: int) -> F.Column:
    return F.pmod(
        F.xxhash64(F.col(id_col), F.lit("ivfpq-slice")), F.lit(fpb)
    )


def _encode(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    engine: str,
) -> tuple[DataFrame, DataFrame]:
    """(coded, assignment): ``coded = (id, bucket, codes)`` for every
    non-NULL vector, ``assignment = (id, bucket)`` (the manifest's
    counting frame — identical row set by construction)."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        pq_encode,
    )

    res = ivf_residuals(vectors, centroids, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        res, codebook, id_col="id", vec_col="residual", engine=engine
    )
    assignment = res.select("id", "bucket")
    return codes.join(assignment, "id"), assignment


def write_ivfpq_index(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    files_per_bucket: int = 1,
    store_floats: bool = False,
    engine: str = "blas",
    rotation: list[list[float]] | None = None,
) -> dict:
    """Encode the corpus to residual PQ codes and write them
    parquet-partitioned by IVF cell, with the coarse centroids,
    codebook, and a manifest stored inside the index. Train the
    codebook on residuals (``pq_train(ivf_residuals(...))`` — the
    ``ivfpq_encode`` contract). ``store_floats=True`` additionally
    persists the raw vectors cell-partitioned under ``_floats/`` to
    enable exact re-rank at search time; the coded corpus is what
    every search scans either way. NULL vectors are not indexed
    (counted as ``dropped_null``); ids must be unique and non-null
    (checked before any file lands). Returns the manifest dict.

    ``rotation``: an OPQ orthogonal matrix (``opq_train``). The whole
    index then lives in the ROTATED space — corpus rotated once at
    write (one map-only matmul), centroids/codebook must have been
    trained on rotated vectors, appends and query batches are rotated
    automatically against the stored ``_rotation/`` table. Orthogonal
    rotations preserve L2, so search distances (ADC approximating,
    re-rank exactly) equal original-space distances — pinned in
    tests."""
    from sparvi_core_spark.operators.quantization import (
        _codebook_shape,
        rotate_vectors,
    )

    if files_per_bucket < 1:
        raise ValueError(
            f"files_per_bucket must be >= 1, got {files_per_bucket}"
        )
    for c in ("bucket", "__slice"):
        if c in vectors.columns:
            raise ValueError(f"vectors already has a {c!r} column")
    spark = vectors.sparkSession
    n_rows = _require_unique_ids(vectors, id_col, "vectors")
    m, dsub = _codebook_shape(codebook)
    if rotation is not None:
        if len(rotation) != m * dsub:
            raise ValueError(
                f"rotation is {len(rotation)}x{len(rotation)} but the "
                f"codebook implies dim {m * dsub}"
            )
        rotated = rotate_vectors(
            vectors, rotation, id_col=id_col, vec_col=vec_col
        )
        extra = [c for c in vectors.columns if c not in (id_col, vec_col)]
        # rotate_vectors projects to (id, vec); carry payload through
        vectors = (
            vectors.drop(vec_col).join(rotated, id_col) if extra else rotated
        )
    coded, assignment = _encode(
        vectors, centroids, codebook, id_col, vec_col, engine
    )
    (
        coded.select(
            F.col("id").alias(id_col), "codes", "bucket"
        )
        .withColumn("__slice", _slice_col(id_col, files_per_bucket))
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
    codebook.select("subspace", "code", "centroid").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{CODEBOOK_DIR}")
    if store_floats:
        (
            vectors.join(
                assignment.select(F.col("id").alias(id_col), "bucket"),
                id_col,
            )
            .withColumn("__slice", _slice_col(id_col, files_per_bucket))
            .repartition(F.col("bucket"), F.col("__slice"))
            .drop("__slice")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/{FLOATS_DIR}")
        )
    per_cell = {
        int(r["bucket"]): int(r["n"])
        for r in assignment.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if rotation is not None:
        _write_rotation(spark, path, rotation)
    dim_row = cent.select(F.size("centroid").alias("d")).first()
    ks = codebook.groupBy("subspace").count().agg(F.max("count")).first()[0]
    n_vectors = sum(per_cell.values())
    from sparvi_core_spark.sources.ann_index import (
        _index_fs,
        _physical_cells,
    )

    _, fs, mkpath = _index_fs(spark, path)
    manifest = {
        "format": FORMAT,
        "files": {
            "codes": _physical_cells(fs, mkpath, path),
            "floats": (
                _physical_cells(fs, mkpath, f"{path}/{FLOATS_DIR}")
                if store_floats else {}
            ),
        },
        "staging_files": {"codes": [], "floats": []},
        "tombstone_files": [],
        "id_col": id_col,
        "vec_col": vec_col,
        "k": cent.count(),
        "dim": int(dim_row["d"]) if dim_row else None,
        "m": m,
        "ks": int(ks),
        "dsub": dsub,
        "n_vectors": n_vectors,
        "dropped_null": n_rows - n_vectors,
        "files_per_bucket": files_per_bucket,
        "store_floats": store_floats,
        "rotated": rotation is not None,
        "rows_per_bucket": {str(b): n for b, n in sorted(per_cell.items())},
    }
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def read_ivfpq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """Open an index: ``(coded, centroids, codebook, manifest)``.
    ``coded`` is the full cell-partitioned code frame (bucket column
    included — filter it yourself or use :func:`search_ivfpq_index`,
    which prunes)."""
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    if manifest.get("format") == "sparvi-ivfpq-index/1":
        raise ValueError(
            f"{path}/{MANIFEST} predates snapshot commits "
            f"(sparvi-ivfpq-index/1) — rebuild it with write_ivfpq_index"
        )
    if manifest.get("format") != FORMAT:
        raise ValueError(f"{path}/{MANIFEST} is not a {FORMAT} manifest")
    from sparvi_core_spark.sources.ann_index import (
        _read_staging_names,
        _snapshot_files,
        _snapshot_read,
        _snapshot_staging,
    )

    coded = _snapshot_read(spark, path, _snapshot_files(manifest, "codes"))
    if coded is None:
        coded = spark.read.parquet(path)
    staged = _read_staging_names(
        spark, path, "codes", _snapshot_staging(manifest, "codes")
    )
    if staged is not None:
        # lazy checkpoint, not a second parquet scan under the union
        # (the read_ivf_index rationale: Spark 4.1 DPP mis-plans
        # partition-column joins over unions of two parquet scans)
        coded = coded.unionByName(staged.localCheckpoint(eager=False))
    cents = spark.read.parquet(f"{path}/{CENTROIDS_DIR}")
    codebook = spark.read.parquet(f"{path}/{CODEBOOK_DIR}")
    return coded, cents, codebook, manifest


def _pq_float_rows(
    spark: SparkSession, path: str, manifest: dict
) -> DataFrame:
    """The logical ``_floats/`` side-store: committed snapshot ∪
    committed staged appends."""
    from sparvi_core_spark.sources.ann_index import (
        _read_staging_names,
        _snapshot_files,
        _snapshot_read,
        _snapshot_staging,
    )

    floats = _snapshot_read(
        spark, f"{path}/{FLOATS_DIR}", _snapshot_files(manifest, "floats")
    )
    if floats is None:
        floats = spark.read.parquet(f"{path}/{FLOATS_DIR}")
    staged = _read_staging_names(
        spark, path, "floats", _snapshot_staging(manifest, "floats")
    )
    if staged is not None:
        floats = floats.unionByName(staged.localCheckpoint(eager=False))
    return floats


@_locked_df_first("append")
def append_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    files_per_bucket: int | None = None,
    engine: str = "blas",
    staged: bool = False,
    stream_batch_id: int | None = None,
) -> dict:
    """Daily ingest: assign + encode a NEW batch against the STORED
    centroids and codebook and parquet-append it into the existing
    cell partitions — O(batch) work, no rebuild, no existing file
    rewritten. The codebook is frozen (re-training it would corrupt
    every stored code); watch residual-energy creep via the float
    index's health gauges to decide when a retrain-to-new-path is
    due. If the index stores floats, the batch's raw vectors are
    appended into ``_floats/`` too, keeping re-rank complete.
    Manifest counts accumulate; ``appends`` counts batches.
    Single-writer by contract. Returns the updated manifest.

    ``staged=True`` lands the batch under ``_staging/`` (one file per
    store instead of up to ``files_per_bucket`` per touched cell — the
    micro-batch ingest path; see ``append_minhash_index``); readers
    union staging, the next compaction (or ``compact_ivfpq_index_if``)
    folds it.

    ``stream_batch_id`` threads the streaming sink's batch id into
    the SAME manifest write as the counts and BOTH stores' file
    snapshots — one commit point (see ``append_ivf_index``): a crash
    anywhere before it (even between the codes append and the
    ``_floats/`` one) leaves files referenced by nothing, so a replay
    simply appends the whole batch again and the orphans wait for
    :func:`vacuum_ivfpq_index`."""
    spark = new_vectors.sparkSession
    _, cents, codebook, manifest = read_ivfpq_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    fpb = (
        manifest["files_per_bucket"]
        if files_per_bucket is None
        else files_per_bucket
    )
    if fpb < 1:
        raise ValueError(f"files_per_bucket must be >= 1, got {fpb}")
    for c in (id_col, vec_col):
        if c not in new_vectors.columns:
            raise ValueError(
                f"new_vectors is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    from sparvi_core_spark.sources.ann_index import _reject_tombstoned

    _reject_tombstoned(
        spark, path, new_vectors, id_col, "new_vectors",
        names=manifest["tombstone_files"],
    )
    for c in ("bucket", "__slice"):
        if c in new_vectors.columns:
            raise ValueError(f"new_vectors already has a {c!r} column")
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
    n_batch_rows = _require_unique_ids(new_vectors, id_col, "new_vectors")
    if manifest.get("rotated"):
        from sparvi_core_spark.operators.quantization import rotate_vectors

        rotated = rotate_vectors(
            new_vectors,
            _read_rotation(spark, path),
            id_col=id_col,
            vec_col=vec_col,
        )
        extra = [
            c for c in new_vectors.columns if c not in (id_col, vec_col)
        ]
        new_vectors = (
            new_vectors.drop(vec_col).join(rotated, id_col)
            if extra
            else rotated
        )
    coded, assignment = _encode(
        new_vectors, cents, codebook, id_col, vec_col, engine
    )
    per_cell = {
        int(r["bucket"]): int(r["n"])
        for r in assignment.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_new = sum(per_cell.values())
    from sparvi_core_spark.sources.ann_index import (
        _cell_files,
        _diff_new_files,
        _merge_appended,
    )

    _, fs, mkpath = _index_fs(spark, path)

    def _staging_names_now(sub):
        return {
            pp.rsplit("/", 1)[-1] for pp in _staging_files(spark, path, sub)
        }

    codes_df = coded.select(F.col("id").alias(id_col), "codes", "bucket")
    floats_df = None
    if manifest.get("store_floats"):
        floats_df = new_vectors.join(
            assignment.select(F.col("id").alias(id_col), "bucket"), id_col
        )
    if staged and n_new:
        pre = {sub: _staging_names_now(sub) for sub in ("codes", "floats")}
        codes_df.coalesce(1).write.mode("append").parquet(
            f"{path}/{STAGING_DIR}/codes"
        )
        if floats_df is not None:
            floats_df.coalesce(1).write.mode("append").parquet(
                f"{path}/{STAGING_DIR}/floats"
            )
        for sub in ("codes", "floats"):
            manifest["staging_files"][sub] = sorted(
                set(manifest["staging_files"][sub])
                | (_staging_names_now(sub) - pre[sub])
            )
    elif n_new:
        touched = sorted(per_cell)
        pre_c = {
            str(b): set(_cell_files(fs, mkpath, path, b)) for b in touched
        }
        pre_f = {
            str(b): set(
                _cell_files(fs, mkpath, f"{path}/{FLOATS_DIR}", b)
            )
            for b in touched
        } if floats_df is not None else {}
        (
            codes_df
            .withColumn("__slice", _slice_col(id_col, fpb))
            .repartition(F.col("bucket"), F.col("__slice"))
            .drop("__slice")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(path)
        )
        manifest["files"]["codes"] = _merge_appended(
            manifest["files"]["codes"],
            _diff_new_files(fs, mkpath, path, touched, pre_c),
        )
        if floats_df is not None:
            (
                floats_df
                .withColumn("__slice", _slice_col(id_col, fpb))
                .repartition(F.col("bucket"), F.col("__slice"))
                .drop("__slice")
                .write.mode("append")
                .partitionBy("bucket")
                .parquet(f"{path}/{FLOATS_DIR}")
            )
            manifest["files"]["floats"] = _merge_appended(
                manifest["files"]["floats"],
                _diff_new_files(
                    fs, mkpath, f"{path}/{FLOATS_DIR}", touched, pre_f
                ),
            )
    rows = dict(manifest["rows_per_bucket"])
    for b, n in per_cell.items():
        rows[str(b)] = rows.get(str(b), 0) + n
    manifest["rows_per_bucket"] = {b: rows[b] for b in sorted(rows, key=int)}
    manifest["n_vectors"] += n_new
    manifest["dropped_null"] += n_batch_rows - n_new
    manifest["appends"] = manifest.get("appends", 0) + 1
    if stream_batch_id is not None:
        manifest["last_stream_batch_id"] = int(stream_batch_id)
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


@_locked("delete")
def delete_from_ivfpq_index(spark: SparkSession, path: str, ids) -> dict:
    """Delete-by-id - the takedown verb for the IVF-PQ index. ``ids``
    is a python sequence of id values or a DataFrame carrying the
    index's id column. Logical and immediate: tombstoned ids stop
    surfacing as neighbors (ADC and reranked paths) on the next
    search; :func:`compact_ivfpq_index` folds the tombstones in
    (codes store AND the ``_floats/`` side-store) and reconciles the
    manifest. Until then, deleted ids may not be re-appended.
    Idempotent. Returns ``{"requested", "tombstones_total",
    "pending_purge"}``."""
    from sparvi_core_spark.sources.ann_index import (
        _append_tombstones,
        _normalize_delete_ids,
        _read_tombstones,
    )

    coded, _, _, manifest = read_ivfpq_index(spark, path)
    id_col = manifest["id_col"]
    id_type = coded.schema[id_col].dataType
    drop = _normalize_delete_ids(spark, ids, id_col, id_type)
    drop = drop.localCheckpoint()  # counted, appended, presence-joined
    requested = drop.count()
    live_tombs = manifest["tombstone_files"]
    total, new_names = _append_tombstones(
        spark, path, drop, id_col, live_names=live_tombs
    )
    manifest["tombstone_files"] = sorted(set(live_tombs) | set(new_names))
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    pending = coded.join(F.broadcast(tomb), id_col, "left_semi").count()
    manifest["n_tombstones"] = total
    manifest["n_deleted_pending"] = pending
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return {
        "requested": requested,
        "tombstones_total": total,
        "pending_purge": pending,
    }


def repair_ivfpq_index(spark: SparkSession, path: str) -> dict:
    """Heal a crashed swap on the codes store or the ``_floats/``
    side-store under the snapshot-commit rule (see
    ``ann_index._repair_store``): the ONE manifest write that
    publishes both stores' file lists is the commit point, so the two
    stores can never commit separately. Idempotent; no-op on a clean
    index."""
    from sparvi_core_spark.sources.ann_index import _repair_store

    try:
        manifest = json.loads(_read_text(spark, path, MANIFEST))
    except Exception:
        manifest = {}
    files = manifest.get("files", {})
    out = {
        "codes": _repair_store(
            spark, path, live_files=files.get("codes")
        )["action"]
    }
    if manifest.get("store_floats"):
        out["floats"] = _repair_store(
            spark, f"{path}/{FLOATS_DIR}", live_files=files.get("floats")
        )["action"]
    return out


def compact_ivfpq_index(
    spark: SparkSession,
    path: str,
    files_per_bucket: int | None = None,
) -> dict:
    """Fold appended small files back to ``files_per_bucket`` per cell
    — the same journaled, crash-safe, fragmented-cells-only machinery
    as ``compact_ivf_index`` (shared ``_compact_cells`` engine +
    ``repair_ivfpq_index`` healing), applied to the CODE files and,
    when the index stores floats, to the ``_floats/`` side-store as
    well — BOTH stores' swaps publish in one snapshot-committed
    manifest write, so they can never be visible inconsistently. Row
    identity is checked against the manifest before each swap; readers
    never quiesce (see ``compact_ivf_index``). Returns the code
    stats dict, with the float store's stats under ``"floats"`` when
    present."""
    from sparvi_core_spark.sources.ann_index import (
        _compact_cells,
        _finish_swap,
        _purge_cells,
        _read_tombstones,
        _snapshot_files,
        _snapshot_read,
    )

    repair_ivfpq_index(spark, path)
    coded, _, _, manifest = read_ivfpq_index(spark, path)
    id_col = manifest["id_col"]
    fpb = (
        manifest["files_per_bucket"]
        if files_per_bucket is None
        else files_per_bucket
    )

    def _merge(store: str, delta):
        if not delta:
            return
        files = dict(manifest["files"][store])
        for b, names in delta.items():
            files[b] = names
        manifest["files"][store] = {
            b: files[b] for b in sorted(files, key=int)
        }

    def _finish_both():
        _finish_swap(spark, path)
        if manifest.get("store_floats"):
            _finish_swap(spark, f"{path}/{FLOATS_DIR}")

    def _float_store():
        floats = _snapshot_read(
            spark, f"{path}/{FLOATS_DIR}",
            _snapshot_files(manifest, "floats"),
        )
        return (
            spark.read.parquet(f"{path}/{FLOATS_DIR}")
            if floats is None else floats
        )

    # fold the staging store FIRST (append-shaped: only the staged
    # mass is rewritten, snapshot-committed), so the purge and
    # file-fold below see purely partitioned stores — any fan-in the
    # fold adds is swept by the >fpb pass right below
    staging = _fold_staging(spark, path, fpb)
    if staging is not None:
        coded, _, _, manifest = read_ivfpq_index(spark, path)
    purge = None
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    if tomb is not None:
        tomb = tomb.localCheckpoint()  # drives both store purges
        purge = {
            "codes": _purge_cells(
                spark, path, coded, id_col, tomb,
                slice_salt="ivfpq-slice", fpb=fpb,
                live_files=manifest["files"]["codes"],
            )
        }
        _merge("codes", purge["codes"].pop("new_files", None))
        if manifest.get("store_floats"):
            froot = f"{path}/{FLOATS_DIR}"
            purge["floats"] = _purge_cells(
                spark, froot, _float_store(), id_col, tomb,
                slice_salt="ivfpq-slice", fpb=fpb,
                live_files=manifest["files"]["floats"],
            )
            _merge("floats", purge["floats"].pop("new_files", None))
        # re-measure the manifest from the NEW snapshot (bucket is
        # the partition key - parquet-footer counts), so a
        # crash-interrupted purge re-run always ends consistent
        snap = _snapshot_read(spark, path, manifest["files"]["codes"])
        per_bucket = {} if snap is None else {
            int(r["bucket"]): int(r["n"])
            for r in snap
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        manifest["rows_per_bucket"] = {
            str(b): n for b, n in sorted(per_bucket.items())
        }
        manifest["n_vectors"] = sum(per_bucket.values())
        manifest["purged_total"] = manifest.get("purged_total", 0) + int(
            purge["codes"]["rows_dropped"]
        )
        # tombstones are consumed by the SAME commit that publishes
        # both purged stores; the physical files wait for vacuum
        manifest["tombstone_files"] = []
        manifest.pop("n_tombstones", None)
        manifest.pop("n_deleted_pending", None)
        _write_text(
            spark, path, MANIFEST,
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        _finish_both()
        coded, _, _, manifest = read_ivfpq_index(spark, path)
    stats = _compact_cells(
        spark,
        path,
        coded,
        id_col,
        manifest["rows_per_bucket"],
        fpb,
        slice_salt="ivfpq-slice",
        live_files=manifest["files"]["codes"],
    )
    _merge("codes", stats.pop("new_files", None))
    if manifest.get("store_floats"):
        froot = f"{path}/{FLOATS_DIR}"
        stats["floats"] = _compact_cells(
            spark,
            froot,
            _float_store(),
            id_col,
            manifest["rows_per_bucket"],
            fpb,
            slice_salt="ivfpq-slice",
            live_files=manifest["files"]["floats"],
        )
        _merge("floats", stats["floats"].pop("new_files", None))
    compacted = stats["cells_compacted"] > 0 or (
        stats.get("floats", {}).get("cells_compacted", 0) > 0
    )
    if compacted or fpb != manifest["files_per_bucket"]:
        manifest["files_per_bucket"] = fpb
        if compacted:
            manifest["compactions"] = manifest.get("compactions", 0) + 1
        _write_text(
            spark, path, MANIFEST,
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        _finish_both()
    if purge is not None:
        stats = dict(stats)
        stats["purge"] = purge
    if staging is not None:
        stats = dict(stats)
        stats["staging"] = staging
    return stats


def _fold_staging(spark: SparkSession, path: str, fpb: int):
    """Append-shaped staging fold for the codes store and (when
    present) the ``_floats/`` side-store: only the staged mass is
    rewritten and journal-renamed into the bucket dirs
    (``_fold_staged_cells``) — O(staged bytes), no store file touched.
    Returns per-store stats or None when nothing is staged. Caller
    holds the lock and has repaired the codes root."""
    from sparvi_core_spark.sources.ann_index import (
        _finish_swap,
        _fold_staged_cells,
        _merge_appended,
        _read_staging_names,
    )

    manifest = json.loads(_read_text(spark, path, MANIFEST))
    code_names = manifest["staging_files"]["codes"]
    float_names = manifest["staging_files"]["floats"]
    if not code_names and not float_names:
        return None
    id_col = manifest["id_col"]
    out = {}
    if code_names:
        out["codes"] = _fold_staged_cells(
            spark, path,
            _read_staging_names(spark, path, "codes", code_names), id_col,
            fpb, slice_salt="ivfpq-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/codes/{n}" for n in code_names
            ],
            snapshot=True,
        )
        manifest["files"]["codes"] = _merge_appended(
            manifest["files"]["codes"], out["codes"].pop("new_files", {})
        )
        manifest["staging_files"]["codes"] = []
    if float_names:
        froot = f"{path}/{FLOATS_DIR}"
        out["floats"] = _fold_staged_cells(
            spark, froot,
            _read_staging_names(spark, path, "floats", float_names), id_col,
            fpb, slice_salt="ivfpq-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/floats/{n}" for n in float_names
            ],
            snapshot=True,
        )
        manifest["files"]["floats"] = _merge_appended(
            manifest["files"]["floats"], out["floats"].pop("new_files", {})
        )
        manifest["staging_files"]["floats"] = []
    # ONE manifest write commits both stores' folds atomically; the
    # consumed staging files wait for vacuum_ivfpq_index
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    _finish_swap(spark, path)
    _finish_swap(spark, f"{path}/{FLOATS_DIR}")
    return out


@_locked("fold-staging")
def fold_staging_ivfpq_index(spark: SparkSession, path: str) -> dict:
    """The cheap maintenance verb: fold the staging tier into the code
    cells (and ``_floats/`` when stored) without rewriting any
    existing store file — O(staged bytes). Pending tombstones stay
    pending; the full :func:`compact_ivfpq_index` purges and sweeps
    fan-in at its own cadence. No-op ``{}`` when nothing is staged."""
    repair_ivfpq_index(spark, path)
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    return _fold_staging(spark, path, manifest["files_per_bucket"]) or {}


@_locked("vacuum")
def vacuum_ivfpq_index(
    spark: SparkSession, path: str, older_than_s: float = 0.0
) -> dict:
    """Delete the index's unreferenced files across the codes store,
    the ``_floats/`` side-store, staging, and tombstones (see
    ``ann_index._vacuum_stores``) once unreferenced for
    ``older_than_s`` seconds — size the window past the longest
    search; 0 deletes immediately (safe only with no reader in
    flight)."""
    from sparvi_core_spark.sources.ann_index import (
        _snapshot_files,
        _snapshot_staging,
        _vacuum_stores,
    )

    repair_ivfpq_index(spark, path)
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    stores = {"codes": (path, _snapshot_files(manifest, "codes"))}
    if manifest.get("store_floats"):
        stores["floats"] = (
            f"{path}/{FLOATS_DIR}", _snapshot_files(manifest, "floats")
        )
    return _vacuum_stores(
        spark, path,
        stores=stores,
        staging={
            "codes": ("codes", _snapshot_staging(manifest, "codes")),
            "floats": ("floats", _snapshot_staging(manifest, "floats")),
        },
        tombstones=manifest.get("tombstone_files", []),
        older_than_s=older_than_s,
    )


def compact_ivfpq_index_if(
    spark: SparkSession,
    path: str,
    max_files_per_bucket: int = 16,
    files_per_bucket: int | None = None,
) -> dict:
    """Two-tier maintenance knob (see ``compact_index_if``): bucket
    fan-in in the codes store or the ``_floats/`` side-store past the
    knob → full :func:`compact_ivfpq_index`; staged-file count past
    the knob alone → :func:`fold_staging_ivfpq_index` (O(staged), no
    store rewrite)."""
    from sparvi_core_spark.sources.ann_index import (
        _staging_gauge_live,
        compact_index_if,
        live_fragmentation,
    )

    def _man(s):
        return json.loads(_read_text(s, path, MANIFEST))

    return compact_index_if(
        spark, path,
        {
            "codes": (
                "bucket",
                lambda s: live_fragmentation(_man(s)["files"]["codes"]),
            ),
            "floats": (
                "bucket",
                lambda s: live_fragmentation(_man(s)["files"]["floats"]),
            ),
            # staged files count as per-bucket fan-in (every search
            # reads all of staging; LIVE lists, not physical garbage)
            "staging": (
                "staging",
                lambda s: _staging_gauge_live(
                    _man(s)["staging_files"]["codes"]
                    + _man(s)["staging_files"]["floats"]
                ),
            ),
        },
        max_files_per_bucket,
        lambda: compact_ivfpq_index(spark, path, files_per_bucket),
        fold=lambda: fold_staging_ivfpq_index(spark, path),
    )


def retrain_ivfpq_index(
    spark: SparkSession,
    path: str,
    dest: str,
    vectors: DataFrame | None = None,
    k: int | None = None,
    m: int | None = None,
    ks: int | None = None,
    seed: int = 42,
    max_iter: int = 10,
    sample_fraction: float | None = None,
    files_per_bucket: int | None = None,
) -> tuple[dict, dict, dict]:
    """Re-fit coarse centroids AND the residual codebook, then write a
    NEW index at ``dest`` — the blue/green answer to codebook/centroid
    drift (appends encode against frozen models by contract, so drift
    accumulates until this runs). Never in place (``dest == path``
    raises): the old index serves until the caller flips the path.

    Retraining needs FLOAT vectors — codes cannot be re-encoded
    against a new codebook. With ``store_floats=True`` the index's own
    ``_floats/`` store is the source; otherwise pass the float corpus
    as ``vectors`` (it must carry the manifest's id/vec columns, in
    ORIGINAL space). A rotated (OPQ) index keeps its stored rotation:
    the float store is un-rotated through the transpose, models are
    re-fitted in rotated space, and the new index is written with the
    same ``_rotation/``. ``sample_fraction`` fits both models on a
    sample while ALL rows are re-encoded and written. Returns
    ``(new_manifest, kmeans_info, pq_info)``."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        pq_train,
    )
    from sparvi_core_spark.operators.similarity import kmeans_fit

    if path.rstrip("/") == dest.rstrip("/"):
        raise ValueError(
            "retrain_ivfpq_index is blue/green by contract: dest must "
            "differ from the source index path"
        )
    _, _, _, manifest = read_ivfpq_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    rotation = (
        _read_rotation(spark, path) if manifest.get("rotated") else None
    )
    if vectors is None:
        if not manifest.get("store_floats"):
            raise ValueError(
                "retrain needs float vectors: this index stores codes "
                "only (store_floats=False) — pass the corpus as "
                "`vectors`"
            )
        vectors = _pq_float_rows(spark, path, manifest).drop("bucket")
        # pending deletes are excluded from the refit and the rewrite
        # (a retrain is a physical purge for free); the source keeps
        # its tombstones until its own compaction
        from sparvi_core_spark.sources.ann_index import _read_tombstones

        _tomb = _read_tombstones(
            spark, path, id_col, names=manifest["tombstone_files"]
        )
        if _tomb is not None:
            vectors = vectors.join(F.broadcast(_tomb), id_col, "left_anti")
        if rotation is not None:
            # the float store lives in rotated space; recover the
            # original space (orthogonal ⇒ inverse = transpose) so the
            # write path's own rotation pass is exact, not doubled
            from sparvi_core_spark.operators.quantization import (
                rotate_vectors,
            )

            vectors = rotate_vectors(
                vectors,
                [list(r) for r in zip(*rotation)],
                id_col=id_col,
                vec_col=vec_col,
            )
    for c in (id_col, vec_col):
        if c not in vectors.columns:
            raise ValueError(
                f"vectors is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    fit_src = vectors
    if rotation is not None:
        # models must be fitted in the space the index stores — the
        # write path re-rotates the full corpus itself
        from sparvi_core_spark.operators.quantization import rotate_vectors

        fit_src = rotate_vectors(
            vectors, rotation, id_col=id_col, vec_col=vec_col
        )
    fit_on = (
        fit_src.sample(fraction=sample_fraction, seed=seed)
        if sample_fraction is not None
        else fit_src
    )
    cents, km_info = kmeans_fit(
        fit_on,
        k=manifest["k"] if k is None else k,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        max_iter=max_iter,
    )
    codebook, pq_info = pq_train(
        ivf_residuals(fit_on, cents, id_col=id_col, vec_col=vec_col),
        m=manifest["m"] if m is None else m,
        ks=manifest["ks"] if ks is None else ks,
        id_col="id",
        vec_col="residual",
        max_iter=max_iter,
        seed=seed,
    )
    new_manifest = write_ivfpq_index(
        vectors,
        cents,
        codebook,
        dest,
        id_col=id_col,
        vec_col=vec_col,
        files_per_bucket=(
            manifest["files_per_bucket"]
            if files_per_bucket is None
            else files_per_bucket
        ),
        store_floats=bool(manifest.get("store_floats")),
        rotation=rotation,
    )
    return new_manifest, km_info, pq_info


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
) -> DataFrame:
    """Top-k L2 search against a stored IVF-PQ index, reading ONLY the
    probed cells' CODE files: ``(query_id, neighbor_id, distance,
    rank)``, distance ascending, neighbor-id ties (the search
    contract). Same results as the in-memory ``ivfpq_search`` on the
    same (corpus, centroids, codebook, nprobe) — asserted in tests —
    but the non-probed cells never leave disk and no float corpus
    exists in the scan at all.

    ``rerank=R`` (R ≥ k, requires ``store_floats=True`` at write
    time): the top-R ADC candidates per query are exact-scored from
    the cell-pruned float store and re-ranked; ``distance`` is then
    the exact ``round(l2, 4)``. This removes quantization error from
    the ranking — recall is bounded by cell recall alone (raise
    ``nprobe`` for that). The re-rank join moves O(queries × R)
    candidate ids against only the probed cells of ``_floats/``.

    Query frame must carry the manifest's ``id_col``/``vec_col``."""
    from sparvi_core_spark.operators.quantization import ivfpq_search
    from sparvi_core_spark.operators.similarity import ivf_assign_probes

    coded, cents, codebook, manifest = read_ivfpq_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    for c in (id_col, vec_col):
        if c not in queries.columns:
            raise ValueError(
                f"queries is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    if rerank is not None:
        if rerank < k:
            raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
        if not manifest.get("store_floats"):
            raise ValueError(
                "rerank requires an index written with store_floats=True "
                "(this one stores codes only)"
            )
    if manifest.get("rotated"):
        # the index lives in OPQ-rotated space: rotate the (small)
        # query batch once; L2 is rotation-invariant, so distances
        # (and the exact re-rank) equal original-space distances
        from sparvi_core_spark.operators.quantization import rotate_vectors

        queries = rotate_vectors(
            queries,
            _read_rotation(spark, path),
            id_col=id_col,
            vec_col=vec_col,
        )
    # Probe ONCE on the driver (bounded: n_queries × nprobe rows,
    # queries are the small side by contract) to prune the coded scan
    # at the file listing; ivfpq_search re-derives the same
    # deterministic probe set internally on the query side only.
    probe_rows = (
        ivf_assign_probes(
            queries, cents, nprobe=nprobe, id_col=id_col, vec_col=vec_col
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    probed = sorted(r["bucket"] for r in probe_rows)  # bounded by k cells
    pruned = coded.filter(F.col("bucket").isin(probed))
    # tombstoned ids (deleted, not yet purged) never surface as
    # neighbors - delete takes effect on the very next search
    from sparvi_core_spark.sources.ann_index import _read_tombstones

    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    if tomb is not None:
        pruned = pruned.join(F.broadcast(tomb), id_col, "left_anti")
    adc_k = k if rerank is None else rerank
    adc = ivfpq_search(
        queries,
        pruned,
        cents,
        codebook,
        k=adc_k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        code_id_col=id_col,
        bucket_col="bucket",
        code_col="codes",
    )
    if rerank is None:
        return adc
    floats = (
        _pq_float_rows(spark, path, manifest)
        .filter(F.col("bucket").isin(probed))
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
        )
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    exact = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "__qv",
                    "__nv",
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return (
        adc.select("query_id", "neighbor_id")
        .join(floats, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("distance", exact)
        .select("query_id", "neighbor_id", "distance")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
