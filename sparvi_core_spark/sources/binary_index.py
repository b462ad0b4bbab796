"""Binary-sketch index ON STORAGE — the cheapest rung of the stored
ANN ladder (float32 ``ann_index`` → PQ codes ``ivfpq_index`` → THIS:
1 bit per SRP projection, 32 bytes/vector at 256 bits). Sketches are
written as parquet hive-partitioned by their low ``prefix_bits`` sign
bits, so a Hamming search reads only the probed buckets' files via
partition pruning at the file listing — the multi-probe LSH analog of
``ann_index``'s IVF cell pruning, with the sketch ITSELF as the hash
(no centroids to train, no codebooks to store).

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface. The
in-memory tier lives in ``operators.binary_sketch``; this module is
its serving layout, completing the FAISS-style family
(IndexBinaryFlat at ``prefix_bits=0``, IndexBinaryMultiHash-flavored
prefix probing above it).

Scale design (the part that matters at 100 TB):

- **Codes at rest.** The data files carry ``(id, sketch)`` ONLY —
  32 bytes + id per vector, so a billion-vector index is ~40 GB of
  parquet and the brute-force scan of even the UNPRUNED index costs
  ~1% of the float corpus bytes. Payload retrieval is an id-join back
  to the caller's corpus, never a second vector copy.
- **The sketch is the partition key.** ``bucket = sketch[word 0] &
  (2^prefix_bits - 1)`` — the first ``prefix_bits`` hyperplane signs.
  Cosine-similar vectors agree on each sign with probability
  ``1 - θ/π`` (Charikar 2002), so a query's true neighbors
  concentrate in buckets within small Hamming distance of the query's
  own prefix. ``search_binary_index(radius=r)`` probes every bucket
  whose prefix differs in ≤ r of the ``prefix_bits`` bits —
  ``Σ_{i≤r} C(prefix_bits, i)`` buckets per distinct query prefix, a
  driver-bounded combinatorial set, pruned at the FILE LISTING.
  Expected recall of a neighbor at angle θ is
  ``P[Binom(prefix_bits, θ/π) ≤ r]`` — e.g. at θ=30°, prefix 12,
  r=2 → ~0.68, r=3 → ~0.87; ``radius=None`` scans flat (recall 1.0
  vs ``hamming_topk`` by construction — pinned in tests).
- **Rerank without a float-corpus scan.** ``store_vectors=True``
  writes a ``_vectors/`` side-store partitioned by the SAME bucket,
  so the exact-cosine rerank of the Q × rerank candidate pool reads
  float bytes from the probed buckets only.
- **Append is assign-and-add.** The manifest pins (bits, seed,
  prefix_bits, dim); appends re-derive the identical hyperplanes from
  the seed and parquet-append — no rebuild, no read-modify-write of
  data files.
"""

from __future__ import annotations

import json
from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sparvi_core_spark.sources.ann_index import (
    STAGING_DIR,
    _append_tombstones,
    _index_fs,
    _locked,
    _compact_cells,
    _normalize_delete_ids,
    _purge_cells,
    _read_staging_names,
    _read_text,
    _read_tombstones,
    _reject_tombstoned,
    _repair_store,
    _require_unique_ids,
    _physical_cells,
    _snapshot_files,
    _snapshot_read,
    _snapshot_staging,
    _staging_files,
    _write_text,
)

MANIFEST = "_binary_manifest.json"
VECTORS_DIR = "_vectors"
FORMAT = "sparvi-binary-index/2"


def _bucket_expr(sketch_col: str, prefix_bits: int) -> F.Column:
    """Low ``prefix_bits`` bits of word 0 = signs of hyperplanes
    0..prefix_bits-1 (little-endian packing — pinned against the blas
    packbits path in operators.binary_sketch tests)."""
    mask = (1 << prefix_bits) - 1
    return (
        F.element_at(F.col(sketch_col), 1)
        .bitwiseAND(F.lit(mask))
        .cast("int")
    )


def _probe_buckets(prefixes: set[int], prefix_bits: int, radius: int) -> list[int]:
    """Every bucket whose prefix differs from some query prefix in at
    most ``radius`` of the ``prefix_bits`` bits — the multi-probe set.
    Driver-side combinatorics, bounded by
    |prefixes| × Σ_{i≤radius} C(prefix_bits, i)."""
    out: set[int] = set()
    positions = range(prefix_bits)
    for p in prefixes:
        for r in range(radius + 1):
            for combo in combinations(positions, r):
                flipped = p
                for b in combo:
                    flipped ^= 1 << b
                out.add(flipped)
    return sorted(out)


def write_binary_index(
    vectors: DataFrame,
    path: str,
    bits: int = 256,
    seed: int = 42,
    prefix_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "auto",
    store_vectors: bool = True,
    files_per_bucket: int = 1,
    mode: str = "overwrite",
) -> dict:
    """Sketch every vector (``binarize_embeddings`` — one map-only
    pass) and write ``(id, sketch)`` parquet-partitioned by the
    sketch's sign prefix, plus an optional same-partitioned float
    side-store for exact rerank and a manifest. NULL vectors sketch to
    NULL and are NOT indexed (counted as ``dropped_null``). Returns
    the manifest dict. ``prefix_bits=0`` writes a flat (single-bucket)
    index — FAISS IndexBinaryFlat."""
    from sparvi_core_spark.operators.binary_sketch import binarize_embeddings

    if not 0 <= prefix_bits <= 20:
        raise ValueError(
            f"prefix_bits must be in [0, 20] (2^20 buckets already "
            f"exceeds any sane file count), got {prefix_bits}"
        )
    if files_per_bucket < 1:
        raise ValueError(
            f"files_per_bucket must be >= 1, got {files_per_bucket}"
        )
    for c in ("bucket", "sketch", "__slice"):
        if c in vectors.columns:
            raise ValueError(f"vectors already has a {c!r} column")
    spark = vectors.sparkSession
    n_rows = _require_unique_ids(vectors, id_col, "vectors")
    dim = vectors.select(F.size(F.col(vec_col)).alias("d")).filter(
        F.col("d").isNotNull()
    ).first()
    if dim is None:
        raise ValueError("vectors has no non-null embeddings to index")
    dim = int(dim["d"])
    sk = binarize_embeddings(
        vectors.select(id_col, vec_col),
        bits=bits,
        seed=seed,
        vec_col=vec_col,
        engine=engine,
        dim=dim,
    ).filter(F.col("sketch").isNotNull())
    data = sk.withColumn(
        "bucket",
        _bucket_expr("sketch", prefix_bits) if prefix_bits else F.lit(0),
    )
    slice_col = F.pmod(
        F.xxhash64(F.col(id_col), F.lit("bin-slice")),
        F.lit(files_per_bucket),
    )
    clustered = (
        data.withColumn("__slice", slice_col)
        .repartition(F.col("bucket"), F.col("__slice"))
        .drop("__slice")
    )
    (
        clustered.select(id_col, "sketch", "bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
    if store_vectors:
        (
            clustered.select(id_col, F.col(vec_col), "bucket")
            .write.mode(mode)
            .partitionBy("bucket")
            .parquet(f"{path}/{VECTORS_DIR}")
        )
    # snapshot commit: adopt the initial write's files (the only time
    # a listing feeds the manifest), then per-bucket stats from the
    # WRITTEN codes (cheapest possible scan; avoids re-running the
    # sketch kernel a second time). Correct because this writer is
    # for fresh indexes — incremental batches go through
    # append_binary_index.
    _, fs, mkpath = _index_fs(spark, path)
    files = {"codes": _physical_cells(fs, mkpath, path)}
    files["vectors"] = (
        _physical_cells(fs, mkpath, f"{path}/{VECTORS_DIR}")
        if store_vectors else {}
    )
    codes_snap = _snapshot_read(spark, path, files["codes"])
    per_bucket = {} if codes_snap is None else {
        int(r["bucket"]): int(r["n"])
        for r in codes_snap
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_vectors = sum(per_bucket.values())
    manifest = {
        "format": FORMAT,
        "files": files,
        "staging_files": {"codes": [], "vectors": []},
        "tombstone_files": [],
        "id_col": id_col,
        "vec_col": vec_col,
        "bits": bits,
        "seed": seed,
        "prefix_bits": prefix_bits,
        "dim": dim,
        "n_vectors": n_vectors,
        "dropped_null": n_rows - n_vectors,
        "store_vectors": store_vectors,
        "files_per_bucket": files_per_bucket,
        "rows_per_bucket": {str(b): n for b, n in sorted(per_bucket.items())},
    }
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def read_binary_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """Open an index: ``(codes, manifest)``. ``codes`` is the full
    partitioned sketch frame (bucket column included — filter it
    yourself or use :func:`search_binary_index`, which prunes)."""
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    if manifest.get("format") == "sparvi-binary-index/1":
        raise ValueError(
            f"{path}/{MANIFEST} predates snapshot commits "
            f"(sparvi-binary-index/1) — rebuild it with "
            f"write_binary_index"
        )
    if manifest.get("format") != FORMAT:
        raise ValueError(f"{path}/{MANIFEST} is not a {FORMAT} manifest")
    codes = _snapshot_read(spark, path, _snapshot_files(manifest, "codes"))
    if codes is None:
        codes = spark.read.parquet(path)
    staged = _read_staging_names(
        spark, path, "codes", _snapshot_staging(manifest, "codes")
    )
    if staged is not None:
        # lazy checkpoint, not a second parquet scan under the union
        # (the read_ivf_index rationale: Spark 4.1 DPP mis-plans
        # partition-column joins over unions of two parquet scans)
        codes = codes.unionByName(staged.localCheckpoint(eager=False))
    return codes, manifest


def _float_rows(
    spark: SparkSession, path: str, manifest: dict
) -> DataFrame:
    """The logical float side-store: committed snapshot ∪ committed
    staged appends."""
    floats = _snapshot_read(
        spark, f"{path}/{VECTORS_DIR}", _snapshot_files(manifest, "vectors")
    )
    if floats is None:
        floats = spark.read.parquet(f"{path}/{VECTORS_DIR}")
    staged = _read_staging_names(
        spark, path, "vectors", _snapshot_staging(manifest, "vectors")
    )
    if staged is not None:
        floats = floats.unionByName(staged.localCheckpoint(eager=False))
    return floats


@_locked("append")
def append_binary_index(
    spark: SparkSession, path: str, new_vectors: DataFrame,
    engine: str = "auto",
    staged: bool = False,
) -> dict:
    """Sketch a new batch with the manifest's (bits, seed) — the
    hyperplanes re-derive identically from the seed — and
    parquet-append into the same bucket layout. Ids must be unique
    within the batch (cross-batch uniqueness is the caller's key
    contract, as in ``append_ivf_index``). Returns the updated
    manifest.

    ``staged=True`` lands the batch under ``_staging/`` (one file per
    store instead of one per touched bucket — the micro-batch ingest
    path; see ``append_minhash_index``); readers union staging, the
    next compaction (or the ``compact_binary_index_if`` knob) folds
    it."""
    from sparvi_core_spark.operators.binary_sketch import binarize_embeddings

    _, manifest = read_binary_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    prefix_bits = manifest["prefix_bits"]
    n_rows = _require_unique_ids(new_vectors, id_col, "new_vectors")
    _reject_tombstoned(
        spark, path, new_vectors, id_col, "new_vectors",
        names=manifest["tombstone_files"],
    )
    sk = binarize_embeddings(
        new_vectors.select(id_col, vec_col),
        bits=manifest["bits"],
        seed=manifest["seed"],
        vec_col=vec_col,
        engine=engine,
        dim=manifest["dim"],
    ).filter(F.col("sketch").isNotNull())
    data = sk.withColumn(
        "bucket",
        _bucket_expr("sketch", prefix_bits) if prefix_bits else F.lit(0),
    )
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

    if staged:
        data = data.localCheckpoint()  # two writes AND the count below
        pre = {sub: _staging_names_now(sub) for sub in ("codes", "vectors")}
        data.select(id_col, "sketch", "bucket").coalesce(1).write.mode(
            "append"
        ).parquet(f"{path}/{STAGING_DIR}/codes")
        if manifest["store_vectors"]:
            data.select(id_col, F.col(vec_col), "bucket").coalesce(
                1
            ).write.mode("append").parquet(
                f"{path}/{STAGING_DIR}/vectors"
            )
        for sub in ("codes", "vectors"):
            manifest["staging_files"][sub] = sorted(
                set(manifest["staging_files"][sub])
                | (_staging_names_now(sub) - pre[sub])
            )
    else:
        data = data.localCheckpoint()  # writes AND the counts below
        touched = sorted(
            int(r["bucket"])
            for r in data.select("bucket").distinct().collect()
        )
        pre_c = {
            str(b): set(_cell_files(fs, mkpath, path, b)) for b in touched
        }
        pre_v = {
            str(b): set(_cell_files(fs, mkpath, f"{path}/{VECTORS_DIR}", b))
            for b in touched
        } if manifest["store_vectors"] else {}
        slice_col = F.pmod(
            F.xxhash64(F.col(id_col), F.lit("bin-slice")),
            F.lit(manifest["files_per_bucket"]),
        )
        clustered = (
            data.withColumn("__slice", slice_col)
            .repartition(F.col("bucket"), F.col("__slice"))
            .drop("__slice")
        )
        (
            clustered.select(id_col, "sketch", "bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(path)
        )
        manifest["files"]["codes"] = _merge_appended(
            manifest["files"]["codes"],
            _diff_new_files(fs, mkpath, path, touched, pre_c),
        )
        if manifest["store_vectors"]:
            (
                clustered.select(id_col, F.col(vec_col), "bucket")
                .write.mode("append")
                .partitionBy("bucket")
                .parquet(f"{path}/{VECTORS_DIR}")
            )
            manifest["files"]["vectors"] = _merge_appended(
                manifest["files"]["vectors"],
                _diff_new_files(
                    fs, mkpath, f"{path}/{VECTORS_DIR}", touched, pre_v
                ),
            )
    batch = {
        int(r["bucket"]): int(r["n"])
        for r in data.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_bucket = {
        int(b): n for b, n in manifest["rows_per_bucket"].items()
    }
    for b, n in batch.items():
        per_bucket[b] = per_bucket.get(b, 0) + n
    appended = sum(batch.values())
    manifest["n_vectors"] += appended
    manifest["dropped_null"] += n_rows - appended
    manifest["rows_per_bucket"] = {
        str(b): n for b, n in sorted(per_bucket.items())
    }
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def search_binary_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    radius: int | None = 2,
    rerank: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Hamming top-k against a stored index, reading ONLY the probed
    buckets: queries (float vectors, carrying the manifest's
    id_col/vec_col) are sketched with the index's planes, their sign
    prefixes expand to the ≤``radius``-bit-flip probe set, the
    distinct probe buckets become a partition-pruning ``bucket IN``
    on the codes scan, and ``hamming_topk`` finishes over the
    survivors. ``radius=None`` (or ≥ prefix_bits) scans flat — EXACT
    ``hamming_topk`` equality, pinned in tests.

    ``rerank=n`` additionally exact-cosine-reranks the per-query
    top-n Hamming candidates from the float side-store (pruned to the
    same buckets) → ``(query_id, neighbor_id, cosine, rank)``,
    ``hamming_topk_rerank``'s contract; requires
    ``store_vectors=True`` at write time."""
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk,
    )
    from sparvi_core_spark.operators.similarity import _dot

    codes, manifest = read_binary_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    prefix_bits = manifest["prefix_bits"]
    for c in (id_col, vec_col):
        if c not in queries.columns:
            raise ValueError(
                f"queries is missing the index's {c!r} column "
                f"(manifest: id_col={id_col!r}, vec_col={vec_col!r})"
            )
    if rerank is not None:
        if not manifest["store_vectors"]:
            raise ValueError(
                "rerank requires store_vectors=True at write time "
                "(this index has no _vectors/ side-store)"
            )
        if rerank < k:
            raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    qsk = binarize_embeddings(
        queries.select(id_col, vec_col),
        bits=manifest["bits"],
        seed=manifest["seed"],
        vec_col=vec_col,
        engine=engine,
        dim=manifest["dim"],
    ).filter(F.col("sketch").isNotNull())
    # queries are small by contract, but the prefix collect below is an
    # action over qsk and the returned top-k plan re-sketches the same
    # queries — one cheap checkpoint makes the sketch pass run once
    qsk = qsk.localCheckpoint()

    if prefix_bits and radius is not None and radius < prefix_bits:
        # queries are the small side by contract: their distinct
        # prefixes are driver-bounded, the probe expansion is
        # combinatorial on prefix_bits, and the resulting IN-list
        # prunes the scan at the file listing
        prefixes = {
            int(r["p"])
            for r in qsk.select(
                _bucket_expr("sketch", prefix_bits).alias("p")
            ).distinct().collect()
        }
        probed = _probe_buckets(prefixes, prefix_bits, radius)
        if len(probed) > (1 << prefix_bits) // 2:
            # probing most of the buckets costs more than scanning
            # flat (file-listing + IN-list overhead with no pruning
            # benefit) — degrade gracefully to the exact path
            probed = None
            pruned = codes
        else:
            pruned = codes.filter(F.col("bucket").isin(probed))
    else:
        probed = None
        pruned = codes

    # tombstoned ids (deleted, not yet purged) never surface as
    # neighbors — the delete takes effect on the very next search
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    if tomb is not None:
        pruned = pruned.join(F.broadcast(tomb), id_col, "left_anti")

    hits = hamming_topk(
        pruned.select(F.col(id_col), "sketch"),
        qsk,
        k=k if rerank is None else rerank,
        id_col=id_col,
        sketch_col="sketch",
    )
    if rerank is None:
        return hits

    floats = _float_rows(spark, path, manifest)
    if probed is not None:
        floats = floats.filter(F.col("bucket").isin(probed))
    cands = hits.select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = floats.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = cands.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id")
    qn = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nn = F.sqrt(_dot(F.col("nv"), F.col("nv")))
    cos = F.round(
        _dot(F.col("qv"), F.col("nv")) / F.when(qn * nn > 0, qn * nn), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", cos.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def binary_index_health(spark: SparkSession, path: str) -> DataFrame:
    """Per-bucket audit: manifest rows vs actual rows on disk — the
    quick drift/corruption gauge (mirrors ``ivf_index_health``)."""
    codes, manifest = read_binary_index(spark, path)
    actual = codes.groupBy("bucket").agg(F.count(F.lit(1)).alias("actual_rows"))
    want = spark.createDataFrame(
        [(int(b), n) for b, n in manifest["rows_per_bucket"].items()],
        "bucket int, manifest_rows long",
    )
    return (
        actual.join(want, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("manifest_rows", F.lit(0)).alias("manifest_rows"),
            F.coalesce("actual_rows", F.lit(0)).alias("actual_rows"),
        )
        .withColumn(
            "ok", F.col("manifest_rows") == F.col("actual_rows")
        )
        .orderBy("bucket")
    )


@_locked("delete")
def delete_from_binary_index(spark: SparkSession, path: str, ids) -> dict:
    """Delete-by-id — the takedown verb for the binary-sketch index.
    ``ids`` is a python sequence of id values or a DataFrame carrying
    the index's id column. Logical and immediate: tombstoned ids stop
    surfacing as neighbors on the next search;
    :func:`compact_binary_index` folds the tombstones in (rewriting
    only the cells that held the deleted rows, in the codes store AND
    the float side-store) and reconciles the manifest. Until then,
    deleted ids may not be re-appended. Idempotent. Returns
    ``{"requested", "tombstones_total", "pending_purge"}``."""
    codes, manifest = read_binary_index(spark, path)
    id_col = manifest["id_col"]
    id_type = codes.schema[id_col].dataType
    drop = _normalize_delete_ids(spark, ids, id_col, id_type)
    drop = drop.localCheckpoint()  # counted, appended, presence-joined
    requested = drop.count()
    live_tombs = manifest["tombstone_files"]
    total, new_names = _append_tombstones(
        spark, path, drop, id_col, live_names=live_tombs
    )
    manifest["tombstone_files"] = sorted(set(live_tombs) | set(new_names))
    # presence: a code's bucket is a function of its SKETCH, not its
    # id, so this check is a column-pruned id scan of the codes store
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    pending = codes.join(F.broadcast(tomb), id_col, "left_semi").count()
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


def repair_binary_index(spark: SparkSession, path: str) -> dict:
    """Heal a crashed swap on either store (codes root or
    ``_vectors/``) under the snapshot-commit rule (see
    ``ann_index._repair_store``): the ONE manifest write that
    publishes both stores' file lists is the commit point, so the two
    stores can never commit separately. Idempotent; no-op on a clean
    index."""
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
    if manifest.get("store_vectors"):
        out["vectors"] = _repair_store(
            spark, f"{path}/{VECTORS_DIR}", live_files=files.get("vectors")
        )["action"]
    return out


@_locked("compact")
def compact_binary_index(
    spark: SparkSession,
    path: str,
    files_per_bucket: int | None = None,
) -> dict:
    """Maintenance pass for the append/delete pipeline: fold pending
    deletes (tombstoned cells rewritten without the deleted rows —
    codes store and float side-store — manifest re-measured from the
    new snapshot, tombstones consumed in the same commit), then fold
    appended small files back to ``files_per_bucket`` per cell in
    both stores. Journaled, snapshot-committed, and crash-healed via
    :func:`repair_binary_index` (run here first); single WRITER by
    contract, readers never quiesce (see ``compact_ivf_index``).
    Returns per-store compaction stats plus a ``"purge"`` block when
    tombstones were folded."""
    from sparvi_core_spark.sources.ann_index import _finish_swap

    repair_binary_index(spark, path)
    codes, manifest = read_binary_index(spark, path)
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
        if manifest["store_vectors"]:
            _finish_swap(spark, f"{path}/{VECTORS_DIR}")

    def _vec_store():
        floats = _snapshot_read(
            spark, f"{path}/{VECTORS_DIR}",
            _snapshot_files(manifest, "vectors"),
        )
        return (
            spark.read.parquet(f"{path}/{VECTORS_DIR}")
            if floats is None else floats
        )

    # fold the staging store FIRST (append-shaped: only the staged
    # mass is rewritten, snapshot-committed), so the purge and
    # file-fold below see purely partitioned stores — any fan-in the
    # fold adds is swept by the >fpb pass right below
    staging = _fold_staging(spark, path, fpb)
    if staging is not None:
        codes, manifest = read_binary_index(spark, path)
    purge = None
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    )
    if tomb is not None:
        tomb = tomb.localCheckpoint()  # drives both store purges
        code_purge = _purge_cells(
            spark, path, codes, id_col, tomb,
            slice_salt="bin-slice", fpb=fpb,
            live_files=manifest["files"]["codes"],
        )
        _merge("codes", code_purge.pop("new_files", None))
        vec_purge = None
        if manifest["store_vectors"]:
            vec_purge = _purge_cells(
                spark,
                f"{path}/{VECTORS_DIR}",
                _vec_store(),
                id_col,
                tomb,
                slice_salt="bin-slice",
                fpb=fpb,
                live_files=manifest["files"]["vectors"],
            )
            _merge("vectors", vec_purge.pop("new_files", None))
        # re-measure the manifest from the NEW snapshot (bucket is
        # the partition key — parquet-footer counts), so a
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
            code_purge["rows_dropped"]
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
        purge = {"codes": code_purge}
        if vec_purge is not None:
            purge["vectors"] = vec_purge
        codes, manifest = read_binary_index(spark, path)
    code_stats = _compact_cells(
        spark, path, codes, id_col,
        manifest["rows_per_bucket"], fpb, slice_salt="bin-slice",
        live_files=manifest["files"]["codes"],
    )
    _merge("codes", code_stats.pop("new_files", None))
    out = {"codes": code_stats}
    if manifest["store_vectors"]:
        out["vectors"] = _compact_cells(
            spark,
            f"{path}/{VECTORS_DIR}",
            _vec_store(),
            id_col,
            manifest["rows_per_bucket"],
            fpb,
            slice_salt="bin-slice",
            live_files=manifest["files"]["vectors"],
        )
        _merge("vectors", out["vectors"].pop("new_files", None))
    if code_stats["cells_compacted"] or (
        out.get("vectors", {}).get("cells_compacted", 0)
    ):
        manifest["compactions"] = manifest.get("compactions", 0) + 1
    if files_per_bucket is not None:
        manifest["files_per_bucket"] = fpb
    if (
        code_stats["cells_compacted"]
        or out.get("vectors", {}).get("cells_compacted", 0)
        or files_per_bucket is not None
    ):
        _write_text(
            spark, path, MANIFEST,
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        _finish_both()
    out2 = dict(out)
    if purge is not None:
        out2["purge"] = purge
    if staging is not None:
        out2["staging"] = staging
    return out2


def _fold_staging(spark: SparkSession, path: str, fpb: int):
    """Append-shaped staging fold for both stores (codes root and the
    ``_vectors/`` side-store): only the staged mass is rewritten and
    journal-renamed into the bucket dirs (``_fold_staged_cells``) —
    O(staged bytes), no store file touched. Returns per-store stats or
    None when nothing is staged. Caller holds the lock, has repaired."""
    from sparvi_core_spark.sources.ann_index import (
        _finish_swap,
        _fold_staged_cells,
        _merge_appended,
    )

    _, manifest = read_binary_index(spark, path)
    code_names = manifest["staging_files"]["codes"]
    vec_names = manifest["staging_files"]["vectors"]
    if not code_names and not vec_names:
        return None
    id_col = manifest["id_col"]
    out = {}
    if code_names:
        out["codes"] = _fold_staged_cells(
            spark, path,
            _read_staging_names(spark, path, "codes", code_names), id_col,
            fpb, slice_salt="bin-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/codes/{n}" for n in code_names
            ],
            snapshot=True,
        )
        manifest["files"]["codes"] = _merge_appended(
            manifest["files"]["codes"], out["codes"].pop("new_files", {})
        )
        manifest["staging_files"]["codes"] = []
    if vec_names:
        out["vectors"] = _fold_staged_cells(
            spark, f"{path}/{VECTORS_DIR}",
            _read_staging_names(spark, path, "vectors", vec_names), id_col,
            fpb, slice_salt="bin-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/vectors/{n}" for n in vec_names
            ],
            snapshot=True,
        )
        manifest["files"]["vectors"] = _merge_appended(
            manifest["files"]["vectors"], out["vectors"].pop("new_files", {})
        )
        manifest["staging_files"]["vectors"] = []
    # ONE manifest write commits both stores' folds atomically; the
    # consumed staging files wait for vacuum_binary_index
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    _finish_swap(spark, path)
    _finish_swap(spark, f"{path}/{VECTORS_DIR}")
    return out


@_locked("fold-staging")
def fold_staging_binary_index(spark: SparkSession, path: str) -> dict:
    """The cheap maintenance verb: fold the staging tier into both
    stores' bucket partitions without rewriting any existing store
    file — O(staged bytes). Pending tombstones stay pending; the full
    :func:`compact_binary_index` purges and sweeps fan-in at its own
    cadence. No-op ``{}`` when nothing is staged."""
    repair_binary_index(spark, path)
    _, manifest = read_binary_index(spark, path)
    return _fold_staging(spark, path, manifest["files_per_bucket"]) or {}


@_locked("vacuum")
def vacuum_binary_index(
    spark: SparkSession, path: str, older_than_s: float = 0.0
) -> dict:
    """Delete the index's unreferenced files across the codes store,
    the float side-store, staging, and tombstones (see
    ``ann_index._vacuum_stores``) once unreferenced for
    ``older_than_s`` seconds — size the window past the longest
    search; 0 deletes immediately (safe only with no reader in
    flight)."""
    from sparvi_core_spark.sources.ann_index import _vacuum_stores

    repair_binary_index(spark, path)
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    stores = {"codes": (path, _snapshot_files(manifest, "codes"))}
    if manifest.get("store_vectors"):
        stores["vectors"] = (
            f"{path}/{VECTORS_DIR}", _snapshot_files(manifest, "vectors")
        )
    return _vacuum_stores(
        spark, path,
        stores=stores,
        staging={
            "codes": ("codes", _snapshot_staging(manifest, "codes")),
            "vectors": ("vectors", _snapshot_staging(manifest, "vectors")),
        },
        tombstones=manifest.get("tombstone_files", []),
        older_than_s=older_than_s,
    )


def compact_binary_index_if(
    spark: SparkSession,
    path: str,
    max_files_per_bucket: int = 16,
    files_per_bucket: int | None = None,
) -> dict:
    """Two-tier maintenance knob (see ``compact_index_if``): bucket
    fan-in in the codes store or the ``_vectors/`` side-store past the
    knob → full :func:`compact_binary_index`; staged-file count past
    the knob alone → :func:`fold_staging_binary_index` (O(staged), no
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
            "vectors": (
                "bucket",
                lambda s: live_fragmentation(_man(s)["files"]["vectors"]),
            ),
            # staged files count as per-bucket fan-in (every search
            # reads all of staging; LIVE lists, not physical garbage)
            "staging": (
                "staging",
                lambda s: _staging_gauge_live(
                    _man(s)["staging_files"]["codes"]
                    + _man(s)["staging_files"]["vectors"]
                ),
            ),
        },
        max_files_per_bucket,
        lambda: compact_binary_index(spark, path, files_per_bucket),
        fold=lambda: fold_staging_binary_index(spark, path),
    )


def filter_new_against_binary_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    min_cosine: float = 0.95,
    k: int = 10,
    radius: int | None = 2,
    rerank: int | None = 50,
) -> DataFrame:
    """The EMBEDDING-side incremental-ingest screen (the
    ``minhash_index.filter_new_against_index`` twin): batch rows whose
    vector has an exact-cosine near-duplicate ≥ ``min_cosine`` already
    in the index are dropped; everything else passes through with its
    columns untouched. One probed search + one anti-join — per-batch
    cost is O(batch × probed buckets), never O(index).

    ``rerank`` (requires ``store_vectors=True`` at write time) makes
    the threshold an EXACT cosine decision over the Hamming candidate
    pool; ``rerank=None`` is not allowed here — a Hamming distance has
    no fixed cosine meaning, so a cosine threshold needs the float
    rerank. ``radius`` trades recall for probe cost exactly as in
    :func:`search_binary_index` (``None`` scans flat: full recall of
    the Hamming pool). A batch id equal to a stored id is skipped (a
    re-embed of the same key is not a near-duplicate)."""
    if rerank is None:
        raise ValueError(
            "rerank is required: the cosine threshold needs the exact "
            "rerank from the float side-store (radius=None for full "
            "recall instead)"
        )
    _, manifest = read_binary_index(spark, path)
    id_col = manifest["id_col"]
    hits = search_binary_index(
        spark, path, batch, k=k, radius=radius, rerank=rerank
    )
    dup_ids = (
        hits.filter(F.col("cosine") >= min_cosine)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(F.col("query_id").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")
