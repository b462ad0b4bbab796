"""MinHash-LSH dedup index ON STORAGE — signatures and band buckets
at rest, so each new crawl batch dedups against the WHOLE historical
corpus by reading only the band buckets the batch itself touches.
This gives fuzzy dedup the same serving treatment the ANN ladder
already has (``ann_index`` / ``ivfpq_index`` / ``binary_index``): the
expensive global state is computed once, written parquet-partitioned
by a probeable key, and incremental batches probe it with
file-listing-level pruning instead of recomputing signatures for
100 TB of history per crawl.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface. The
in-memory tier lives in ``operators.dedup`` (``minhash_signatures`` /
``lsh_candidate_pairs`` / ``minhash_dedup_pairs``); this module reuses
those exact kernels, so a stored index and an in-memory run produce
IDENTICAL signatures and band keys (pinned in tests).

Scale design (the part that matters at 100 TB):

- **Two stores, both bucketed.** Data files carry ``(id, band, bkey,
  bucket)`` — ``bucket = pmod(xxhash64(band, bkey), n_buckets)`` is
  the hive partition key, so a probe's ``bucket IN (...)`` prunes at
  the FILE LISTING. A ``_sigs/`` side-store carries one ``(id,
  h0..h{K-1})`` row per doc, partitioned by ``pmod(xxhash64(id),
  n_buckets)`` — verification reads only the buckets that hold the
  candidate ids.
- **Probe cost scales with the BATCH, not the corpus.** The batch's
  distinct band-buckets are a driver-bounded set (≤ ``n_buckets``, a
  manifest constant); candidate generation is an equi-join of the
  batch's band rows against only those stored buckets; verification
  is an equi-join against only the candidate ids' signature buckets.
  A small recrawl batch against a petabyte-scale index touches a
  small fraction of its files. When a huge batch covers most buckets
  the IN-list is dropped (flat fallback — pruning would cost listing
  overhead with no benefit), which is exactly the full-corpus join
  you would have run anyway.
- **Degenerate buckets are capped, like the in-memory tier.** A
  boilerplate band key shared by millions of stored docs would make
  one probe row fan out by millions; ``max_bucket`` drops stored band
  keys above the cap from candidate generation (broadcast anti-join
  of a tiny over-cap list), the same guard and rationale as
  ``lsh_candidate_pairs``.
- **Append is sign-and-add.** The manifest pins (num_hashes, bands,
  shingle_n, n_buckets); the MinHash salts are deterministic
  constants of the hash index, so appended batches land in the same
  key space with no rebuild and no read-modify-write.
- **Micro-batches stage.** A partitioned append creates one small
  file in every touched bucket of BOTH stores (up to 2×n_buckets file
  creations — constants-dominated for streaming-grain batches).
  ``append_minhash_index(staged=True)`` lands the batch as exactly
  two unpartitioned files under ``_staging/``; every reader unions
  the COMMITTED staging files in (O(pending micro-batches)), and the
  next compaction folds staged rows into their bucket partitions
  through the snapshot-committed journaled swap (consumed staging
  files become unreferenced and wait for ``vacuum_minhash_index``).
  ``compact_minhash_index_if`` counts staged files as per-bucket
  fan-in, so the auto-compaction knob bounds both fragmentation AND
  staging debt.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparvi_core_spark.operators.dedup import (
    _band_hashes,
    minhash_signatures,
    solve_lsh_bands,
)
from sparvi_core_spark.sources.ann_index import (
    STAGING_DIR,
    _append_tombstones,
    _locked,
    _normalize_delete_ids,
    _purge_cells,
    _read_text,
    _read_tombstones,
    _reject_tombstoned,
    _require_unique_ids,
    _staging_files,
    _write_text,
)

MANIFEST = "_minhash_manifest.json"
SIGS_DIR = "_sigs"
FORMAT = "sparvi-minhash-index/2"
# probe-side broadcast gate (bytes, conservative per-row estimates):
# aligned with Spark's 10 MB autoBroadcastJoinThreshold convention —
# the batch/candidate frames are hinted only under this bound, never
# assumed small
_BROADCAST_MAX_BYTES = 8 << 20


def _band_bucket(n_buckets: int) -> F.Column:
    return F.pmod(
        F.xxhash64(F.col("band"), F.col("bkey")), F.lit(n_buckets)
    ).cast("int")


def _sig_bucket(id_col: str, n_buckets: int) -> F.Column:
    return F.pmod(
        F.xxhash64(F.col(id_col), F.lit("mh-sig")), F.lit(n_buckets)
    ).cast("int")


def _signed(
    docs: DataFrame, manifest: dict
) -> tuple[DataFrame, DataFrame]:
    """(banded, sigs) for a doc frame under the manifest's parameters.
    ``banded`` is (id, band, bkey, bucket); ``sigs`` is (id, h0..hK-1,
    bucket) — BOTH stores partition on a column named ``bucket`` (the
    sig store computes it from the id) so the shared journaled
    compaction fold serves both. Docs shorter than ``shingle_n`` words
    have no signature and drop out (the in-memory contract)."""
    # Micro-batches arrive as 1-few partitions (a localCheckpointed
    # probe batch is ONE), and everything before the groupBy shuffle —
    # shingling plus K md5-mins per shingle — runs map-side in that
    # many tasks. Raise compact inputs to cluster parallelism first
    # (measured: 1k-doc probe batch signing 3.1 s → sub-second); the
    # gate makes it a no-op for corpus-sized frames that already fan
    # out, and for frames already behind an exchange.
    from sparvi_core_spark.plans.fanout import fan_out_compact

    docs = fan_out_compact(docs)
    sig = minhash_signatures(
        docs,
        id_col=manifest["id_col"],
        text_col=manifest["text_col"],
        num_hashes=manifest["num_hashes"],
        shingle_n=manifest["shingle_n"],
    ).localCheckpoint()
    banded = _band_hashes(
        sig, manifest["num_hashes"], manifest["bands"]
    ).withColumn("bucket", _band_bucket(manifest["n_buckets"]))
    sigs = sig.withColumn("bucket", _sig_bucket("id", manifest["n_buckets"]))
    return banded, sigs


def _write_stores(banded: DataFrame, sigs: DataFrame, path: str, mode: str):
    (
        banded.repartition(F.col("bucket"))
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
    (
        sigs.repartition(F.col("bucket"))
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/{SIGS_DIR}")
    )


def _bucket_counts(frame: DataFrame) -> dict[int, int]:
    return {
        int(r["bucket"]): int(r["n"])
        for r in frame.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


# ---------------------------------------------------------------------------
# staging store — O(1)-file appends for micro-batch ingest
# ---------------------------------------------------------------------------
#
# A normal append writes one small file into EVERY touched bucket of
# BOTH stores (up to 2×n_buckets file creations), so tiny streaming
# batches are dominated by file creation (~6.9 s/append measured at
# round 9 regardless of batch size). ``append_minhash_index(...,
# staged=True)`` instead lands the batch UNPARTITIONED as exactly two
# files under ``_staging/{bands,sigs}/`` (bucket carried as an
# ordinary column). Readers union the staging files into every scan —
# staging is O(pending micro-batches), so every probe reads all of it,
# which is why ``compact_minhash_index_if`` gauges the staging file
# count like a per-bucket fan-in and the next compaction folds staged
# rows into their bucket partitions (snapshot-committed: the consumed
# staging files become unreferenced at the fold's manifest commit and
# are reclaimed by ``vacuum_minhash_index``).
# Manifest bucket counts are LOGICAL (they include staged rows), so
# health checks and compaction identity checks hold in every state.


def _band_store(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """The band store's committed snapshot (no staging)."""
    from sparvi_core_spark.sources.ann_index import (
        _snapshot_files,
        _snapshot_read,
    )

    rows = _snapshot_read(spark, path, _snapshot_files(manifest, "bands"))
    return spark.read.parquet(path) if rows is None else rows


def _sig_store(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """The signature store's committed snapshot (no staging)."""
    from sparvi_core_spark.sources.ann_index import (
        _snapshot_files,
        _snapshot_read,
    )

    rows = _snapshot_read(
        spark, f"{path}/{SIGS_DIR}", _snapshot_files(manifest, "sigs")
    )
    return spark.read.parquet(f"{path}/{SIGS_DIR}") if rows is None else rows


def _band_rows(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """The logical band store: committed snapshot ∪ committed staged
    appends (readers never list a directory — see the snapshot-commit
    notes in ``ann_index``)."""
    from sparvi_core_spark.sources.ann_index import (
        _read_staging_names,
        _snapshot_staging,
    )

    rows = _band_store(spark, path, manifest)
    staged = _read_staging_names(
        spark, path, "bands", _snapshot_staging(manifest, "bands")
    )
    return rows if staged is None else rows.unionByName(staged)


def _sig_rows(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """The logical signature store: committed snapshot ∪ committed
    staged appends."""
    from sparvi_core_spark.sources.ann_index import (
        _read_staging_names,
        _snapshot_staging,
    )

    rows = _sig_store(spark, path, manifest)
    staged = _read_staging_names(
        spark, path, "sigs", _snapshot_staging(manifest, "sigs")
    )
    return rows if staged is None else rows.unionByName(staged)


def write_minhash_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = 16,
    bands: int | None = None,
    threshold: float = 0.8,
    shingle_n: int = 3,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> dict:
    """MinHash-sign every doc once and write the band store + the
    signature side-store, both hive-partitioned for probe-time
    pruning. ``bands=None`` solves the banding from ``threshold``
    (``solve_lsh_bands``) exactly as the in-memory tier does. Docs
    with fewer than ``shingle_n`` words have no shingles and are NOT
    indexed (counted as ``dropped_short``). Returns the manifest."""
    if bands is None:
        bands, _rows = solve_lsh_bands(threshold, num_hashes)
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    if mode == "append":
        # this writer recounts the WHOLE store for its stats (so
        # dropped_short would come out as batch_rows - total_docs) and
        # checks id uniqueness only within `docs` — incremental batches
        # must go through append_minhash_index, which does both right
        raise ValueError(
            "write_minhash_index is for fresh indexes "
            "(mode='overwrite'/'errorifexists'); use "
            "append_minhash_index for incremental batches"
        )
    spark = docs.sparkSession
    n_rows = _require_unique_ids(docs, id_col, "docs")
    manifest = {
        "format": FORMAT,
        "id_col": id_col,
        "text_col": text_col,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "threshold": threshold,
        "n_buckets": n_buckets,
    }
    banded, sigs = _signed(docs.select(id_col, text_col), manifest)
    _write_stores(banded, sigs, path, mode)
    # snapshot commit: adopt the initial write's files into the
    # manifest (the only time a listing feeds it), stats from the
    # written stores (cheapest scan; this writer is for fresh
    # indexes — incremental batches go through append)
    from sparvi_core_spark.sources.ann_index import (
        _index_fs,
        _physical_cells,
    )

    _, fs, mkpath = _index_fs(spark, path)
    manifest["files"] = {
        "bands": _physical_cells(fs, mkpath, path),
        "sigs": _physical_cells(fs, mkpath, f"{path}/{SIGS_DIR}"),
    }
    manifest["staging_files"] = {"bands": [], "sigs": []}
    manifest["tombstone_files"] = []
    per_bucket = _bucket_counts(_band_store(spark, path, manifest))
    sig_per_bucket = _bucket_counts(_sig_store(spark, path, manifest))
    n_docs = sum(per_bucket.values()) // bands
    manifest.update(
        n_docs=n_docs,
        dropped_short=n_rows - n_docs,
        rows_per_bucket={str(b): n for b, n in sorted(per_bucket.items())},
        sig_rows_per_bucket={
            str(b): n for b, n in sorted(sig_per_bucket.items())
        },
    )
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """Open an index: ``(band_rows, manifest)``. ``band_rows`` is the
    full LOGICAL (id, band, bkey, bucket) frame — the partitioned
    store plus any staged appends — filter it yourself or use
    :func:`probe_minhash_index`, which prunes."""
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    if manifest.get("format") == "sparvi-minhash-index/1":
        raise ValueError(
            f"{path}/{MANIFEST} predates snapshot commits "
            f"(sparvi-minhash-index/1) — rebuild it with "
            f"write_minhash_index"
        )
    if manifest.get("format") != FORMAT:
        raise ValueError(f"{path}/{MANIFEST} is not a {FORMAT} manifest")
    return _band_rows(spark, path, manifest), manifest


@_locked("append")
def append_minhash_index(
    spark: SparkSession, path: str, new_docs: DataFrame,
    staged: bool = False,
    stream_batch_id: int | None = None,
) -> dict:
    """Sign a new batch under the manifest's parameters (the MinHash
    salts are deterministic, so the key space is identical) and
    parquet-append into both stores. Ids must be unique within the
    batch; cross-batch uniqueness is the caller's key contract (as in
    the other stored indexes). Returns the updated manifest.

    ``staged=True`` lands the batch in the staging store instead —
    exactly TWO file creations (one per store, bucket carried as a
    column) instead of one small file per touched bucket of both
    stores, turning the constants-dominated micro-batch append floor
    into O(1). Probes/screens read staged rows transparently; the next
    compaction (or ``compact_minhash_index_if`` / the novelty stream's
    ``auto_compact``) folds them into their bucket partitions. Use it
    for streaming-grain batches; corpus-sized batches should keep the
    partitioned write (their staging scan cost would exceed the file
    savings)."""
    from sparvi_core_spark.sources.ann_index import (
        _cell_files,
        _diff_new_files,
        _index_fs,
        _merge_appended,
    )

    _, manifest = read_minhash_index(spark, path)
    id_col = manifest["id_col"]
    n_rows = _require_unique_ids(new_docs, id_col, "new_docs")
    _reject_tombstoned(
        spark, path, new_docs, id_col, "new_docs",
        names=manifest["tombstone_files"],
    )
    banded, sigs = _signed(
        new_docs.select(id_col, manifest["text_col"]), manifest
    )
    sigs = sigs.localCheckpoint()  # consumed by the write AND the count
    # banded derives from the checkpointed sig frame, so the counts
    # recompute only the cheap banding expressions
    batch = _bucket_counts(banded)
    sig_batch_pre = _bucket_counts(sigs)
    _, fs, mkpath = _index_fs(spark, path)
    if staged:
        pre = {
            sub: {p.rsplit("/", 1)[-1] for p in _staging_files(spark, path, sub)}
            for sub in ("bands", "sigs")
        }
        banded.coalesce(1).write.mode("append").parquet(
            f"{path}/{STAGING_DIR}/bands"
        )
        sigs.coalesce(1).write.mode("append").parquet(
            f"{path}/{STAGING_DIR}/sigs"
        )
        for sub in ("bands", "sigs"):
            post = {
                p.rsplit("/", 1)[-1]
                for p in _staging_files(spark, path, sub)
            }
            manifest["staging_files"][sub] = sorted(
                set(manifest["staging_files"][sub]) | (post - pre[sub])
            )
    else:
        band_touch = sorted(batch)
        sig_touch = sorted(sig_batch_pre)
        pre_b = {
            str(b): set(_cell_files(fs, mkpath, path, b)) for b in band_touch
        }
        pre_s = {
            str(b): set(_cell_files(fs, mkpath, f"{path}/{SIGS_DIR}", b))
            for b in sig_touch
        }
        _write_stores(banded, sigs, path, "append")
        manifest["files"]["bands"] = _merge_appended(
            manifest["files"]["bands"],
            _diff_new_files(fs, mkpath, path, band_touch, pre_b),
        )
        manifest["files"]["sigs"] = _merge_appended(
            manifest["files"]["sigs"],
            _diff_new_files(
                fs, mkpath, f"{path}/{SIGS_DIR}", sig_touch, pre_s
            ),
        )
    per_bucket = {int(b): n for b, n in manifest["rows_per_bucket"].items()}
    for b, n in batch.items():
        per_bucket[b] = per_bucket.get(b, 0) + n
    sig_batch = sig_batch_pre
    sig_per_bucket = {
        int(b): n
        for b, n in manifest.get("sig_rows_per_bucket", {}).items()
    }
    for b, n in sig_batch.items():
        sig_per_bucket[b] = sig_per_bucket.get(b, 0) + n
    appended = sum(batch.values()) // manifest["bands"]
    manifest["n_docs"] += appended
    manifest["dropped_short"] += n_rows - appended
    manifest["rows_per_bucket"] = {
        str(b): n for b, n in sorted(per_bucket.items())
    }
    manifest["sig_rows_per_bucket"] = {
        str(b): n for b, n in sorted(sig_per_bucket.items())
    }
    if stream_batch_id is not None:
        # the streaming sink's replay fence commits in the SAME
        # manifest write as the counts and the file snapshot — one
        # commit point, so a crash can never leave them disagreeing
        manifest["last_stream_batch_id"] = int(stream_batch_id)
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def probe_minhash_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold: float | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs between a new batch and the stored corpus:
    ``(batch_id, index_id, est_jaccard)`` with est_jaccard (fraction
    of agreeing minhashes, the in-memory estimator) ≥ ``threshold``
    (default: the manifest's). Reads only the band buckets the batch
    touches and only the signature buckets holding candidate ids —
    both pruned at the file listing via driver-bounded IN-lists (≤
    ``n_buckets`` values each; when the batch covers most buckets the
    list is dropped and the scan runs flat).

    ``max_bucket`` drops stored band keys matched by more than that
    many stored rows from candidate generation — the degenerate
    boilerplate-bucket guard, same semantics as
    ``lsh_candidate_pairs``. A batch id equal to a stored id is
    skipped (a recrawl of the same key is not a *near-dup pair*).
    """
    band_rows, manifest = read_minhash_index(spark, path)
    id_col = manifest["id_col"]
    if threshold is None:
        threshold = manifest["threshold"]
    for c in (id_col, manifest["text_col"]):
        if c not in batch.columns:
            raise ValueError(
                f"batch is missing the index's {c!r} column (manifest: "
                f"id_col={manifest['id_col']!r}, "
                f"text_col={manifest['text_col']!r})"
            )
    # fan the (typically single-partition) batch out ONCE so both the
    # uniqueness-check job and the signing jobs run at cluster
    # parallelism (no-op for already-spread batches)
    from sparvi_core_spark.plans.fanout import fan_out_compact

    fanned = fan_out_compact(batch.select(id_col, manifest["text_col"]))
    _require_unique_ids(fanned, id_col, "batch")
    qbanded, qsigs = _signed(fanned, manifest)
    qbanded = qbanded.localCheckpoint()

    n_buckets = manifest["n_buckets"]
    # one job over the checkpointed batch yields BOTH the bucket
    # IN-list (bounded by n_buckets) and the row count that gates the
    # broadcast hints below
    qstats = qbanded.agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set("bucket").alias("buckets"),
    ).first()
    n_qrows = int(qstats["n"])
    buckets = sorted(int(b) for b in qstats["buckets"])
    if 0 < len(buckets) <= n_buckets // 2:
        pruned = band_rows.filter(F.col("bucket").isin(buckets))
    else:
        pruned = band_rows  # flat fallback: pruning would not help

    # Join direction matters: Catalyst sees a small parquet store and
    # an un-estimable checkpointed batch, and (measured at sf0.1)
    # broadcasts the ENTIRE band store to probe 8k batch rows — the
    # build side grows with the INDEX, exactly backwards for a serving
    # path. Hint the batch side instead whenever its measured row count
    # is broadcast-safe (~128 B/row: id + band + 32-char bkey), so the
    # store streams through a map-side hash join: one scan, no
    # store-sized build, no shuffle. Oversized batches fall back to
    # whatever AQE picks from real sizes.
    batch_fits = n_qrows * 128 <= _BROADCAST_MAX_BYTES
    qside = qbanded.select(
        F.col("id").alias("batch_id"), F.col("band"), F.col("bkey")
    )
    if batch_fits:
        qside = F.broadcast(qside)

    # degenerate-bucket cap on the stored side (broadcast anti-join of
    # the tiny over-cap key list, as in the in-memory tier). The gauge
    # itself is bounded by the BATCH, not the store: only (band, bkey)
    # keys the batch actually probes can generate candidates, so
    # semi-joining the scan against the batch's keys first keeps the
    # aggregate's state O(batch keys) instead of O(every stored key in
    # the pruned scan) — identical candidates (a capped key the batch
    # never probes was irrelevant either way), but the per-probe cost
    # no longer grows with index history at 100 TB. The semi-join
    # probes the SAME broadcast frame the candidate join builds (one
    # exchange, reused), gated on the same measured batch size; an
    # over-sized batch falls back to the flat gauge.
    gauge_scan = (
        pruned.join(qside, ["band", "bkey"], "left_semi")
        if batch_fits
        else pruned
    )
    over = (
        gauge_scan.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
    )
    pruned = pruned.join(F.broadcast(over), ["band", "bkey"], "left_anti")

    # tombstoned ids (deleted but not yet purged by compaction) are
    # excluded at candidate generation, so a delete takes effect on
    # the very next probe
    tomb = _read_tombstones(
        spark, path, "id", names=manifest["tombstone_files"]
    )
    if tomb is not None:
        pruned = pruned.join(F.broadcast(tomb), "id", "left_anti")
    cands = (
        pruned.select(
            F.col("id").alias("index_id"), F.col("band"), F.col("bkey")
        )
        .join(qside, ["band", "bkey"])
        .filter(F.col("index_id") != F.col("batch_id"))
        .select("batch_id", "index_id")
        .distinct()
    )
    # checkpoint BEFORE the sig-bucket collect below: that collect is
    # action #1 over the band join, and the returned verification plan
    # would otherwise recompute the same join as action #2 (the
    # probe-collect lesson from perplexity_buckets, VERDICT r8
    # "What's wrong" #2).  Candidate pairs are band-bucketed, so this
    # materializes O(batch × near-dups), not O(history).
    cands = cands.localCheckpoint()

    # verification: stored signatures for candidate index ids only —
    # their sig buckets are computable map-side and driver-bounded.
    # The same job also counts the candidates, gating the broadcast
    # hints below.
    cstats = cands.agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set(
            F.pmod(
                F.xxhash64(F.col("index_id"), F.lit("mh-sig")), F.lit(n_buckets)
            ).cast("int")
        ).alias("sb"),
    ).first()
    n_cands = int(cstats["n"])
    sbuckets = sorted(int(s) for s in cstats["sb"])
    sig_store = _sig_rows(spark, path, manifest)
    if not sbuckets:
        # no candidates at all — prune the verification scan to nothing
        # (PruneFilters folds this to an empty relation, no file reads)
        sig_store = sig_store.filter(F.lit(False))
    elif len(sbuckets) <= n_buckets // 2:
        sig_store = sig_store.filter(F.col("bucket").isin(sbuckets))

    num_hashes = manifest["num_hashes"]
    a = sig_store.select(
        F.col("id").alias("index_id"),
        *[F.col(f"h{k}").alias(f"ia_h{k}") for k in range(num_hashes)],
    )
    b = qsigs.select(
        F.col("id").alias("batch_id"),
        *[F.col(f"h{k}").alias(f"qb_h{k}") for k in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"ia_h{k}") == F.col(f"qb_h{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    # Same join-direction fix as candidate generation: without hints
    # Catalyst broadcasts the pruned SIG STORE (grows with the index)
    # into the tiny candidate frame. Stream the store once instead,
    # probing broadcast candidate ids, then resolve batch signatures
    # from a second batch-bounded broadcast — zero shuffles, and the
    # build sides are O(batch), never O(index). Both hints are
    # bytes-gated on measured counts (candidates: 2 ids/row; batch
    # sigs: id + K 32-char hex hashes).
    if n_cands * 32 <= _BROADCAST_MAX_BYTES:
        cands = F.broadcast(cands)
    if n_qrows * (16 + 48 * num_hashes) <= _BROADCAST_MAX_BYTES:
        b = F.broadcast(b)
    return (
        a.join(cands, "index_id")
        .join(b, "batch_id")
        .select(
            "batch_id",
            "index_id",
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def filter_new_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold: float | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """The incremental-crawl screen: batch rows whose text has NO
    near-duplicate already in the index (the stored-corpus analog of
    ``novelty_filter``). One probe + one anti-join; batch columns pass
    through untouched. Batch-internal duplicates are out of scope —
    run the batch dedup ops on what survives."""
    _, manifest = read_minhash_index(spark, path)
    hits = probe_minhash_index(spark, path, batch, threshold, max_bucket)
    dup_ids = hits.select(
        F.col("batch_id").alias(manifest["id_col"])
    ).distinct()
    return batch.join(dup_ids, manifest["id_col"], "left_anti")


def filter_unindexed_ids(
    spark: SparkSession, path: str, batch: DataFrame
) -> DataFrame:
    """Batch rows whose id is NOT already present in the index — the
    replay-idempotency screen: a crash-replayed micro-batch whose
    append already landed re-appends nothing (used by
    ``novelty_stream_fuzzy``; also the guard for at-least-once
    upstream feeds). Reads only the signature buckets the batch's own
    ids hash to — driver-bounded IN-list, pruned at the file listing;
    O(batch), never O(history)."""
    _, manifest = read_minhash_index(spark, path)
    id_col = manifest["id_col"]
    n_buckets = manifest["n_buckets"]
    buckets = sorted(
        int(r["bucket"])
        for r in batch.select(F.col(id_col).alias("id"))
        .withColumn("bucket", _sig_bucket("id", n_buckets))
        .select("bucket")
        .distinct()
        .collect()
    )
    sig_store = _sig_rows(spark, path, manifest)
    if not buckets:
        return batch  # empty batch: nothing to screen
    if len(buckets) <= n_buckets // 2:
        sig_store = sig_store.filter(F.col("bucket").isin(buckets))
    existing = sig_store.select(F.col("id").alias(id_col))
    return batch.join(existing, id_col, "left_anti")


@_locked("delete")
def delete_from_minhash_index(spark: SparkSession, path: str, ids) -> dict:
    """Delete-by-id — the takedown/robots-retroactive-removal verb.
    ``ids`` is a python sequence of id values or a DataFrame carrying
    the index's id column. The delete is LOGICAL and immediate:
    tombstoned ids stop appearing in probe results on the next probe;
    the next :func:`compact_minhash_index` folds the tombstones in,
    physically rewriting only the cells that held the deleted rows
    and reconciling the manifest. Until then, deleted ids may not be
    re-appended (``append_minhash_index`` refuses — purge first).
    Idempotent: re-deleting an id is a no-op. Returns
    ``{"requested", "tombstones_total", "pending_purge"}``."""
    _, manifest = read_minhash_index(spark, path)
    id_col = manifest["id_col"]
    sig_store = _sig_rows(spark, path, manifest)
    id_type = sig_store.schema["id"].dataType
    drop = _normalize_delete_ids(spark, ids, id_col, id_type)
    drop = drop.localCheckpoint()  # counted, appended, and presence-joined
    requested = drop.count()
    live_tombs = manifest["tombstone_files"]
    total, new_names = _append_tombstones(
        spark, path, drop, id_col, live_names=live_tombs
    )
    manifest["tombstone_files"] = sorted(set(live_tombs) | set(new_names))
    # how many tombstones (all, not just this call's) name a row that
    # is actually at rest — bucket-pruned presence check
    tomb = _read_tombstones(
        spark, path, id_col, names=manifest["tombstone_files"]
    ).localCheckpoint()
    buckets = sorted(
        int(r["bucket"])
        for r in tomb.withColumn("bucket", _sig_bucket(id_col, manifest["n_buckets"]))
        .select("bucket")
        .distinct()
        .collect()
    )
    if buckets and len(buckets) <= manifest["n_buckets"] // 2:
        sig_store = sig_store.filter(F.col("bucket").isin(buckets))
    pending = sig_store.join(
        F.broadcast(tomb.select(F.col(id_col).alias("id"))),
        "id",
        "left_semi",
    ).count()
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


def minhash_index_health(spark: SparkSession, path: str) -> DataFrame:
    """Per-bucket audit: manifest band rows vs actual rows on disk —
    the quick drift/corruption gauge (mirrors the other stored
    indexes' health checks)."""
    band_rows, manifest = read_minhash_index(spark, path)
    actual = band_rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("actual_rows")
    )
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
        .withColumn("ok", F.col("manifest_rows") == F.col("actual_rows"))
        .orderBy("bucket")
    )


def repair_minhash_index(spark: SparkSession, path: str) -> dict:
    """Heal a crashed swap on either store (band root or ``_sigs/``)
    under the snapshot-commit rule (see ``ann_index._repair_store``):
    the ONE manifest write that publishes both stores' file lists is
    the commit point, so a crash anywhere in a two-store fold/purge
    rolls BOTH stores back (neither referenced) or finishes BOTH
    (both referenced) — the two stores can never commit separately.
    Idempotent; no-op on a clean index."""
    from sparvi_core_spark.sources.ann_index import _repair_store

    try:
        manifest = json.loads(_read_text(spark, path, MANIFEST))
    except Exception:
        manifest = {}
    files = manifest.get("files", {})
    return {
        "bands": _repair_store(
            spark, path, live_files=files.get("bands")
        )["action"],
        "sigs": _repair_store(
            spark, f"{path}/{SIGS_DIR}", live_files=files.get("sigs")
        )["action"],
    }


@_locked("compact")
def compact_minhash_index(spark: SparkSession, path: str) -> dict:
    """Fold appended small files back to one file per bucket in BOTH
    stores — the hygiene pass for the append/streaming pipeline (each
    append adds one file to every touched bucket; after N crawl
    batches a probe opens ~N files per probed bucket). Cost is
    proportional to the FRAGMENTED fraction: buckets already at one
    file are not read or touched. Row identity is checked against the
    manifest per store BEFORE each swap; the swap is journaled and
    crash-healed by :func:`repair_minhash_index` (run here first).
    Single WRITER by contract; probes never quiesce — every swap is
    snapshot-committed (a probe keeps the file snapshot it planned
    with; replaced files wait for :func:`vacuum_minhash_index`), so a
    concurrent probe sees either the pre- or post-compaction index,
    never a mix.

    Pending deletes (:func:`delete_from_minhash_index`) are folded in
    FIRST: the cells holding tombstoned rows are rewritten without
    them (same journaled swap), per-bucket manifest counts are
    re-measured from disk (so a crash-interrupted purge re-run ends
    consistent no matter where the previous attempt died), and the
    tombstone store is cleared — after which the deleted ids may be
    re-appended. Returns per-store ``{"cells_compacted",
    "files_before", "files_after", "rows_rewritten"}`` plus a
    ``"purge"`` block when tombstones were folded."""
    from sparvi_core_spark.sources.ann_index import (
        _compact_cells,
        _finish_swap,
        _snapshot_read,
    )

    repair_minhash_index(spark, path)
    band_rows, manifest = read_minhash_index(spark, path)
    if "sig_rows_per_bucket" not in manifest:
        raise ValueError(
            "this index predates compaction support (no "
            "sig_rows_per_bucket in the manifest) — rebuild it with "
            "write_minhash_index"
        )
    # fold the staging store FIRST: staged rows move into their bucket
    # partitions via the same journaled swap (staging files ride the
    # journal's extra_old list), so the purge and file-fold below see
    # a purely partitioned store — a tombstoned id that was still in
    # staging is purged by the normal path right after its fold
    staging = _fold_staging(spark, path, manifest)
    if staging is not None:
        band_rows, manifest = read_minhash_index(spark, path)
    def _merge(store: str, delta):
        if not delta:
            return
        files = dict(manifest["files"][store])
        for b, names in delta.items():
            files[b] = names
        manifest["files"][store] = {
            b: files[b] for b in sorted(files, key=int)
        }

    purge = None
    tomb = _read_tombstones(
        spark, path, "id", names=manifest["tombstone_files"]
    )
    if tomb is not None:
        tomb = tomb.localCheckpoint()  # drives two purges
        band_purge = _purge_cells(
            spark, path, band_rows, "id", tomb,
            slice_salt="mh-band-slice",
            live_files=manifest["files"]["bands"],
        )
        _merge("bands", band_purge.pop("new_files", None))
        sig_purge = _purge_cells(
            spark,
            f"{path}/{SIGS_DIR}",
            _sig_store(spark, path, manifest),
            "id",
            tomb,
            slice_salt="mh-sig-slice",
            live_files=manifest["files"]["sigs"],
        )
        _merge("sigs", sig_purge.pop("new_files", None))
        # reconcile the manifest from the NEW snapshots (bucket is
        # the partition key, so these counts come from parquet
        # footers, not data pages) — measured truth survives any
        # crash/replay history
        band_snap = _snapshot_read(spark, path, manifest["files"]["bands"])
        sig_snap = _snapshot_read(
            spark, f"{path}/{SIGS_DIR}", manifest["files"]["sigs"]
        )
        per_bucket = {} if band_snap is None else _bucket_counts(band_snap)
        sig_per_bucket = {} if sig_snap is None else _bucket_counts(sig_snap)
        manifest["rows_per_bucket"] = {
            str(b): n for b, n in sorted(per_bucket.items())
        }
        manifest["sig_rows_per_bucket"] = {
            str(b): n for b, n in sorted(sig_per_bucket.items())
        }
        manifest["n_docs"] = sum(sig_per_bucket.values())
        manifest["purged_total"] = manifest.get("purged_total", 0) + int(
            sig_purge["rows_dropped"]
        )
        # tombstones are consumed by the SAME commit that publishes
        # BOTH purged stores — the physical tombstone files wait for
        # vacuum, so a probe's pinned anti-join never breaks
        manifest["tombstone_files"] = []
        manifest.pop("n_tombstones", None)
        manifest.pop("n_deleted_pending", None)
        _write_text(
            spark, path, MANIFEST,
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        _finish_swap(spark, path)
        _finish_swap(spark, f"{path}/{SIGS_DIR}")
        purge = {"bands": band_purge, "sigs": sig_purge}
        band_rows, manifest = read_minhash_index(spark, path)
    # both stores carry the signature kernel's "id" column (the
    # manifest's id_col is the CALLER-side name)
    band_stats = _compact_cells(
        spark, path, band_rows, "id",
        manifest["rows_per_bucket"], 1, slice_salt="mh-band-slice",
        live_files=manifest["files"]["bands"],
    )
    _merge("bands", band_stats.pop("new_files", None))
    sig_stats = _compact_cells(
        spark, f"{path}/{SIGS_DIR}",
        _sig_store(spark, path, manifest), "id",
        manifest["sig_rows_per_bucket"], 1, slice_salt="mh-sig-slice",
        live_files=manifest["files"]["sigs"],
    )
    _merge("sigs", sig_stats.pop("new_files", None))
    if band_stats["cells_compacted"] or sig_stats["cells_compacted"]:
        manifest["compactions"] = manifest.get("compactions", 0) + 1
        _write_text(
            spark, path, MANIFEST,
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        _finish_swap(spark, path)
        _finish_swap(spark, f"{path}/{SIGS_DIR}")
    out = {"bands": band_stats, "sigs": sig_stats}
    if purge is not None:
        out["purge"] = purge
    if staging is not None:
        out["staging"] = staging
    return out


def _fold_staging(spark: SparkSession, path: str, manifest: dict):
    """Move staged appends into the bucket partitions of both stores —
    append-shaped (``_fold_staged_cells``): ONLY the staged mass is
    rewritten and journal-renamed into the bucket dirs as additional
    files. Snapshot-committed: BOTH stores' folds publish in the ONE
    manifest write here (which also empties ``staging_files``), so
    the two stores commit atomically — a crash before the write rolls
    both back, after it both are final (closing the r11-ADVICE note
    about the two independent swaps). The consumed staging files stay
    on disk for any in-flight probe until ``vacuum_minhash_index``.
    O(staged) write traffic; manifest counts are already logical, so
    nothing moves there. Returns per-store stats, or None when
    nothing is staged. Caller holds the writer lock and has run
    repair."""
    from sparvi_core_spark.sources.ann_index import (
        _fold_staged_cells,
        _finish_swap,
        _merge_appended,
        _read_staging_names,
    )

    band_names = manifest["staging_files"]["bands"]
    sig_names = manifest["staging_files"]["sigs"]
    if not band_names and not sig_names:
        return None
    out = {}
    if band_names:
        out["bands"] = _fold_staged_cells(
            spark, path,
            _read_staging_names(spark, path, "bands", band_names), "id",
            1, slice_salt="mh-band-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/bands/{n}" for n in band_names
            ],
            snapshot=True,
        )
        manifest["files"]["bands"] = _merge_appended(
            manifest["files"]["bands"], out["bands"].pop("new_files", {})
        )
        manifest["staging_files"]["bands"] = []
    if sig_names:
        out["sigs"] = _fold_staged_cells(
            spark, f"{path}/{SIGS_DIR}",
            _read_staging_names(spark, path, "sigs", sig_names), "id",
            1, slice_salt="mh-sig-slice",
            staged_files=[
                f"{path}/{STAGING_DIR}/sigs/{n}" for n in sig_names
            ],
            snapshot=True,
        )
        manifest["files"]["sigs"] = _merge_appended(
            manifest["files"]["sigs"], out["sigs"].pop("new_files", {})
        )
        manifest["staging_files"]["sigs"] = []
    _write_text(
        spark, path, MANIFEST, json.dumps(manifest, indent=1, sort_keys=True)
    )
    _finish_swap(spark, path)
    _finish_swap(spark, f"{path}/{SIGS_DIR}")
    return out


@_locked("fold-staging")
def fold_staging_minhash_index(spark: SparkSession, path: str) -> dict:
    """The cheap, high-frequency maintenance verb: fold the staging
    tier into both stores' bucket partitions without reading or
    rewriting any existing store file — O(staged bytes). Pending
    tombstones stay pending (probes already exclude them); the full
    :func:`compact_minhash_index` purges and sweeps fan-in at its own
    cadence. No-op ``{}`` when nothing is staged."""
    repair_minhash_index(spark, path)
    _, manifest = read_minhash_index(spark, path)
    return _fold_staging(spark, path, manifest) or {}


@_locked("vacuum")
def vacuum_minhash_index(
    spark: SparkSession, path: str, older_than_s: float = 0.0
) -> dict:
    """Delete the index's unreferenced files across both stores,
    staging, and tombstones (see ``ann_index._vacuum_stores``): files
    replaced by committed swaps, staging/tombstone files consumed by
    committed folds/purges, and crashed-append orphans — none of
    which any probe can be planning against, once unreferenced for
    ``older_than_s`` seconds. Size the window past the longest
    probe; 0 deletes immediately (safe only with no reader in
    flight)."""
    from sparvi_core_spark.sources.ann_index import (
        _snapshot_files,
        _snapshot_staging,
        _vacuum_stores,
    )

    repair_minhash_index(spark, path)
    manifest = json.loads(_read_text(spark, path, MANIFEST))
    return _vacuum_stores(
        spark, path,
        stores={
            "bands": (path, _snapshot_files(manifest, "bands")),
            "sigs": (
                f"{path}/{SIGS_DIR}", _snapshot_files(manifest, "sigs")
            ),
        },
        staging={
            "bands": ("bands", _snapshot_staging(manifest, "bands")),
            "sigs": ("sigs", _snapshot_staging(manifest, "sigs")),
        },
        tombstones=manifest.get("tombstone_files", []),
        older_than_s=older_than_s,
    )


def compact_minhash_index_if(
    spark: SparkSession, path: str, max_files_per_bucket: int = 16
) -> dict:
    """:func:`compact_minhash_index` iff some bucket of EITHER store
    (band root or ``_sigs/``) exceeds ``max_files_per_bucket`` files —
    the auto-compaction trigger for the append/streaming pipeline
    (``dedup-index append --auto-compact`` and
    ``novelty_stream_fuzzy(auto_compact=N)`` call this after every
    append). Below the threshold the cost is one directory listing;
    gauge + fold run atomically under the writer lock."""
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
            "bands": (
                "bucket",
                lambda s: live_fragmentation(_man(s)["files"]["bands"]),
            ),
            "sigs": (
                "bucket",
                lambda s: live_fragmentation(_man(s)["files"]["sigs"]),
            ),
            # staged files count as per-bucket fan-in: every probe
            # reads all of staging (LIVE lists — garbage awaiting
            # vacuum is read by nobody and must not trigger work)
            "staging": (
                "staging",
                lambda s: _staging_gauge_live(
                    _man(s)["staging_files"]["bands"]
                    + _man(s)["staging_files"]["sigs"]
                ),
            ),
        },
        max_files_per_bucket,
        lambda: compact_minhash_index(spark, path),
        fold=lambda: fold_staging_minhash_index(spark, path),
    )


def reband_minhash_index(
    spark: SparkSession,
    path: str,
    dest: str,
    threshold: float | None = None,
    bands: int | None = None,
    n_buckets: int | None = None,
) -> dict:
    """Build a NEW index at ``dest`` with a different banding (and so
    a different operating threshold) from the SIGNATURES already at
    rest — the corpus text is never touched. Band keys are pure
    functions of the stored ``h0..h{K-1}`` columns, so re-banding a
    petabyte-scale corpus costs one scan of the K×16-byte signature
    store instead of re-shingling 100 TB of text. Blue/green like
    ``retrain_ivf_index``: never in place (``dest == path`` raises);
    the old index serves until the caller flips the path.

    ``bands=None`` solves the banding for ``threshold`` over the
    stored ``num_hashes``; at least one of the two must be given.
    Returns the new manifest."""
    if path.rstrip("/") == dest.rstrip("/"):
        raise ValueError(
            "reband_minhash_index is blue/green by contract: dest must "
            "differ from the source index path"
        )
    _, manifest = read_minhash_index(spark, path)
    if _read_tombstones(
        spark, path, "id", names=manifest["tombstone_files"]
    ) is not None:
        raise ValueError(
            "source index has pending deletes — run "
            "compact_minhash_index (which purges tombstones) before "
            "rebanding, or the deleted docs would be carried into the "
            "new index"
        )
    num_hashes = manifest["num_hashes"]
    if bands is None:
        if threshold is None:
            raise ValueError("give threshold or bands (or both)")
        bands, _rows = solve_lsh_bands(threshold, num_hashes)
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    if threshold is None:
        threshold = manifest["threshold"]
    if n_buckets is None:
        n_buckets = manifest["n_buckets"]
    sigs = _sig_rows(spark, path, manifest).drop("bucket")
    new_man = dict(
        manifest,
        bands=bands,
        threshold=threshold,
        n_buckets=n_buckets,
    )
    banded = _band_hashes(sigs, num_hashes, bands).withColumn(
        "bucket", _band_bucket(n_buckets)
    )
    new_sigs = sigs.withColumn("bucket", _sig_bucket("id", n_buckets))
    _write_stores(banded, new_sigs, dest, "overwrite")
    # snapshot commit for the NEW index: adopt the fresh write's files
    from sparvi_core_spark.sources.ann_index import (
        _index_fs,
        _physical_cells,
    )

    _, fs, mkpath = _index_fs(spark, dest)
    new_man["files"] = {
        "bands": _physical_cells(fs, mkpath, dest),
        "sigs": _physical_cells(fs, mkpath, f"{dest}/{SIGS_DIR}"),
    }
    new_man["staging_files"] = {"bands": [], "sigs": []}
    new_man["tombstone_files"] = []
    per_bucket = _bucket_counts(_band_store(spark, dest, new_man))
    sig_per_bucket = _bucket_counts(_sig_store(spark, dest, new_man))
    n_docs = sum(sig_per_bucket.values())
    if n_docs != manifest["n_docs"]:
        raise ValueError(
            f"reband saw {n_docs} signatures where the source manifest "
            f"records {manifest['n_docs']} — source index inconsistent"
        )
    new_man.update(
        rows_per_bucket={str(b): n for b, n in sorted(per_bucket.items())},
        sig_rows_per_bucket={
            str(b): n for b, n in sorted(sig_per_bucket.items())
        },
    )
    new_man.pop("compactions", None)
    new_man.pop("last_stream_batch_id", None)
    _write_text(
        spark, dest, MANIFEST, json.dumps(new_man, indent=1, sort_keys=True)
    )
    return new_man
