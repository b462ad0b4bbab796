"""IVF-PQ index on storage (`sources/ivfpq_index.py`): codes on disk,
floats optional. The pins: (1) the stored-index search EQUALS the
in-memory `ivfpq_search` on the same (corpus, centroids, codebook,
nprobe) — which transitively carries the IVFADC distance identity the
quantization tests pin; (2) the scan is partition-pruned at the FILE
LISTING (non-probed cells never leave disk); (3) the data files hold
codes only — no float column at rest; (4) exact re-rank from the
`_floats/` store reproduces brute-force L2 when every cell is probed
and the candidate pool covers the corpus, and never has worse recall
than ADC-only on the same probes."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.sources.ivfpq_index import (
    append_ivfpq_index,
    read_ivfpq_index,
    search_ivfpq_index,
    write_ivfpq_index,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """One planted-cluster corpus + trained coarse/residual models +
    a written index, shared across tests (training is the slow part)."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        ivfpq_encode,
        pq_train,
    )
    from sparvi_core_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(31)
    protos = rng.normal(size=(6, 8)) * 10
    rows = []
    for vid in range(180):
        p = protos[vid % 6]
        rows.append((vid, [float(x) for x in p + rng.normal(size=8) * 0.6]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.localCheckpoint()
    cents, _ = kmeans_fit(df, k=6, max_iter=15, seed=7)
    cents = cents.localCheckpoint()
    res = ivf_residuals(df, cents)
    cb, _ = pq_train(
        res, m=2, ks=16, id_col="id", vec_col="residual", max_iter=10, seed=9
    )
    cb = cb.localCheckpoint()
    coded = ivfpq_encode(df, cents, cb).localCheckpoint()
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    man = write_ivfpq_index(
        df, cents, cb, path, store_floats=True, files_per_bucket=1
    )
    return {
        "df": df,
        "cents": cents,
        "cb": cb,
        "coded": coded,
        "path": path,
        "man": man,
    }


def test_write_read_roundtrip_and_manifest(spark, built):
    coded, cents, cb, man = read_ivfpq_index(spark, built["path"])
    assert man == built["man"]
    assert man["format"] == "sparvi-ivfpq-index/2"
    # snapshot commit: the manifest records both stores' live files
    assert sorted(man["files"]["codes"]) == sorted(man["rows_per_bucket"])
    assert man["staging_files"] == {"codes": [], "floats": []}
    assert man["tombstone_files"] == []
    assert man["n_vectors"] == 180 and man["dropped_null"] == 0
    assert man["m"] == 2 and man["ks"] == 16 and man["dim"] == 8
    assert sum(man["rows_per_bucket"].values()) == 180
    assert coded.count() == 180
    # stored codes == in-memory encode, row for row
    got = {r["vec_id"]: list(r["codes"]) for r in coded.collect()}
    want = {r["id"]: list(r["codes"]) for r in built["coded"].collect()}
    assert got == want
    # codebook round-trips exactly
    a = sorted(
        (r["subspace"], r["code"], tuple(r["centroid"]))
        for r in cb.collect()
    )
    b = sorted(
        (r["subspace"], r["code"], tuple(r["centroid"]))
        for r in built["cb"].collect()
    )
    assert a == b


def test_data_files_hold_codes_only(spark, built):
    """The 200× claim depends on the data files carrying NO floats:
    schema of the cell files is (id, codes) + the bucket partition
    column, and the float store lives apart under _floats/."""
    coded = spark.read.parquet(built["path"])
    assert sorted(coded.columns) == ["bucket", "codes", "vec_id"]
    floats = spark.read.parquet(f"{built['path']}/_floats")
    assert "embedding" in floats.columns and "bucket" in floats.columns
    assert floats.count() == 180


def test_search_equals_in_memory_ivfpq(spark, built):
    """Stored-path == in-memory ivfpq_search, value for value — this
    transitively pins the IVFADC distance identity on the stored path."""
    from sparvi_core_spark.operators.quantization import ivfpq_search

    queries = built["df"].filter(F.col("vec_id") % 36 == 0)  # 5 queries
    got = sorted(
        map(
            tuple,
            search_ivfpq_index(
                spark, built["path"], queries, k=7, nprobe=2
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivfpq_search(
                queries,
                built["coded"],
                built["cents"],
                built["cb"],
                k=7,
                nprobe=2,
                code_id_col="id",
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_search_prunes_files_to_probed_cells(spark, built):
    """Pruning happens at the file listing: the executed search plan
    carries the bucket predicate in PartitionFilters (directory-level
    pruning, not a post-scan row filter), and Spark's own scan metrics
    report only the probed cells' files were read."""
    from test_ann_index import _scan_metrics

    queries = built["df"].filter(F.col("vec_id") == 0)
    res = search_ivfpq_index(spark, built["path"], queries, k=3, nprobe=2)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert "bucket" in pf and ("IN" in pf or "in" in pf)
    coded, _, _, man = read_ivfpq_index(spark, built["path"])
    total_files = len(coded.inputFiles())
    assert len(man["rows_per_bucket"]) >= 4
    files_read, parts_read = _scan_metrics(res)
    assert parts_read == 2
    assert 0 < files_read < total_files


def test_append_accumulates_and_search_finds_new(spark, built, tmp_path):
    """Daily-ingest path: append a batch to a COPY of the index, the
    manifest accumulates, stored codes for the batch equal encoding
    against the frozen codebook, and a search whose query IS a new
    vector returns it as its own nearest neighbor (distance 0 at
    rank 1 after exact re-rank)."""
    import shutil

    from sparvi_core_spark.operators.quantization import ivfpq_encode

    path2 = str(tmp_path / "idx2")
    shutil.copytree(built["path"], path2)
    rng = np.random.default_rng(77)
    newrows = [
        (1000 + i, [float(x) for x in rng.normal(size=8) * 10])
        for i in range(12)
    ]
    batch = spark.createDataFrame(newrows, "vec_id long, embedding array<double>")
    man2 = append_ivfpq_index(batch, path2)
    assert man2["n_vectors"] == 192 and man2["appends"] == 1
    assert sum(man2["rows_per_bucket"].values()) == 192
    coded2, _, _, _ = read_ivfpq_index(spark, path2)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in coded2.filter(F.col("vec_id") >= 1000).collect()
    }
    want = {
        r["id"]: list(r["codes"])
        for r in ivfpq_encode(
            batch, built["cents"], built["cb"]
        ).collect()
    }
    assert got == want and len(got) == 12
    q = batch.limit(1)
    qid = q.first()["vec_id"]
    top = (
        search_ivfpq_index(spark, path2, q, k=1, nprobe=1, rerank=4)
        .first()
    )
    assert top["query_id"] == qid
    assert top["neighbor_id"] == qid and top["distance"] == 0.0
    # duplicate-id batch refused, manifest untouched
    with pytest.raises(ValueError, match="duplicate"):
        append_ivfpq_index(batch.union(batch.limit(1)), path2)
    assert json.loads(
        open(f"{path2}/_ivfpq_manifest.json").read()
    ) == man2


def test_rerank_exact_when_everything_probed(spark, built):
    """With every cell probed and the candidate pool covering the
    corpus, re-rank == brute-force L2 top-k (NumPy oracle). This is
    the recall ceiling: ADC error is fully removed, only cell recall
    remains — and here no cell is unprobed."""
    queries = built["df"].filter(F.col("vec_id") % 60 == 0)  # 3 queries
    got = search_ivfpq_index(
        spark, built["path"], queries, k=5, nprobe=6, rerank=180
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in built["df"].collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["distance"])
        )
    assert len(by_q) == 3
    for qid, hits in by_q.items():
        hits.sort()
        exact = sorted(
            (round(float(np.linalg.norm(vecs[qid] - v)), 4), i)
            for i, v in vecs.items()
        )[:5]
        assert [(n, d) for _, n, d in hits] == [(i, d) for d, i in exact]


def test_rerank_recall_never_below_adc(spark, built):
    """Same probes, same candidate budget: exact re-rank's recall@5
    vs float truth is >= ADC-only's (quantization error only ever
    hurts)."""
    queries = built["df"].filter(F.col("vec_id") % 36 == 1)  # 5 queries
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in built["df"].collect()}

    def recall(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        h = t = 0
        for qid, found in by_q.items():
            truth = {
                i
                for _, i in sorted(
                    (np.linalg.norm(vecs[qid] - v), i)
                    for i, v in vecs.items()
                )[:5]
            }
            h += len(truth & found)
            t += len(truth)
        return h / t

    adc = recall(
        search_ivfpq_index(spark, built["path"], queries, k=5, nprobe=2).collect()
    )
    rr = recall(
        search_ivfpq_index(
            spark, built["path"], queries, k=5, nprobe=2, rerank=25
        ).collect()
    )
    assert rr >= adc
    assert rr >= 0.9  # clustered data, 2 probes: near-exact


def test_validation_guards(spark, built, tmp_path):
    df, cents, cb = built["df"], built["cents"], built["cb"]
    with pytest.raises(ValueError, match="files_per_bucket"):
        write_ivfpq_index(df, cents, cb, str(tmp_path / "x"), files_per_bucket=0)
    with pytest.raises(ValueError, match="duplicate"):
        write_ivfpq_index(df.union(df.limit(1)), cents, cb, str(tmp_path / "x"))
    # rerank demands a float store and rerank >= k
    nofloat = str(tmp_path / "nofloat")
    write_ivfpq_index(df, cents, cb, nofloat, store_floats=False)
    q = df.limit(1)
    with pytest.raises(ValueError, match="store_floats"):
        search_ivfpq_index(spark, nofloat, q, k=3, rerank=5)
    with pytest.raises(ValueError, match="rerank"):
        search_ivfpq_index(spark, built["path"], q, k=5, rerank=3)
    # wrong-dim append refused
    bad = spark.createDataFrame(
        [(9000, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        append_ivfpq_index(bad, built["path"])
    # not-an-ivfpq path refuses cleanly
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    with pytest.raises(Exception):
        read_ivfpq_index(spark, plain)


@pytest.mark.slow
def test_compact_folds_codes_and_floats(spark, built, tmp_path):
    """Three appends fragment both the code files and the _floats/
    side-store; compaction folds each back to files_per_bucket,
    touches ONLY fragmented cells, and the search answer is identical
    before and after (same journaled engine as the float index)."""
    import shutil

    from sparvi_core_spark.sources.ivfpq_index import compact_ivfpq_index

    path = str(tmp_path / "idx_c")
    shutil.copytree(built["path"], path)
    rng = np.random.default_rng(13)
    for b in range(3):
        batch = spark.createDataFrame(
            [
                (2000 + 50 * b + i, [float(x) for x in rng.normal(size=8) * 10])
                for i in range(15)
            ],
            "vec_id long, embedding array<double>",
        )
        append_ivfpq_index(batch, path)
    queries = built["df"].filter(F.col("vec_id") % 60 == 0)
    before = sorted(
        map(
            tuple,
            search_ivfpq_index(
                spark, path, queries, k=5, nprobe=6, rerank=20
            ).collect(),
        )
    )
    stats = compact_ivfpq_index(spark, path)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    assert stats["floats"]["cells_compacted"] > 0
    coded, _, _, man = read_ivfpq_index(spark, path)
    assert man["compactions"] == 1
    # every cell is back at <= files_per_bucket files, both stores
    import os

    # physical layout catches up at vacuum (replaced files are
    # retired, never deleted under a possible reader)
    from sparvi_core_spark.sources.ivfpq_index import vacuum_ivfpq_index

    vacuum_ivfpq_index(spark, path)
    for root in (path, f"{path}/_floats"):
        for b in man["rows_per_bucket"]:
            d = f"{root}/bucket={b}"
            if os.path.isdir(d):
                n = len(
                    [f for f in os.listdir(d) if not f.startswith((".", "_"))]
                )
                assert n <= man["files_per_bucket"], (root, b, n)
    assert coded.count() == man["n_vectors"] == 225
    after = sorted(
        map(
            tuple,
            search_ivfpq_index(
                spark, path, queries, k=5, nprobe=6, rerank=20
            ).collect(),
        )
    )
    assert after == before
    # idempotent: a second run finds nothing fragmented
    again = compact_ivfpq_index(spark, path)
    assert again["cells_compacted"] == 0


@pytest.mark.slow
def test_retrain_blue_green(spark, built, tmp_path):
    """Retrain re-fits BOTH models from the float store and writes a
    NEW index; in-place is refused; a codes-only index demands the
    corpus be passed in. The retrained index answers exactly like
    brute force under full probing + full re-rank (the write-path
    identity, on freshly-fit models)."""
    from sparvi_core_spark.sources.ivfpq_index import retrain_ivfpq_index

    with pytest.raises(ValueError, match="blue/green"):
        retrain_ivfpq_index(spark, built["path"], built["path"])
    dest = str(tmp_path / "idx_rt")
    man2, km_info, pq_info = retrain_ivfpq_index(
        spark, built["path"], dest, k=4, max_iter=5
    )
    assert man2["k"] == 4 and man2["n_vectors"] == 180
    assert man2["m"] == 2 and man2["ks"] == 16
    assert km_info["iterations"] >= 1 and pq_info["iterations"] >= 1
    queries = built["df"].filter(F.col("vec_id") % 90 == 0)  # 2 queries
    got = search_ivfpq_index(
        spark, dest, queries, k=3, nprobe=4, rerank=180
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in built["df"].collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["distance"])
        )
    for qid, hits in by_q.items():
        hits.sort()
        exact = sorted(
            (round(float(np.linalg.norm(vecs[qid] - v)), 4), i)
            for i, v in vecs.items()
        )[:3]
        assert [(n, d) for _, n, d in hits] == [(i, d) for d, i in exact]
    # codes-only index: retrain must demand the corpus
    nofloat = str(tmp_path / "nf")
    write_ivfpq_index(
        built["df"], built["cents"], built["cb"], nofloat, store_floats=False
    )
    with pytest.raises(ValueError, match="store_floats"):
        retrain_ivfpq_index(spark, nofloat, str(tmp_path / "nf2"))
    man3, _, _ = retrain_ivfpq_index(
        spark, nofloat, str(tmp_path / "nf2"), vectors=built["df"], max_iter=3
    )
    assert man3["n_vectors"] == 180 and man3["store_floats"] is False


@pytest.mark.slow
def test_streaming_pq_ingest_and_replay_skip(spark, built, tmp_path):
    """Micro-batch ingest into the coded index: three one-file batches
    accumulate exactly (codes + floats), the manifest tracks the last
    stream batch id, and a pre-marked batch id is skipped on replay."""
    import json
    import shutil

    from sparvi_core_spark.sources.ann_index import _write_text
    from sparvi_core_spark.sources.ivfpq_index import MANIFEST
    from sparvi_core_spark.streaming.ann_index_stream import (
        index_pq_stream_batches,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events

    path = str(tmp_path / "idx_s")
    shutil.copytree(built["path"], path)
    rng = np.random.default_rng(19)
    new = spark.createDataFrame(
        [
            (5000 + i, [float(x) for x in rng.normal(size=8) * 10])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    src = str(tmp_path / "src")
    new.repartition(3).write.parquet(src)
    q = index_pq_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    coded, _, _, man = read_ivfpq_index(spark, path)
    assert man["n_vectors"] == 210 and man["appends"] == 3
    assert man["last_stream_batch_id"] == 2
    assert coded.count() == 210
    assert spark.read.parquet(f"{path}/_floats").count() == 210
    # replay: mark the last batch as already landed, re-run the stream
    man["last_stream_batch_id"] = 99
    _write_text(spark, path, MANIFEST, json.dumps(man))
    q2 = index_pq_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination()
    _, _, _, man2 = read_ivfpq_index(spark, path)
    assert man2["n_vectors"] == 210  # nothing double-appended


@pytest.mark.slow
def test_opq_rotated_index(spark, built, tmp_path):
    """OPQ composition: an index written with a rotation stores the
    matrix, rotates appends and queries automatically, and — because
    orthogonal rotations preserve L2 — (1) equals a plain index built
    on pre-rotated vectors queried with pre-rotated queries, value for
    value, and (2) exact re-rank reproduces brute-force L2 in the
    ORIGINAL space."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        pq_train,
        rotate_vectors,
    )
    from sparvi_core_spark.operators.similarity import kmeans_fit

    df = built["df"]
    rng = np.random.default_rng(41)
    R = np.linalg.qr(rng.normal(size=(8, 8)))[0].tolist()
    rot = rotate_vectors(df, R).localCheckpoint()
    cents, _ = kmeans_fit(rot, k=5, max_iter=10, seed=3)
    cents = cents.localCheckpoint()
    cb, _ = pq_train(
        ivf_residuals(rot, cents), m=2, ks=16,
        id_col="id", vec_col="residual", max_iter=8, seed=5,
    )
    cb = cb.localCheckpoint()

    opq_path = str(tmp_path / "opq")
    man = write_ivfpq_index(
        df, cents, cb, opq_path, store_floats=True, rotation=R
    )
    assert man["rotated"] is True
    plain_path = str(tmp_path / "plain")
    write_ivfpq_index(rot, cents, cb, plain_path, store_floats=True)

    queries = df.filter(F.col("vec_id") % 45 == 0)  # 4 queries
    got = sorted(
        map(
            tuple,
            search_ivfpq_index(spark, opq_path, queries, k=5, nprobe=2)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            search_ivfpq_index(
                spark, plain_path, rotate_vectors(queries, R), k=5, nprobe=2
            ).collect(),
        )
    )
    assert got == want and len(got) == 20

    # exact re-rank == brute-force L2 in ORIGINAL space
    rr = search_ivfpq_index(
        spark, opq_path, queries, k=3, nprobe=5, rerank=180
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    by_q = {}
    for r in rr:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["distance"])
        )
    for qid, hits in by_q.items():
        hits.sort()
        exact = sorted(
            (round(float(np.linalg.norm(vecs[qid] - v)), 4), i)
            for i, v in vecs.items()
        )[:3]
        assert [(n, d) for _, n, d in hits] == [(i, d) for d, i in exact]

    # append rotates the batch against the stored matrix: the new
    # vector, queried in ORIGINAL space, is its own nearest neighbor
    batch = spark.createDataFrame(
        [(7000, [float(x) for x in rng.normal(size=8) * 10])],
        "vec_id long, embedding array<double>",
    )
    append_ivfpq_index(batch, opq_path)
    top = search_ivfpq_index(
        spark, opq_path, batch, k=1, nprobe=2, rerank=4
    ).first()
    assert top["neighbor_id"] == 7000 and top["distance"] == 0.0

    # retrain keeps the rotation and stays self-consistent
    from sparvi_core_spark.sources.ivfpq_index import retrain_ivfpq_index

    dest = str(tmp_path / "opq_rt")
    man2, _, _ = retrain_ivfpq_index(spark, opq_path, dest, max_iter=4)
    assert man2["rotated"] is True and man2["n_vectors"] == 181
    top2 = search_ivfpq_index(
        spark, dest, queries.limit(1), k=1, nprobe=5, rerank=4
    ).first()
    assert top2["neighbor_id"] == top2["query_id"]
    assert top2["distance"] == 0.0

    # shape guard: wrong-dim rotation refused before any file lands
    bad = np.eye(4).tolist()
    with pytest.raises(ValueError, match="rotation"):
        write_ivfpq_index(
            df, cents, cb, str(tmp_path / "bad"), rotation=bad
        )


@pytest.mark.slow
def test_delete_by_id_lifecycle(spark, built, tmp_path):
    """Takedown on the IVF-PQ index: tombstoned ids vanish from ADC
    AND reranked search immediately; compaction purges codes + floats
    and reconciles the manifest; a fresh index is built so the shared
    fixture is never mutated."""
    import json

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.ivfpq_index import (
        MANIFEST,
        append_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        search_ivfpq_index,
        write_ivfpq_index,
    )

    path = str(tmp_path / "idx")
    write_ivfpq_index(
        built["df"], built["cents"], built["cb"], path,
        store_floats=True, files_per_bucket=1,
    )
    queries = built["df"].filter(F.col("vec_id") % 45 == 0)
    n0 = built["man"]["n_vectors"]

    before = search_ivfpq_index(spark, path, queries, k=5, nprobe=6)
    victims = sorted(
        {r["neighbor_id"] for r in before.collect()}
        - {r["vec_id"] for r in queries.collect()}
    )[:3]

    stats = delete_from_ivfpq_index(spark, path, victims)
    assert stats["requested"] == 3 and stats["pending_purge"] == 3

    def neighbors(**kw):
        return {
            r["neighbor_id"]
            for r in search_ivfpq_index(
                spark, path, queries, nprobe=6, **kw
            ).collect()
        }

    assert not (neighbors(k=5) & set(victims))          # ADC path
    assert not (neighbors(k=3, rerank=8) & set(victims))  # rerank path

    with pytest.raises(ValueError, match="tombstoned"):
        append_ivfpq_index(
            built["df"].filter(F.col("vec_id") == victims[0]), path
        )

    out = compact_ivfpq_index(spark, path)
    assert out["purge"]["codes"]["rows_dropped"] == 3
    assert out["purge"]["floats"]["rows_dropped"] == 3
    man = json.loads(_read_text(spark, path, MANIFEST))
    assert man["n_vectors"] == n0 - 3 and man["purged_total"] == 3
    assert "n_tombstones" not in man
    assert not (neighbors(k=5) & set(victims))

    append_ivfpq_index(
        built["df"].filter(F.col("vec_id") == victims[0]), path
    )
    assert "purge" not in compact_ivfpq_index(spark, path)


@pytest.mark.slow
def test_staged_append_ivfpq_parity_and_fold(spark, tmp_path, built):
    """IVF-PQ staging tier: a staged append creates one file per store
    (codes + _floats), ADC search and rerank see staged rows (parity
    with a normal-append twin), and the fold restores pure cell
    partitions — including purging a still-staged takedown."""
    import os
    import shutil

    from sparvi_core_spark.sources.ann_index import _staging_files
    from sparvi_core_spark.sources.ivfpq_index import (
        append_ivfpq_index,
        compact_ivfpq_index_if,
        delete_from_ivfpq_index,
    )

    a = str(tmp_path / "normal")
    b = str(tmp_path / "staged")
    shutil.copytree(built["path"], a)
    shutil.copytree(built["path"], b)

    rng = np.random.default_rng(77)
    rows = [
        (10_000 + i, [float(x) for x in rng.normal(size=8)])
        for i in range(30)
    ]
    gen = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    append_ivfpq_index(gen, a)
    append_ivfpq_index(gen, b, staged=True)
    assert len(_staging_files(spark, b, "codes")) == 1
    assert len(_staging_files(spark, b, "floats")) == 1

    queries = built["df"].limit(6).select("vec_id", "embedding")
    for kw in ({}, {"rerank": 10}):
        got_a = sorted(map(tuple, search_ivfpq_index(
            spark, a, queries, k=5, nprobe=2, **kw).collect()))
        got_b = sorted(map(tuple, search_ivfpq_index(
            spark, b, queries, k=5, nprobe=2, **kw).collect()))
        assert got_a == got_b and len(got_b) > 0

    victim = 10_000
    delete_from_ivfpq_index(spark, b, [victim])
    assert not any(
        r["neighbor_id"] == victim
        for r in search_ivfpq_index(
            spark, b, queries, k=60, nprobe=6
        ).collect()
    )

    out = compact_ivfpq_index_if(spark, b, max_files_per_bucket=1)
    # 2 staged files > 1 with clean cell dirs -> the CHEAP tier:
    # append-shaped staging fold, no store rewrite, tombstone pending
    assert out["folded"] is True and out["compacted"] is False
    assert out["stats"]["codes"]["rows_folded"] == 30
    assert out["stats"]["floats"]["rows_folded"] == 30
    # staging is unreferenced at the fold's commit; physical files
    # wait for vacuum
    import json as _json

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.ivfpq_index import MANIFEST

    man_fold = _json.loads(_read_text(spark, b, MANIFEST))
    assert man_fold["staging_files"] == {"codes": [], "floats": []}
    # the FULL compact purges the pending tombstone
    from sparvi_core_spark.sources.ivfpq_index import compact_ivfpq_index

    full = compact_ivfpq_index(spark, b)
    assert full["purge"]["codes"]["rows_dropped"] == 1
    assert "staging" not in full
    delete_from_ivfpq_index(spark, a, [victim])
    got_a2 = sorted(map(tuple, search_ivfpq_index(
        spark, a, queries, k=5, nprobe=2, rerank=10).collect()))
    got_b2 = sorted(map(tuple, search_ivfpq_index(
        spark, b, queries, k=5, nprobe=2, rerank=10).collect()))
    assert got_b2 == got_a2 and len(got_b2) > 0


@pytest.mark.slow
def test_crash_window_replay_heals_both_stores(spark, built, tmp_path):
    """Snapshot commits, coded-index side: the ONE manifest write
    publishes counts AND both stores' file lists, so (a) a crash that
    lands the CODES append but not the ``_floats/`` one leaves the
    codes orphaned-and-invisible — the stores can never be visible
    inconsistently; (b) a crash after both appends but before the
    commit is equally invisible. Replays just append the whole batch
    again (no intent, no screen); vacuum reclaims the orphans; search
    parity with a never-crashed twin throughout."""
    import json
    import shutil

    import pytest

    from sparvi_core_spark.sources import writers as W
    from sparvi_core_spark.sources.ivfpq_index import (
        MANIFEST,
        _pq_float_rows,
        append_ivfpq_index,
        search_ivfpq_index,
        vacuum_ivfpq_index,
    )
    from sparvi_core_spark.streaming.ann_index_stream import (
        index_pq_stream_batches,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events

    path = str(tmp_path / "idx_cw")
    twin = str(tmp_path / "idx_tw")
    shutil.copytree(built["path"], path)
    shutil.copytree(built["path"], twin)
    rng = np.random.default_rng(23)
    new = spark.createDataFrame(
        [
            (7000 + i, [float(x) for x in rng.normal(size=8) * 10])
            for i in range(20)
        ],
        "vec_id long, embedding array<double>",
    )
    src = str(tmp_path / "src_cw")
    new.coalesce(1).write.parquet(src)  # one batch, id 0

    # --- crashed attempt: CODES landed, the floats append did NOT
    # (and so neither did the manifest commit)
    from pyspark.sql.readwriter import DataFrameWriter

    real_pq = DataFrameWriter.parquet

    def boom(self, p, *a, **kw):
        if p.rstrip("/").endswith("_floats"):
            raise RuntimeError("simulated floats crash")
        return real_pq(self, p, *a, **kw)

    DataFrameWriter.parquet = boom
    try:
        with pytest.raises(RuntimeError, match="simulated floats crash"):
            append_ivfpq_index(new, path, stream_batch_id=0)
    finally:
        DataFrameWriter.parquet = real_pq
    # the landed codes are referenced by NOTHING: readers see a fully
    # consistent pre-append index (no count drift, no store skew)
    coded, _, _, man = read_ivfpq_index(spark, path)
    assert coded.count() == 180 and man["n_vectors"] == 180
    assert _pq_float_rows(spark, path, man).count() == 180
    # ...but they are physically there, awaiting vacuum
    assert spark.read.parquet(path).count() == 200

    # --- the replay, through the real sink: plain append, no screen
    q = index_pq_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_cw"),
    )
    q.awaitTermination()

    coded2, _, _, man2 = read_ivfpq_index(spark, path)
    floats2 = _pq_float_rows(spark, path, man2)
    assert coded2.count() == 200
    assert coded2.select("vec_id").distinct().count() == 200
    assert floats2.count() == 200
    assert floats2.select("vec_id").distinct().count() == 200
    assert man2["n_vectors"] == 200
    assert sum(man2["rows_per_bucket"].values()) == 200
    assert man2["last_stream_batch_id"] == 0

    # reranked search parity with the never-crashed twin
    append_ivfpq_index(new, twin)
    queries = new.limit(4).select("vec_id", "embedding")
    got = sorted(map(tuple, search_ivfpq_index(
        spark, path, queries, k=5, rerank=20).collect()))
    want = sorted(map(tuple, search_ivfpq_index(
        spark, twin, queries, k=5, rerank=20).collect()))
    assert got == want and len(got) > 0

    # second crash shape: BOTH stores landed, manifest didn't
    # — arrives as batch 1 of the SAME stream (same source dir and
    # checkpoint; a fresh checkpoint would restart batch numbering)
    new2 = spark.createDataFrame(
        [
            (8000 + i, [float(x) for x in rng.normal(size=8) * 10])
            for i in range(10)
        ],
        "vec_id long, embedding array<double>",
    )
    new2.coalesce(1).write.mode("append").parquet(src)
    real_wt = W._hadoop_write_text

    def boom2(sp, dir_path, name, text):
        if name == MANIFEST:
            raise RuntimeError("simulated manifest crash")
        return real_wt(sp, dir_path, name, text)

    W._hadoop_write_text = boom2
    try:
        with pytest.raises(RuntimeError, match="simulated manifest crash"):
            append_ivfpq_index(new2, path, stream_batch_id=1)
    finally:
        W._hadoop_write_text = real_wt
    q2 = index_pq_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_cw"),
    )
    q2.awaitTermination()
    coded3, _, _, man3 = read_ivfpq_index(spark, path)
    assert coded3.count() == 210
    assert coded3.select("vec_id").distinct().count() == 210
    assert _pq_float_rows(spark, path, man3).count() == 210
    assert man3["n_vectors"] == 210
    assert man3["last_stream_batch_id"] == 1
    # vacuum reclaims both crashed attempts' orphans: physical rows
    # match the committed snapshot again
    assert vacuum_ivfpq_index(spark, path)["files_vacuumed"] > 0
    assert spark.read.parquet(path).count() == 210
    assert spark.read.parquet(f"{path}/_floats").count() == 210
