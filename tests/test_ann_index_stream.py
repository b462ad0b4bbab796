"""Streaming ingest into the stored IVF index: per-micro-batch
appends must accumulate exactly, stay searchable (parity with the
in-memory IVF over the union), and skip replayed batch ids."""

import json
import random

import pytest

from pyspark.sql import functions as F

from sparvi_core_spark.sources.ann_index import (
    read_ivf_index,
    search_ivf_index,
    write_ivf_index,
)
from sparvi_core_spark.streaming.ann_index_stream import index_stream_batches


def _corpus(spark, n, dim=6, seed=11, base_id=0):
    rnd = random.Random(seed)
    rows = [
        (base_id + i, [rnd.gauss(0, 1) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.mark.slow
def test_stream_appends_accumulate_and_search(spark, tmp_path):
    from sparvi_core_spark.operators.similarity import (
        cosine_topk_ivf,
        kmeans_fit,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events

    base = _corpus(spark, n=90, seed=5)
    cents, _ = kmeans_fit(base, k=5, seed=3)
    path = str(tmp_path / "idx")
    write_ivf_index(base, cents, path)

    new = _corpus(spark, n=45, seed=7, base_id=10_000)
    src = str(tmp_path / "src")
    new.repartition(3).write.parquet(src)

    q = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    data, _, man = read_ivf_index(spark, path)
    assert man["n_vectors"] == 135
    assert man["appends"] == 3  # one per micro-batch (3 files)
    assert man["last_stream_batch_id"] == 2
    assert data.count() == 135
    assert sum(man["rows_per_bucket"].values()) == 135

    union = base.unionByName(new)
    queries = union.filter(F.col("vec_id").isin(4, 10_007)).select(
        "vec_id", "embedding"
    )
    got = sorted(
        map(tuple, search_ivf_index(spark, path, queries, k=5).collect())
    )
    want = sorted(
        map(tuple, cosine_topk_ivf(union, queries, cents, k=5, nprobe=2).collect())
    )
    assert got == want and len(got) > 0


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources.ann_index import MANIFEST, _write_text
    from sparvi_core_spark.streaming.profile_stream import stream_events

    base = _corpus(spark, n=60, seed=9)
    cents, _ = kmeans_fit(base, k=4, seed=3)
    path = str(tmp_path / "idx_rp")
    write_ivf_index(base, cents, path)

    # pretend batches 0 and 1 already landed: the sink must skip them
    _, _, man = read_ivf_index(spark, path)
    man["last_stream_batch_id"] = 1
    _write_text(spark, path, MANIFEST, json.dumps(man))

    new = _corpus(spark, n=30, seed=13, base_id=20_000)
    src = str(tmp_path / "src_rp")
    new.repartition(3).write.parquet(src)  # batches 0, 1, 2

    q = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_rp"),
    )
    q.awaitTermination()

    data, _, man2 = read_ivf_index(spark, path)
    # only batch 2 (one of the three files, 10 rows) was appended
    assert man2["appends"] == 1
    assert man2["n_vectors"] == 70
    assert data.count() == 70
    assert man2["last_stream_batch_id"] == 2


@pytest.mark.slow
def test_stream_staged_appends_with_auto_compact(spark, tmp_path):
    """The staged streaming path: each micro-batch lands as ONE
    staging file under the batch's writer lock, searches see staged
    rows, and auto_compact folds staging into the cell partitions once
    the staged-file gauge passes the knob — search parity with the
    in-memory IVF over the union throughout."""
    import os

    from sparvi_core_spark.operators.similarity import (
        cosine_topk_ivf,
        kmeans_fit,
    )
    from sparvi_core_spark.sources.ann_index import _staging_files
    from sparvi_core_spark.streaming.profile_stream import stream_events

    base = _corpus(spark, n=90, seed=5)
    cents, _ = kmeans_fit(base, k=5, seed=3)
    path = str(tmp_path / "idx_st")
    write_ivf_index(base, cents, path)

    new = _corpus(spark, n=45, seed=7, base_id=10_000)
    src = str(tmp_path / "src_st")
    new.repartition(3).write.parquet(src)

    # knob = 2: batches 1 and 2 stage (1 and 2 files), the gauge trips
    # after batch 3 (3 staged files > 2) and folds inside the stream
    q = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_st"),
        staged=True,
        auto_compact=2,
        auto_vacuum=0.0,
    )
    q.awaitTermination()

    data, _, man = read_ivf_index(spark, path)
    assert man["n_vectors"] == 135 and man["appends"] == 3
    assert data.count() == 135
    # the in-stream fold ran (staging unreferenced at its commit) and
    # the in-stream auto_vacuum reclaimed the consumed physical files
    assert man["staging_files"]["vectors"] == []
    assert not _staging_files(spark, path, "vectors")

    union = base.unionByName(new)
    queries = union.filter(F.col("vec_id").isin(4, 10_007)).select(
        "vec_id", "embedding"
    )
    got = sorted(
        map(tuple, search_ivf_index(spark, path, queries, k=5).collect())
    )
    want = sorted(
        map(tuple, cosine_topk_ivf(union, queries, cents, k=5, nprobe=2).collect())
    )
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_crash_window_replay_appends_no_duplicates(spark, tmp_path):
    """A crash BETWEEN the batch's data append and its single
    manifest commit leaves the landed files referenced by NOTHING
    (readers scan the committed snapshot, never the directory), so
    the redelivered batch simply appends again — exactly-once by
    construction, with no intent marker and no id screen. Readers
    never saw the crashed attempt, counts stay consistent, search
    results equal a never-crashed twin, and vacuum reclaims the
    orphans."""
    import pytest

    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources import writers as W
    from sparvi_core_spark.sources.ann_index import (
        MANIFEST,
        append_ivf_index,
        store_fragmentation,
        vacuum_ivf_index,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events

    base = _corpus(spark, n=60, seed=9)
    cents, _ = kmeans_fit(base, k=4, seed=3)
    path = str(tmp_path / "idx_cw")
    twin = str(tmp_path / "idx_twin")
    write_ivf_index(base, cents, path)
    write_ivf_index(base, cents, twin)

    new = _corpus(spark, n=20, seed=13, base_id=30_000)
    src = str(tmp_path / "src_cw")
    new.coalesce(1).write.parquet(src)  # ONE file -> one batch (id 0)

    # --- the crashed attempt: data landed, the single manifest
    # write did NOT (simulated by a failing writer)
    real = W._hadoop_write_text

    def boom(sp, dir_path, name, text):
        if name == MANIFEST:
            raise RuntimeError("simulated crash")
        return real(sp, dir_path, name, text)

    W._hadoop_write_text = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            append_ivf_index(new, path, stream_batch_id=0)
    finally:
        W._hadoop_write_text = real
    # the orphans are physically there (4 live files + the crashed
    # attempt's) ...
    assert store_fragmentation(spark, path)["total_files"] > 4
    data, _, man = read_ivf_index(spark, path)
    # the crashed attempt is INVISIBLE — no drift at all
    assert data.count() == 60 and man["n_vectors"] == 60
    assert "last_stream_batch_id" not in man

    # --- the replay, through the real sink: plain append, no screen
    q = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_cw"),
    )
    q.awaitTermination()

    data2, _, man2 = read_ivf_index(spark, path)
    assert data2.count() == 80
    assert data2.select("vec_id").distinct().count() == 80  # no dup ids
    assert man2["n_vectors"] == 80
    assert sum(man2["rows_per_bucket"].values()) == 80
    assert man2["last_stream_batch_id"] == 0

    # search parity with the never-crashed twin
    append_ivf_index(new, twin)
    queries = new.limit(5).select("vec_id", "embedding")
    got = sorted(
        map(tuple, search_ivf_index(spark, path, queries, k=5).collect())
    )
    want = sorted(
        map(tuple, search_ivf_index(spark, twin, queries, k=5).collect())
    )
    assert got == want and len(got) > 0

    # a SECOND run of the same source is the already-committed replay:
    # the batch-id fence skips it outright
    q2 = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_cw2"),
    )
    q2.awaitTermination()
    data3, _, man3 = read_ivf_index(spark, path)
    assert data3.count() == 80 and man3["n_vectors"] == 80

    # vacuum reclaims the crashed attempt's orphans: physical files
    # match the committed snapshot exactly afterwards
    assert vacuum_ivf_index(spark, path)["files_vacuumed"] > 0
    live_total = sum(len(v) for v in man3["files"]["vectors"].values())
    assert store_fragmentation(spark, path)["total_files"] == live_total
    assert read_ivf_index(spark, path)[0].count() == 80


@pytest.mark.slow
def test_crash_window_replay_staged_and_partial(spark, tmp_path):
    """The staged variant of the crash window: PART of the batch's
    rows landed as a staging file before the crash, but the manifest
    (whose single write publishes counts AND the staging file list)
    never committed — so the half-landed file is referenced by
    nothing. The replay appends the FULL batch as a fresh staging
    file; the orphan stays invisible until vacuum."""
    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources.ann_index import (
        _staging_files,
        vacuum_ivf_index,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events

    base = _corpus(spark, n=60, seed=9)
    cents, _ = kmeans_fit(base, k=4, seed=3)
    path = str(tmp_path / "idx_ps")
    write_ivf_index(base, cents, path)

    new = _corpus(spark, n=20, seed=17, base_id=40_000)
    src = str(tmp_path / "src_ps")
    new.coalesce(1).write.parquet(src)

    # crashed attempt: HALF the batch made it into staging, manifest
    # untouched — land the half through the raw staging write (not
    # append, which would commit the manifest)
    half = new.filter(F.col("vec_id") < 40_010)
    from sparvi_core_spark.operators.similarity import ivf_assign

    cents_stored = read_ivf_index(spark, path)[1]
    assigned = ivf_assign(half, cents_stored).select(
        F.col("id").alias("vec_id"), "bucket"
    )
    half.join(assigned, "vec_id").coalesce(1).write.mode("append").parquet(
        f"{path}/_staging/vectors"
    )
    # the orphan staging file is invisible to readers
    data0, _, man0 = read_ivf_index(spark, path)
    assert data0.count() == 60
    assert man0["staging_files"]["vectors"] == []
    assert len(_staging_files(spark, path, "vectors")) == 1

    q = index_stream_batches(
        stream_events(spark, src, max_files_per_trigger=1),
        path,
        checkpoint=str(tmp_path / "ckpt_ps"),
        staged=True,
    )
    q.awaitTermination()

    data, _, man = read_ivf_index(spark, path)
    assert data.count() == 80
    assert data.select("vec_id").distinct().count() == 80
    assert man["n_vectors"] == 80
    assert man["last_stream_batch_id"] == 0
    # ONE committed staging file (the full batch); the orphan half is
    # physically present until vacuum
    assert len(man["staging_files"]["vectors"]) == 1
    assert len(_staging_files(spark, path, "vectors")) == 2
    vacuum_ivf_index(spark, path)
    assert len(_staging_files(spark, path, "vectors")) == 1
    assert read_ivf_index(spark, path)[0].count() == 80
