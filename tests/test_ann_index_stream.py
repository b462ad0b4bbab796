"""Streaming ingest into the stored IVF index: per-micro-batch
appends must accumulate exactly, stay searchable (parity with the
in-memory IVF over the union), and skip replayed batch ids."""

import json
import random

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
    )
    q.awaitTermination()

    data, _, man = read_ivf_index(spark, path)
    assert man["n_vectors"] == 135 and man["appends"] == 3
    assert data.count() == 135
    # the in-stream fold ran: staging is gone
    assert not _staging_files(spark, path, "vectors")
    assert not os.path.exists(os.path.join(path, "_staging"))

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


def test_crash_window_replay_appends_no_duplicates(spark, tmp_path):
    """Round-10 verdict #1: a crash BETWEEN the batch's data append
    and its (single) manifest commit used to double-append the batch
    on replay. Now the sink writes a write-ahead intent before any
    data lands; the redelivered batch sees its own id in the intent,
    screens at id grain, appends only the missing split, and heals the
    manifest — zero duplicate ids, counts consistent, search results
    equal to a never-crashed twin."""
    import os

    import pytest

    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources import writers as W
    from sparvi_core_spark.sources.ann_index import (
        MANIFEST,
        STREAM_INTENT,
        _write_text,
        append_ivf_index,
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

    # --- the crashed attempt: intent on disk, data landed, the
    # single manifest write did NOT (simulated by a failing writer)
    _write_text(spark, path, STREAM_INTENT, json.dumps({"batch_id": 0}))
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
    data, _, man = read_ivf_index(spark, path)
    assert data.count() == 80 and man["n_vectors"] == 60  # drifted

    # --- the replay, through the real sink
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
    assert man2["replay_rows_healed"] == 20
    assert not os.path.exists(os.path.join(path, STREAM_INTENT))

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


def test_crash_window_replay_staged_and_partial(spark, tmp_path):
    """The staged variant of the crash window, plus the pre-crash
    half-landed case: only PART of the batch's rows landed before the
    crash (simulated by staging half the batch). The replay screen
    admits exactly the missing split."""
    import os

    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources.ann_index import (
        STREAM_INTENT,
        _staging_files,
        _write_text,
        append_ivf_index,
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
    # untouched, intent on disk — land the half through the raw
    # staging write (not append, which would update the manifest)
    half = new.filter(F.col("vec_id") < 40_010)
    from sparvi_core_spark.operators.similarity import ivf_assign

    cents_stored, _ = (lambda d: (d[1], None))(read_ivf_index(spark, path))
    assigned = ivf_assign(half, cents_stored).select(
        F.col("id").alias("vec_id"), "bucket"
    )
    half.join(assigned, "vec_id").coalesce(1).write.mode("append").parquet(
        f"{path}/_staging/vectors"
    )
    _write_text(spark, path, STREAM_INTENT, json.dumps({"batch_id": 0}))

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
    assert man["replay_rows_healed"] == 10
    assert man["last_stream_batch_id"] == 0
    assert not os.path.exists(os.path.join(path, STREAM_INTENT))
    assert len(_staging_files(spark, path, "vectors")) == 2
