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
