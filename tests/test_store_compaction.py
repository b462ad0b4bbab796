"""Summary-store compaction: file count drops, every report reads the
same numbers before and after, and files appended during/after the
listing survive."""

import os

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.streaming.store import compact_summary_store


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def _make_store(spark, tmp_path, n_batches=6):
    store = str(tmp_path / "store")
    for b in range(n_batches):
        (
            spark.range(100)
            .select(
                F.lit(b).alias("batch_id"),
                F.col("id").alias("v"),
                F.lit(1).alias("n"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(store)
        )
    return store


def test_compaction_preserves_contents(spark, tmp_path):
    store = _make_store(spark, tmp_path)
    before = spark.read.parquet(store)
    want_rows = before.count()
    want_sum = before.agg(F.sum("v")).first()[0]
    assert len(_parquet_files(store)) >= 6

    rep = compact_summary_store(spark, store, target_files=1)
    assert rep["files_before"] >= 6
    assert rep["files_after"] == 1
    assert rep["rows"] == want_rows

    after = spark.read.parquet(store)
    assert after.count() == want_rows
    assert after.agg(F.sum("v")).first()[0] == want_sum
    # batch_id column preserved for range-restricted reports
    assert after.select("batch_id").distinct().count() == 6


def test_appends_after_compaction_coexist(spark, tmp_path):
    store = _make_store(spark, tmp_path, n_batches=3)
    compact_summary_store(spark, store, target_files=1)
    (
        spark.range(50)
        .select(F.lit(99).alias("batch_id"), F.col("id").alias("v"), F.lit(1).alias("n"))
        .coalesce(1)
        .write.mode("append")
        .parquet(store)
    )
    df = spark.read.parquet(store)
    assert df.count() == 350
    assert df.filter(F.col("batch_id") == 99).count() == 50


def test_small_store_left_untouched(spark, tmp_path):
    store = _make_store(spark, tmp_path, n_batches=1)
    files = sorted(_parquet_files(store))
    rep = compact_summary_store(spark, store, target_files=2)
    assert rep["files_after"] == rep["files_before"]
    assert sorted(_parquet_files(store)) == files


def test_invalid_target_rejected(spark, tmp_path):
    store = _make_store(spark, tmp_path, n_batches=2)
    with pytest.raises(ValueError):
        compact_summary_store(spark, store, target_files=0)


def test_crash_after_moves_rolls_forward(spark, tmp_path):
    """Manifest present + all compacted files landed + originals not
    yet deleted (crash between move loop and cleanup): the next
    compaction call deletes the stale originals — no double counting."""
    import json

    from sparvi_core_spark.streaming.store import repair_summary_store

    store = _make_store(spark, tmp_path, n_batches=4)
    originals = _parquet_files(store)
    before = spark.read.parquet(store)
    want_rows, want_sum = before.count(), before.agg(F.sum("v")).first()[0]

    # simulate: compacted copy fully moved in, manifest still present
    compacted = "compacted-deadbeef-0.parquet"
    spark.read.parquet(store).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "one")
    )
    src = [f for f in os.listdir(tmp_path / "one") if f.endswith(".parquet")][0]
    os.rename(str(tmp_path / "one" / src), os.path.join(store, compacted))
    with open(os.path.join(store, ".compact-manifest-test.json"), "w") as fh:
        json.dump({"new_files": [compacted], "old_files": originals}, fh)

    # store currently double-counts; repair heals it
    rep = repair_summary_store(store)
    assert rep == {"manifests": 1, "rolled_forward": 1, "rolled_back": 0}
    after = spark.read.parquet(store)
    assert after.count() == want_rows
    assert after.agg(F.sum("v")).first()[0] == want_sum
    assert _parquet_files(store) == [compacted]


def test_crash_mid_move_rolls_back(spark, tmp_path):
    """Manifest lists two compacted files but only one landed: the
    partial copy is dropped, originals stay authoritative."""
    import json

    from sparvi_core_spark.streaming.store import compact_summary_store

    store = _make_store(spark, tmp_path, n_batches=4)
    originals = _parquet_files(store)
    before = spark.read.parquet(store)
    want_rows = before.count()

    partial = "compacted-cafe-0.parquet"
    spark.range(7).select(
        F.lit(0).alias("batch_id"), F.col("id").alias("v"), F.lit(1).alias("n")
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "half"))
    src = [f for f in os.listdir(tmp_path / "half") if f.endswith(".parquet")][0]
    os.rename(str(tmp_path / "half" / src), os.path.join(store, partial))
    with open(os.path.join(store, ".compact-manifest-test.json"), "w") as fh:
        json.dump(
            {"new_files": [partial, "compacted-cafe-1.parquet"],
             "old_files": originals},
            fh,
        )

    # the next scheduled compaction heals first, then compacts cleanly
    rep = compact_summary_store(spark, store, target_files=1)
    assert rep["rows"] == want_rows
    after = spark.read.parquet(store)
    assert after.count() == want_rows
    assert len(_parquet_files(store)) == 1
