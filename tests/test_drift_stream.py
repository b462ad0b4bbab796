"""Streaming drift monitor: merged micro-batch bin counts must
reproduce EXACTLY the PSI a whole-data snapshot comparison computes
(binned counts are mergeable, so this is equality, not tolerance), and
the report must move in the right direction on shifted traffic."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.functions.stats import psi_drift_report
from sparvi_core_spark.streaming.drift_stream import (
    drift_report,
    drift_stream_batches,
    fit_drift_baseline,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _run_stream(spark, src_df, tmp_path, baseline, name, files=1):
    """Write src_df as `files` parquet files and stream them through
    drift_stream_batches one file per trigger (→ one batch_id each)."""
    from sparvi_core_spark.streaming.profile_stream import stream_events

    src = str(tmp_path / f"src_{name}")
    src_df.repartition(files).write.parquet(src)
    store = str(tmp_path / f"store_{name}")
    stream = stream_events(
        spark, src, max_files_per_trigger=1 if files > 1 else None
    )
    q = drift_stream_batches(
        stream, baseline, store, checkpoint=str(tmp_path / f"ckpt_{name}")
    )
    q.awaitTermination()
    return store


def test_streamed_psi_equals_snapshot_psi(spark, events, tmp_path):
    ref = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    baseline = fit_drift_baseline(ref, ["value", "user_id"])
    store = _run_stream(spark, cur, tmp_path, baseline, "eq", files=3)

    got = {
        r["column"]: r.asDict()
        for r in drift_report(spark, store, baseline).collect()
    }
    want = {
        r["column"]: r.asDict()
        for r in psi_drift_report(ref, cur, ["value", "user_id"]).collect()
    }
    assert set(got) == set(want)
    for c in want:
        assert got[c]["n_ref"] == want[c]["n_ref"], c
        assert got[c]["n_cur"] == want[c]["n_cur"], c
        # same boundaries (exact percentile both paths) + mergeable
        # counts → identical PSI to the rounded 6th decimal
        assert got[c]["psi"] == want[c]["psi"], c


def test_same_distribution_is_stable_and_shift_flags(spark, events, tmp_path):
    ref = events.filter(F.col("event_id") % 2 == 0)
    baseline = fit_drift_baseline(ref, ["value"])

    same = events.filter(F.col("event_id") % 2 == 1)
    store_same = _run_stream(spark, same, tmp_path, baseline, "same")
    psi_same = drift_report(spark, store_same, baseline).first()["psi"]
    assert psi_same < 0.1

    shifted = same.withColumn("value", F.col("value") * 3 + 50)
    store_shift = _run_stream(spark, shifted, tmp_path, baseline, "shift")
    psi_shift = drift_report(spark, store_shift, baseline).first()["psi"]
    assert psi_shift > 0.25
    assert psi_shift > psi_same


def test_batch_range_restriction(spark, events, tmp_path):
    """Restricting to a batch_id range reports PSI over exactly those
    batches' rows."""
    ref = events.filter(F.col("event_id") % 2 == 0)
    baseline = fit_drift_baseline(ref, ["value"])
    cur = events.filter(F.col("event_id") % 2 == 1)
    store = _run_stream(spark, cur, tmp_path, baseline, "range", files=4)

    batch_ids = sorted(
        r["batch_id"]
        for r in spark.read.parquet(store)
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert len(batch_ids) == 4
    first = drift_report(
        spark, store, baseline, max_batch_id=batch_ids[1]
    ).first()
    full = drift_report(spark, store, baseline).first()
    assert first["n_cur"] < full["n_cur"]
    assert full["n_cur"] == cur.count()


def test_baseline_round_trips_through_parquet(spark, events, tmp_path):
    ref = events.filter(F.col("event_id") % 2 == 0)
    baseline = fit_drift_baseline(ref, ["value"])
    p = str(tmp_path / "baseline")
    baseline.write.parquet(p)
    reloaded = spark.read.parquet(p)
    cur = events.filter(F.col("event_id") % 2 == 1)
    store = _run_stream(spark, cur, tmp_path, reloaded, "rt")
    a = drift_report(spark, store, baseline).first()["psi"]
    b = drift_report(spark, store, reloaded).first()["psi"]
    assert a == b


def test_no_numeric_columns_gives_empty_baseline(spark, events):
    base = fit_drift_baseline(events.select(F.col("event_type")))
    assert base.count() == 0


def test_categorical_drift(spark, events, tmp_path):
    """Categorical columns bin by baseline top-N + OTHER; identical
    distribution is stable, a category swap flags, and streamed PSI
    equals a hand-computed PSI from exact counts."""
    import math

    ref = events.filter(F.col("event_id") % 2 == 0)
    baseline = fit_drift_baseline(
        ref, columns=[], categorical_cols=["event_type"], top_categories=3
    )

    same = events.filter(F.col("event_id") % 2 == 1)
    store = _run_stream(spark, same, tmp_path, baseline, "cat_same")
    psi_same = drift_report(spark, store, baseline).first()["psi"]
    assert psi_same < 0.1

    # swap every event_type to a value the baseline never saw → all
    # current mass lands in OTHER
    shifted = same.withColumn(
        "event_type", F.concat(F.lit("new_"), F.col("event_type"))
    )
    store2 = _run_stream(spark, shifted, tmp_path, baseline, "cat_shift")
    row = drift_report(spark, store2, baseline).first()
    assert row["psi"] > 0.25

    # oracle: PSI from exact counts, same binning rule, pure python
    top = [
        r["v"]
        for r in ref.groupBy(F.col("event_type").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("v"))
        .limit(3)
        .collect()
    ]
    def frac(df):
        tot = df.count()
        out = []
        for i, v in enumerate(top):
            out.append(df.filter(F.col("event_type") == v).count() / tot)
        out.append(df.filter(~F.col("event_type").isin(top)).count() / tot)
        return out
    fr, fc = frac(ref), frac(same)
    eps = 1e-6
    want = round(sum(
        (max(c, eps) - max(r, eps)) * math.log(max(c, eps) / max(r, eps))
        for r, c in zip(fr, fc)
    ), 6)
    assert abs(psi_same - want) < 1e-6


def test_mixed_numeric_and_categorical_baseline(spark, events, tmp_path):
    ref = events.filter(F.col("event_id") % 2 == 0)
    baseline = fit_drift_baseline(
        ref, columns=["value"], categorical_cols=["event_type"]
    )
    cur = events.filter(F.col("event_id") % 2 == 1)
    store = _run_stream(spark, cur, tmp_path, baseline, "mixed")
    rows = {r["column"]: r for r in drift_report(spark, store, baseline).collect()}
    assert set(rows) == {"value", "event_type"}
    assert rows["value"]["n_cur"] == cur.count()


def test_baseline_raises_on_unmonitorable_requested_column(spark):
    """An explicitly requested column with no computable bounds
    (all-NULL) fails loudly instead of silently vanishing from the
    baseline (it would otherwise never be monitored)."""
    import pytest
    from pyspark.sql import functions as F

    from sparvi_core_spark.streaming.drift_stream import fit_drift_baseline

    ref = spark.range(100).select(
        F.col("id").cast("double").alias("good"),
        F.lit(None).cast("double").alias("dead"),
    )
    with pytest.raises(ValueError, match="dead"):
        fit_drift_baseline(ref, columns=["good", "dead"])

    # auto-discovery (columns=None) may skip it: nothing was requested
    base = fit_drift_baseline(ref)
    assert set(r["column"] for r in base.collect()) == {"good"}


def test_explicitness_tracked_per_side(spark):
    """Passing only categorical_cols must NOT subject auto-discovered
    numeric columns to the strict no-spec check: an all-NULL numeric
    field elsewhere in the frame is skipped (nothing numeric was
    requested), while a dead EXPLICIT categorical still raises — and
    symmetrically for the numeric side."""
    import pytest
    from pyspark.sql import functions as F

    from sparvi_core_spark.streaming.drift_stream import fit_drift_baseline

    ref = spark.range(100).select(
        F.col("id").cast("double").alias("good"),
        F.lit(None).cast("double").alias("dead_num"),
        (F.col("id") % 3).cast("string").alias("cat"),
        F.lit(None).cast("string").alias("dead_cat"),
    )
    # categorical-only request: dead numeric column is auto-side, skipped
    base = fit_drift_baseline(ref, categorical_cols=["cat"])
    cols = {r["column"] for r in base.collect()}
    assert "cat" in cols and "dead_num" not in cols

    # numeric-only request: no categorical side at all, no raise
    base2 = fit_drift_baseline(ref, columns=["good"])
    assert {r["column"] for r in base2.collect()} == {"good"}

    # dead EXPLICIT columns still fail loudly, on either side
    with pytest.raises(ValueError, match="dead_cat"):
        fit_drift_baseline(ref, categorical_cols=["cat", "dead_cat"])
    with pytest.raises(ValueError, match="dead_num"):
        fit_drift_baseline(ref, columns=["good", "dead_num"])
