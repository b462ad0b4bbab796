"""Structured Streaming: windowed quality metrics, batch/stream equality."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.streaming.profile_stream import (
    run_stream_to_memory,
    stream_events,
    windowed_quality_metrics,
)


def test_batch_stream_equivalence(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    # the nanos-ts parquet needs the conversion path; read via the registry
    from sparvi_core_spark.session import read_parquet_table

    batch = read_parquet_table(spark, path)
    batch_out = windowed_quality_metrics(
        batch, ts_col="ts", window="1 hour",
        group_cols=["event_type"], numeric_cols=["value"],
    )
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_rows"], r["avg_value"])
        for r in batch_out.collect()
    }
    assert batch_rows, "batch windowed metrics must produce rows"

    stream = stream_events(spark, path)
    stream_out = windowed_quality_metrics(
        stream, ts_col="ts", window="1 hour",
        group_cols=["event_type"], numeric_cols=["value"],
    )
    assert stream_out.isStreaming
    run_stream_to_memory(stream_out, "stream_metrics", output_mode="complete")
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_rows"], r["avg_value"])
        for r in spark.table("stream_metrics").collect()
    }
    assert stream_rows == batch_rows


def test_watermark_applied_to_stream_only(spark, sf_dir):
    from sparvi_core_spark.session import read_parquet_table

    path = f"{sf_dir}/events.parquet"
    batch = read_parquet_table(spark, path)
    out = windowed_quality_metrics(batch, numeric_cols=["value"])
    assert not out.isStreaming  # no watermark error on batch input
    assert "window_start" in out.columns and "window_end" in out.columns


def test_dedup_stream_exact_batch_stream_equivalence(spark, sf_dir):
    """Ingest-time exact dedup: the streaming path
    (dropDuplicatesWithinWatermark — bounded state) must keep the same
    KEY SET as the batch path on a single-trigger backfill. Row choice
    per key is engine-arbitrary, so keys are compared, not payloads."""
    from sparvi_core_spark.session import read_parquet_table
    from sparvi_core_spark.streaming.dedup_stream import dedup_stream_exact

    path = f"{sf_dir}/events.parquet"
    keys = ["user_id", "event_type"]
    batch = read_parquet_table(spark, path)
    n_raw = batch.count()
    batch_out = dedup_stream_exact(batch, keys)
    assert not batch_out.isStreaming
    batch_keys = {(r["user_id"], r["event_type"]) for r in batch_out.collect()}
    assert len(batch_keys) < n_raw, "fixture must contain duplicate keys"

    stream = stream_events(spark, path)
    stream_out = dedup_stream_exact(stream, keys, ts_col="ts", delay="1 hour")
    assert stream_out.isStreaming
    run_stream_to_memory(stream_out, "stream_dedup", output_mode="append")
    stream_rows = spark.table("stream_dedup").collect()
    stream_keys = {(r["user_id"], r["event_type"]) for r in stream_rows}
    assert stream_keys == batch_keys
    assert len(stream_rows) == len(stream_keys), "exactly one row per key"


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Multi-trigger availableNow run with out-of-order files: a row
    arriving AFTER the watermark already evicted its window's state must
    be dropped (the window emitted without it, and must not re-emit),
    and windows the watermark has not passed must emit nothing.

    Note the exact watermark contract this pins: a late row landing in
    the SAME batch where its window is evicted still merges (the
    watermark is a lower-bound guarantee, not an upper bound); dropping
    is only guaranteed once eviction happened in a PRIOR batch — so the
    late row here arrives two batches after its window's data."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_stream"
    d.mkdir()

    def write_file(name, rows, mtime):
        ts, vals = zip(*rows)
        pdf = pd.DataFrame(
            {
                # microsecond precision: pandas' default nanos would hit
                # the session's nanosAsLong long-read path instead
                "ts": pd.to_datetime(list(ts))
                .tz_localize("UTC")
                .astype("datetime64[us, UTC]"),
                "value": list(vals),
            }
        )
        f = str(d / name)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (mtime, mtime))

    # batch 0: two rows in [10:00,11:00) + one in [12:00,13:00);
    # after it the watermark is 12:30 - 1h = 11:30
    write_file("f1.parquet",
               [("2024-01-01 10:10", 1.0), ("2024-01-01 10:40", 3.0),
                ("2024-01-01 12:30", 5.0)], 1_000_000)
    # batch 1 runs with wm 11:30 -> evicts+emits [10,11) (n=2);
    # its row advances the watermark to 13:30
    write_file("f2.parquet", [("2024-01-01 14:30", 7.0)], 1_000_010)
    # batch 2 runs with wm 13:30: the 10:20 row is behind an evicted
    # window -> DROPPED; [12,13) evicted+emits; [14,15) never finalizes
    write_file("f3.parquet",
               [("2024-01-01 10:20", 100.0), ("2024-01-01 14:40", 9.0)], 1_000_020)

    stream = stream_events(spark, str(d), max_files_per_trigger=1)
    out = windowed_quality_metrics(
        stream, ts_col="ts", window="1 hour", watermark="1 hour",
        numeric_cols=["value"],
    )
    q = run_stream_to_memory(out, "late_metrics", output_mode="append")
    got = {
        (r["n_rows"], r["avg_value"]) for r in spark.table("late_metrics").collect()
    }
    # [10,11) emitted ONCE with n=2 avg=2.0 (no 100.0, no duplicate
    # re-emission); [12,13) n=1 avg=5.0; [14,15) withheld.
    assert got == {(2, 2.0), (1, 5.0)}, got
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )
    assert dropped == 1, f"exactly the one late row must be dropped, got {dropped}"


def test_novelty_stream_exact_batch_stream_equivalence(spark, tmp_path):
    """Stream-static anti-join novelty screen: a streaming backfill must
    keep exactly the batch path's novel records (state-free — no
    watermark involved)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparvi_core_spark.streaming.dedup_stream import (
        corpus_fingerprints,
        novelty_stream_exact,
    )

    corpus = spark.createDataFrame(
        [
            (1, "Existing Document ALPHA with some words"),
            (2, "existing document beta with other words"),
        ],
        "doc_id long, text string",
    )
    ref_fp = corpus_fingerprints(corpus)

    batch_rows = [
        # normalization-equal copy of corpus doc 1 (case differs) → dropped
        (10, "existing document alpha with some words"),
        (11, "a genuinely new page about structured streaming joins"),
        (12, "another new page that survives the screen"),
    ]
    d = tmp_path / "novelty_stream"
    d.mkdir()
    pdf = pd.DataFrame(batch_rows, columns=["doc_id", "text"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(d / "part-0.parquet"))

    batch = spark.read.parquet(str(d))
    batch_ids = {
        r["doc_id"] for r in novelty_stream_exact(batch, ref_fp).collect()
    }
    assert batch_ids == {11, 12}

    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = novelty_stream_exact(stream, ref_fp)
    assert out.isStreaming
    run_stream_to_memory(out, "novelty_stream_t", output_mode="append")
    stream_ids = {
        r["doc_id"] for r in spark.table("novelty_stream_t").collect()
    }
    assert stream_ids == batch_ids


def test_quality_gates_batch_stream_equivalence(spark, sf_dir):
    """The r7 map-only gates (Gopher rules, C4 cleaning) are stateless
    projections, so they must run UNCHANGED on a streaming frame and
    produce exactly the batch answer — the property that makes the
    release gate reusable as an ingest-time monitor."""
    from sparvi_core_spark.functions.text import (
        c4_clean,
        gopher_quality_flags,
    )
    from sparvi_core_spark.streaming.profile_stream import (
        run_stream_to_memory,
        stream_events,
    )

    path = f"{sf_dir}/documents.parquet"
    batch = spark.read.parquet(path)

    for name, op in (
        ("gq", lambda d: gopher_quality_flags(d, min_required_words=0)),
        ("c4", lambda d: c4_clean(d)),
    ):
        batch_rows = {r["id"]: r for r in op(batch).collect()}
        stream = stream_events(spark, path)
        out = op(stream)
        assert out.isStreaming
        run_stream_to_memory(out, f"gate_{name}", output_mode="append")
        stream_rows = {
            r["id"]: r for r in spark.table(f"gate_{name}").collect()
        }
        assert set(stream_rows) == set(batch_rows)
        for k, v in batch_rows.items():
            assert stream_rows[k] == v, (name, k)


def test_dedup_stream_by_url_batch_stream_equivalence(spark, sf_dir, tmp_path):
    """Crawl-ingest recrawl screen: streaming canonical-URL dedup keeps
    the same canonical KEY SET as the batch path on a single-trigger
    backfill; tracker/case/fragment spellings of one resource collapse,
    NULL urls never collapse."""
    from sparvi_core_spark.functions.web import canonicalize_url
    from sparvi_core_spark.session import read_parquet_table
    from sparvi_core_spark.streaming.dedup_stream import dedup_stream_by_url

    src = read_parquet_table(spark, f"{sf_dir}/events.parquet").limit(400)
    # two crawl spellings per user_id + a NULL-url row every 50th
    fixture = src.select(
        "ts",
        "user_id",
        F.when(F.col("event_id") % 50 == 0, F.lit(None).cast("string"))
        .when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM/u/"),
                F.col("user_id").cast("string"),
                F.lit("/?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/u/"),
                F.col("user_id").cast("string"),
                F.lit("?a=1&b=2"),
            )
        )
        .alias("url"),
    )
    path = str(tmp_path / "crawl.parquet")
    fixture.write.parquet(path)
    batch = spark.read.parquet(path)
    n_raw = batch.count()
    n_null = batch.filter(F.col("url").isNull()).count()

    batch_out = dedup_stream_by_url(batch, ts_col="ts")
    assert not batch_out.isStreaming
    batch_keys = {
        r["k"]
        for r in batch_out.select(
            canonicalize_url("url", strip_www=True).alias("k")
        ).collect()
    }
    # the two spellings collapsed; every NULL-url row survived
    assert batch_out.count() == len(batch_keys - {None}) + n_null
    assert batch_out.count() < n_raw

    stream = stream_events(spark, path)
    stream_out = dedup_stream_by_url(
        stream, ts_col="ts", delay="1 hour", keep_key=True
    )
    assert stream_out.isStreaming
    run_stream_to_memory(stream_out, "stream_url_dedup", output_mode="append")
    stream_rows = spark.table("stream_url_dedup").collect()
    stream_keys = {r["__canon_url"] for r in stream_rows}
    want_keys = {
        r["k"]
        for r in dedup_stream_by_url(batch, ts_col="ts", keep_key=True)
        .select(F.col("__canon_url").alias("k"))
        .collect()
    }
    assert stream_keys == want_keys
    assert len(stream_rows) == len(stream_keys), "exactly one row per key"
