"""End-to-end streaming data-quality monitor: every summary-store
monitor this engine ships, composed over one simulated event stream.

    events (micro-batches)
      → continuous profiles      (mergeable counts/moments/HLL/KLL)
      → drift vs frozen baseline (numeric + categorical PSI)
      → streaming heavy hitters  (Misra-Gries store, certified top-k)
      → continuous validation    (rule DSL per batch + history)
      → store compaction         (fold the per-batch small files)

Each monitor reduces every micro-batch to a tiny mergeable summary;
every report below reads ONLY the stores — the stream is never
rescanned. Run: python examples/streaming_monitor.py [sf_dir]
(default sf0.001). Prints one JSON report.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from sparvi_core_spark import get_spark
    from sparvi_core_spark.profiler.incremental import (
        merge_profiles,
        profile_stream_batches,
    )
    from sparvi_core_spark.streaming.drift_stream import (
        drift_report,
        drift_stream_batches,
        fit_drift_baseline,
    )
    from sparvi_core_spark.streaming.profile_stream import stream_events
    from sparvi_core_spark.streaming.store import compact_summary_store
    from sparvi_core_spark.streaming.topk_stream import (
        topk_from_store,
        topk_stream_batches,
    )
    from sparvi_core_spark.streaming.validate_stream import (
        validate_stream_batches,
        validation_history,
    )

    spark = get_spark(
        app_name="streaming-monitor-example", master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}
    work = tempfile.mkdtemp(prefix="sparvi_stream_monitor_")

    # the "live" stream: events split into 4 micro-batches; the
    # baseline is an earlier snapshot (every other event)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    baseline_snap = events.filter(F.col("event_id") % 2 == 0)
    live = events.filter(F.col("event_id") % 2 == 1)
    src = f"{work}/src"
    live.repartition(4).write.parquet(src)

    def run(stage, fn):
        q = fn(stream_events(spark, src, max_files_per_trigger=1))
        q.awaitTermination()
        report[f"{stage}_batches"] = 4

    # 1. continuous profiles
    prof_store = f"{work}/profiles"
    run("profile", lambda s: profile_stream_batches(
        s, prof_store, cols=["user_id", "value"], checkpoint=f"{work}/ck_p"))
    merged = {
        r["column"]: r.asDict()
        for r in merge_profiles(spark.read.parquet(prof_store)).collect()
    }
    report["profile"] = {
        c: {"rows": m["n_rows"], "mean": m["mean"], "p50": m["p50"],
            "approx_distinct": m["approx_distinct"]}
        for c, m in merged.items()
    }

    # 2. drift vs the frozen baseline (numeric value + categorical type)
    base = fit_drift_baseline(
        baseline_snap, ["value"], categorical_cols=["event_type"]
    )
    drift_store = f"{work}/drift"
    run("drift", lambda s: drift_stream_batches(
        s, base, drift_store, checkpoint=f"{work}/ck_d"))
    report["drift"] = {
        r["column"]: r["psi"]
        for r in drift_report(spark, drift_store, base).collect()
    }

    # 3. streaming heavy hitters over event types
    topk_store = f"{work}/topk"
    run("topk", lambda s: topk_stream_batches(
        s, "event_type", topk_store, capacity=64, checkpoint=f"{work}/ck_t"))
    tk = topk_from_store(spark, topk_store, k=3)
    report["topk"] = {
        "top3": tk.topk, "certified": tk.set_certified,
        "error_bound": tk.error_bound,
    }

    # 4. continuous validation (the same rule DSL as batch validate)
    rules = [
        {"name": "no_negative_values",
         "query": "SELECT COUNT(*) FROM live_events WHERE value < 0",
         "operator": "equals", "expected_value": 0},
        {"name": "users_present",
         "query": "SELECT COUNT(DISTINCT user_id) FROM live_events",
         "operator": "greater_than", "expected_value": 0},
    ]
    val_store = f"{work}/validations"
    run("validate", lambda s: validate_stream_batches(
        s, rules, "live_events", val_store, checkpoint=f"{work}/ck_v"))
    report["validation"] = {
        r["name"]: {"n_batches": r["n_batches"], "n_failed": r["n_failed"]}
        for r in validation_history(spark, val_store).collect()
    }

    # 5. store maintenance: fold the per-batch files
    report["compaction"] = {
        s: compact_summary_store(spark, p)["files_after"]
        for s, p in [("profiles", prof_store), ("drift", drift_store),
                     ("topk", topk_store), ("validations", val_store)]
    }

    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
