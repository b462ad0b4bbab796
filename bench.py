"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Timings exclude JVM/session startup. DataFrame queries are forced with
the ``noop`` sink (full execution, no driver materialization); the
profiler/validator timings are the end-to-end API calls (their results
ARE driver-side dicts — that's the product shape).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sparvi_core_spark import (
        get_default_validations,
        get_spark,
        profile_table,
        register_views,
        run_validations,
    )

    spark = get_spark(
        app_name="sparvi-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    def bench(name, fn, warmup: bool = True):
        if warmup:  # JIT/codegen/page-cache warm-up → stabler timings
            fn()
        # min-of-2 timed runs: shields round-over-round compares from
        # GC/scheduler noise (~±10% observed on single runs)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # full profiling pass over the fact table — the product's flagship
    bench("profile_lineitem", lambda: profile_table(spark, "lineitem"))
    bench("profile_orders", lambda: profile_table(spark, "orders"))

    # validation batch: all default rules for lineitem + orders
    rules = get_default_validations(
        spark, "lineitem", primary_keys=["l_orderkey", "l_linenumber"]
    ) + get_default_validations(spark, "orders", primary_keys=["o_orderkey"])
    bench("validations_default", lambda: run_validations(spark, rules))

    # representative §2 + extension queries (forced via noop sink)
    for name in (
        "pricing_summary",
        "numeric_summary",
        "frequent_values",
        "dedup_minhash",
        "ngram_jaccard",
        "embedding_topk",
        "quality_scores",
        "events_hourly",
        "range_join_events",
        "bm25_search",
        "fuzzy_name_pairs",
        "latest_events",
    ):
        bench(name, lambda n=name: _force(qs[n](spark, sf_dir)))

    # simhash left the 50-query pin in round 4 (→ fuzzy_name_pairs) but
    # stays in the bench for round-over-round continuity
    bench("simhash", lambda: _force(entrymod.q_simhash(spark, sf_dir)))

    # bigram LM perplexity: train + broadcast-model scoring (round 5)
    from sparvi_core_spark.functions.lm import score_perplexity, train_bigram_lm

    def run_perplexity():
        lm = train_bigram_lm(spark.table("documents"))
        _force(score_perplexity(spark.table("documents"), lm, broadcast_model=True))

    bench("perplexity", run_perplexity)

    # certified-exact heavy hitters over the full token space (round 4)
    from pyspark.sql import functions as F

    from sparvi_core_spark.operators.frequent import heavy_hitters

    def run_heavy_hitters():
        toks = (
            spark.table("documents")
            .select(F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
            .filter(F.col("term") != "")
        )
        hh = heavy_hitters(toks, "term", k=20, capacity=4096)
        rows = hh.topk.collect()
        assert hh.is_exact(rows[-1]["n"])

    bench("heavy_hitters", run_heavy_hitters)

    # mergeable profile tier (late round 4): reduce lineitem to its
    # per-column sketch summary and merge it back to corpus stats —
    # the profile-once-never-rescan path (KLL quantiles + HLL + moments)
    from sparvi_core_spark.profiler.incremental import (
        merge_profiles,
        partition_profile,
    )

    def run_incremental_profile():
        parts = partition_profile(spark.table("lineitem"))
        merge_profiles(parts).collect()  # O(columns) rows

    bench("incremental_profile", run_incremental_profile)

    # end-to-end corpus prep (quality filter → LSH dedup → survivors)
    from sparvi_core_spark.operators.pipeline import prepare_corpus

    def run_pipeline():
        # keep_cache=True: the immediate write of `clean` reads the
        # quality stage from cache; the returned handle is unpersisted
        # after — the documented fast path for write-right-after usage
        clean, report = prepare_corpus(spark.table("documents"), keep_cache=True)
        _force(clean.select("doc_id", "quality_score"))
        report["cache"].unpersist()

    bench("prepare_corpus", run_pipeline)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sparvi_core_spark headline suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
