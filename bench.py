"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Timings exclude JVM/session startup. DataFrame queries are forced with
the ``noop`` sink (full execution, no driver materialization); the
profiler/validator timings are the end-to-end API calls (their results
ARE driver-side dicts — that's the product shape).

Noise model: this sandbox shows 4.5x wall-clock swings on identical
commits when the machine is contended (SCALE.md "bench noise" study;
round-4 artifact recorded fuzzy_name_pairs at 12.9 s where the same
commit measures 1.7 s quiet).  Two back-to-back runs of one query land
inside the same contention window, so min-of-2-per-query doesn't help.
Defense here:

* one full warm-up pass over the whole suite (JIT/codegen/page cache),
* then ``SPARK_GRAFT_BENCH_PASSES`` (default 3) timed passes over the
  WHOLE suite, interleaved — consecutive timings of the same query are
  minutes apart, so a transient contention burst can only poison one
  of the three samples,
* per-query value = min across passes; ``spread`` = max/min per query
  and ``contention`` = the median of those ratios.  A quiet machine
  gives contention ~1.0-1.3; >2 means the artifact was measured in a
  storm and even the minima deserve suspicion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df):
    df.write.format("noop").mode("overwrite").save()


# rows in the calibration cell: big enough to be a stable ~1-2 s of
# pure JVM compute on 32 cores, small enough to cost nothing next to
# the suite
_CALIBRATION_ROWS = 1_600_000_000


def run_calibration(spark) -> float:
    """Fixed-cost, I/O-free machine-speed probe: hash-reduce N longs
    through whole-stage codegen (zero scan, zero shuffle beyond the
    final 1-row reduce). Identical work every round, so
    ``total / calibration`` is a machine-normalized suite cost —
    round-over-round bench comparison divides by this instead of
    adjudicating contention by prose (round 8, VERDICT r7 #4)."""
    t0 = time.time()
    (
        spark.range(0, _CALIBRATION_ROWS, 1,
                    spark.sparkContext.defaultParallelism)
        .selectExpr("sum(xxhash64(id) % 1000003L) AS h")  # mod: no ANSI long overflow
        .collect()
    )
    return time.time() - t0


def build_suite(spark, sf_dir):
    """Return the ordered list of (name, thunk) benchmark cases."""
    from sparvi_core_spark import (
        get_default_validations,
        profile_table,
        run_validations,
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    suite: list[tuple[str, object]] = []

    # full profiling pass over the fact table — the product's flagship
    suite.append(("profile_lineitem", lambda: profile_table(spark, "lineitem")))
    suite.append(("profile_orders", lambda: profile_table(spark, "orders")))

    # validation batch: all default rules for lineitem + orders
    rules = get_default_validations(
        spark, "lineitem", primary_keys=["l_orderkey", "l_linenumber"]
    ) + get_default_validations(spark, "orders", primary_keys=["o_orderkey"])
    suite.append(("validations_default", lambda: run_validations(spark, rules)))

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
        "pq_codes",
        "conversation_stats",
    ):
        suite.append((name, lambda n=name: _force(qs[n](spark, sf_dir))))

    # simhash left the 50-query pin in round 4 (→ fuzzy_name_pairs) but
    # stays in the bench for round-over-round continuity
    suite.append(("simhash", lambda: _force(entrymod.q_simhash(spark, sf_dir))))

    # bigram LM perplexity: train + broadcast-model scoring
    from sparvi_core_spark.functions.lm import score_perplexity, train_bigram_lm

    def run_perplexity():
        lm = train_bigram_lm(spark.table("documents"))
        _force(score_perplexity(spark.table("documents"), lm, broadcast_model=True))

    suite.append(("perplexity", run_perplexity))

    # certified-exact heavy hitters over the full token space
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

    suite.append(("heavy_hitters", run_heavy_hitters))

    # mergeable profile tier: reduce lineitem to its per-column sketch
    # summary and merge it back to corpus stats — the
    # profile-once-never-rescan path (KLL quantiles + HLL + moments)
    from sparvi_core_spark.profiler.incremental import (
        merge_profiles,
        partition_profile,
    )

    def run_incremental_profile():
        parts = partition_profile(spark.table("lineitem"))
        merge_profiles(parts).collect()  # O(columns) rows

    suite.append(("incremental_profile", run_incremental_profile))

    # end-to-end corpus prep (quality filter → LSH dedup → survivors)
    from sparvi_core_spark.operators.pipeline import prepare_corpus

    def run_pipeline():
        # keep_cache=True: the immediate write of `clean` reads the
        # quality stage from cache; the returned handle is unpersisted
        # after — the documented fast path for write-right-after usage
        clean, report = prepare_corpus(spark.table("documents"), keep_cache=True)
        _force(clean.select("doc_id", "quality_score"))
        report["cache"].unpersist()

    suite.append(("prepare_corpus", run_pipeline))

    # eval-set hygiene: per-benchmark-item contamination audit against
    # the full corpus (reference side = every 20th doc, broadcast)
    from sparvi_core_spark.operators.decontamination import (
        eval_contamination_report,
    )

    def run_contamination():
        docs = spark.table("documents")
        ref = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
        _force(eval_contamination_report(docs, ref, n=8))

    suite.append(("eval_contamination", run_contamination))

    # chunk→doc embedding pooling: weighted mean + L2 normalize — the
    # chunk-vector → document-vector bridge on the ANN critical path
    from sparvi_core_spark.operators.similarity import pool_embeddings

    def run_pool_embeddings():
        chunks = spark.table("embeddings").select(
            (F.col("vec_id") % 1000).alias("doc_id"),
            "embedding",
            (F.col("vec_id") % 7 + 1).cast("double").alias("w"),
        )
        _force(
            pool_embeddings(
                chunks, group_col="doc_id", weight_col="w", normalize=True
            )
        )

    suite.append(("pool_embeddings", run_pool_embeddings))

    # interpolated-KN trigram: train (one corpus pass) + broadcast-model
    # scoring — the real CCNet-tier perplexity filter (r6)
    from sparvi_core_spark.functions.knlm import (
        score_perplexity_kn,
        train_kn_lm,
    )

    def run_kn_perplexity():
        lm = train_kn_lm(spark.table("documents"))
        _force(
            score_perplexity_kn(
                spark.table("documents"), lm, broadcast_model=True
            )
        )

    suite.append(("kn_perplexity", run_kn_perplexity))

    # hashed-feature NB: train on lang labels + map-only argmax (r6)
    from sparvi_core_spark.operators.classify import classify_nb, train_nb

    def run_nb_classify():
        model = train_nb(
            spark.table("documents"), "lang", num_features=1 << 18
        )
        _force(classify_nb(spark.table("documents"), model))

    suite.append(("nb_classify", run_nb_classify))

    # DSIR targeted selection: train target/raw importance model +
    # score every doc + greedy top-n keep (r6)
    from sparvi_core_spark.operators.selection import (
        select_corpus,
        train_dsir,
    )

    def run_dsir_select():
        docs = spark.table("documents")
        target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
        model = train_dsir(target, docs, num_buckets=4096)
        _force(select_corpus(docs, model, 1000, greedy=True))

    suite.append(("dsir_select", run_dsir_select))

    # PII scrub: detect (Luhn-verified counts) + redact + the one-row
    # release gate — map-only, expression-only (r7)
    from sparvi_core_spark.operators.pii import pii_summary, redact_pii

    def run_pii_scan():
        docs = spark.table("documents")
        pii_summary(docs).collect()  # 1 row
        _force(redact_pii(docs))

    suite.append(("pii_scan", run_pii_scan))

    # text normalization: expression tier + NFC kernel + gated
    # mojibake repair over the whole corpus (r7)
    from sparvi_core_spark.functions.textnorm import (
        clean_text_col,
        fix_mojibake,
        unicode_normalize,
    )

    def run_normalize_text():
        docs = spark.table("documents").select(
            "doc_id", clean_text_col("text").alias("text")
        )
        _force(fix_mojibake(unicode_normalize(docs, "text"), "text"))

    suite.append(("normalize_text", run_normalize_text))

    # binary-sketch ANN serving path: 256-bit SRP binarization (blas)
    # of the whole embeddings corpus + Hamming pre-rank + exact cosine
    # re-rank of the candidate pool (r7)
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk,
        hamming_topk_rerank,
    )

    def run_hamming_search():
        emb = spark.table("embeddings").select("vec_id", "embedding")
        sk = binarize_embeddings(emb, bits=256, seed=7, engine="blas")
        _force(
            hamming_topk_rerank(
                sk,
                sk.filter(F.col("vec_id") % 100 == 0),
                k=10,
                rerank=50,
            )
        )

    suite.append(("hamming_search", run_hamming_search))

    # hybrid retrieval: lexical BM25 over documents fused with a
    # binary-sketch vector ranking over the aligned embeddings
    # (vec_id == doc_id by fixture construction), RRF k=60 (r7)
    from pyspark.sql import Window

    from sparvi_core_spark.operators.ranking import bm25_search, rrf_fuse

    def run_hybrid_search():
        docs = spark.table("documents")
        lex = bm25_search(docs, "data quality pipeline", top_n=50).select(
            F.lit(0).alias("query_id"),
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
            .alias("rank"),
        )
        sk = binarize_embeddings(
            spark.table("embeddings").select("vec_id", "embedding"),
            bits=256,
            seed=7,
            engine="blas",
        )
        vec = hamming_topk(
            sk, sk.filter(F.col("vec_id") == 0), k=50
        ).select(
            F.lit(0).alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        _force(rrf_fuse([lex, vec], k=60, top_n=20))

    suite.append(("hybrid_search", run_hybrid_search))

    # Gopher/MassiveText quality rules: the named document-quality
    # bundle as one shuffle-free corpus scan (r7)
    from sparvi_core_spark.functions.text import gopher_quality_flags

    suite.append(
        (
            "gopher_flags",
            lambda: _force(gopher_quality_flags(spark.table("documents"))),
        )
    )

    # C4 cleaning: line filter + page flags, map-only (r7)
    from sparvi_core_spark.functions.text import c4_clean

    suite.append(
        ("c4_clean", lambda: _force(c4_clean(spark.table("documents"))))
    )

    # the complete Gopher repetition table: 11 granularities (lines,
    # paragraphs, 2..10-grams) in one tagged explode (r7)
    from sparvi_core_spark.functions.text import gopher_repetition_flags

    suite.append(
        (
            "gopher_repetition",
            lambda: _force(
                gopher_repetition_flags(spark.table("documents"))
            ),
        )
    )

    # threshold attrition sweep over the heuristic quality score —
    # 20 candidate thresholds, ONE corpus pass via pass-count
    # bucketing (r7)
    from sparvi_core_spark.functions.text import quality_features
    from sparvi_core_spark.operators.selection import filter_sweep

    def run_filter_sweep():
        docs = spark.table("documents")
        qf = quality_features(docs).join(
            docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
        )
        filter_sweep(
            qf,
            "quality_score",
            [i / 20 for i in range(20)],
            weight_col="n_chars",
        ).collect()  # 20 rows

    suite.append(("filter_sweep", run_filter_sweep))

    # URL canonicalization + exact URL dedup over planted tracker/case
    # variants — two crawl spellings per document (r7)
    from sparvi_core_spark.functions.web import dedup_by_url

    def run_url_dedup():
        docs = spark.table("documents")
        base = docs.select(
            "doc_id",
            F.concat(
                F.lit("HTTPS://WWW.Example.COM/d/"),
                F.col("doc_id").cast("string"),
                F.lit("/?utm_source=s&b=2&a=1#f"),
            ).alias("url"),
        )
        variant = docs.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("https://example.com/d/"),
                F.col("doc_id").cast("string"),
                F.lit("?a=1&b=2"),
            ).alias("url"),
        )
        _force(dedup_by_url(base.unionByName(variant)))

    suite.append(("url_dedup", run_url_dedup))

    # char-n-gram NB language ID: train on the built-in 12-language
    # seeds + classify the whole corpus (r8)
    from sparvi_core_spark.functions.text import language_id, train_langid

    def run_langid_ngram():
        model = train_langid(spark)
        _force(language_id(spark.table("documents"), strategy="ngram",
                           model=model))

    suite.append(("langid_ngram", run_langid_ngram))

    # corpus-wide paragraph dedup: hash explode + df groupBy + indexed
    # rewrite (r8). The organic corpus has few shared paragraphs — the
    # honest cost is the full hashing/grouping pass, not the rewrites.
    from sparvi_core_spark.operators.substring import dedup_paragraphs

    suite.append(
        ("para_dedup",
         lambda: _force(dedup_paragraphs(spark.table("documents"))))
    )

    # CCNet per-language perplexity terciles: LM train + score +
    # per-group quantiles + broadcast tag join (r8)
    from sparvi_core_spark.functions.lm import perplexity_buckets

    def run_ppl_buckets():
        lm = train_bigram_lm(spark.table("documents"))
        _force(perplexity_buckets(spark.table("documents"), lm, by="lang"))

    suite.append(("ppl_buckets", run_ppl_buckets))

    # lossless AllPairs prefix-filter Jaccard join (r8): candidate
    # generation from rarest-shingle prefixes + exact verification —
    # the exact-recall sibling of ngram_jaccard's capped self-join
    from sparvi_core_spark.operators.dedup import allpairs_jaccard_pairs

    suite.append(
        ("allpairs_jaccard",
         lambda: _force(
             allpairs_jaccard_pairs(spark.table("documents"), threshold=0.8)
         ))
    )

    # Count-Min sketch build + whole-key-set scoring (r8): one
    # explode(3) + cell groupBy collect, then a broadcast-join score
    from sparvi_core_spark.operators.sketch import cms_build, cms_score

    def run_cms():
        orders = spark.table("orders")
        sk = cms_build(orders, "o_custkey", depth=3, width=4096)
        _force(cms_score(orders.select("o_custkey").distinct(), sk,
                         "o_custkey"))

    suite.append(("cms_counts", run_cms))

    # stored-index probe (r10): the suite previously measured no
    # stored-index path, so probe regressions (like the r8
    # double-compute) only surfaced in ad-hoc stress cells.  The index
    # is built ONCE per bench session (untimed — that's the one-time
    # setup cost of the ingest loop); each pass times the steady-state
    # operation: probing a fixed 1k-doc recrawl batch (copies of
    # stored docs under fresh ids, so candidate generation AND the
    # verification join both run) against the full corpus index.
    import tempfile

    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.minhash_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    mhidx_path = os.path.join(
        tempfile.mkdtemp(prefix="sparvi_bench_"), "mhidx"
    )
    write_minhash_index(
        spark.table("documents").select("doc_id", "text"),
        mhidx_path, num_hashes=16, threshold=0.8, n_buckets=256,
    )
    probe_batch = (
        spark.table("documents")
        .filter(F.col("doc_id") < 1000)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .localCheckpoint()  # pin the batch; the timed work is the probe
    )

    suite.append((
        "mhidx_probe",
        lambda: _force(probe_minhash_index(spark, mhidx_path, probe_batch)),
    ))

    # stored ANN search (r11): the embedding indexes' steady-state
    # serving path, same shape as mhidx_probe — index built ONCE per
    # bench session (untimed), each pass times a fixed 1k-query batch
    # through the cell-pruned scan + per-cell top-k (nprobe pinned).
    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources.ann_index import (
        search_ivf_index,
        write_ivf_index,
    )

    ivfidx_path = os.path.join(
        tempfile.mkdtemp(prefix="sparvi_bench_"), "ivfidx"
    )
    emb = spark.table("embeddings").select("vec_id", "embedding")
    ivf_cents, _ = kmeans_fit(emb, k=16, max_iter=5, seed=11)
    write_ivf_index(emb, ivf_cents.localCheckpoint(), ivfidx_path)
    query_batch = (
        emb.filter(F.col("vec_id") < 1000)
        .localCheckpoint()  # pin the batch; the timed work is the search
    )

    suite.append((
        "ivfidx_search",
        lambda: _force(search_ivf_index(
            spark, ivfidx_path, query_batch, k=10, nprobe=2,
        )),
    ))

    return suite


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sparvi_core_spark import get_spark, register_views

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

    suite = build_suite(spark, sf_dir)

    # warm-up: one untimed pass over the whole suite (+ calibration JIT)
    run_calibration(spark)
    for _, fn in suite:
        fn()

    # timed: `passes` interleaved full-suite passes; min per query.
    # Each pass opens with the fixed-cost calibration cell, so every
    # pass carries its own machine-speed reading.
    samples: dict[str, list[float]] = {name: [] for name, _ in suite}
    cal_samples: list[float] = []
    for _ in range(passes):
        cal_samples.append(run_calibration(spark))
        for name, fn in suite:
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)

    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    spreads = {
        name: round(max(ts) / max(min(ts), 1e-9), 2) for name, ts in samples.items()
    }
    ordered = sorted(spreads.values())
    contention = ordered[len(ordered) // 2] if ordered else 1.0

    total = round(sum(timings.values()), 3)
    cal = round(min(cal_samples), 3) if cal_samples else None
    provenance = {
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "pid": os.getpid(),
        "sf_dir": sf_dir,
        "cpus": cpus,
    }
    headline = {
        "metric": "sparvi_core_spark headline suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "passes": passes,
        # machine-speed denominator: identical pure-codegen work every
        # round; compare value/calibration across rounds instead of
        # adjudicating contention by prose (round 8, VERDICT r7 #4)
        "calibration": cal,
        "normalized_value": round(total / cal, 2) if cal else None,
        "contention": contention,
        "provenance": provenance,
    }
    # Full per-query detail (spread, calibration samples) goes on a
    # PRECEDING line; the FINAL stdout line is the headline record and
    # must stay under the driver's 2000-char tail-capture budget —
    # round 8's single-line artifact outgrew it and lost its own
    # `value` field (VERDICT r8 "What's wrong" #1).  If the suite grows
    # until even the headline is too long, drop `queries` from the
    # final line (they remain on the detail line above).
    detail = dict(headline)
    detail["spread"] = spreads
    detail["calibration_samples"] = [round(c, 3) for c in cal_samples]
    detail["record"] = "detail"
    print(json.dumps(detail))
    _TAIL_BUDGET = 1800
    if len(json.dumps(headline)) > _TAIL_BUDGET:
        headline["queries"] = "truncated: see detail line above"
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
