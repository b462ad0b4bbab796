"""End-to-end training-corpus preparation: every pipeline stage this
engine ships, composed in the order a production run uses them.

    raw docs
      → recrawl compaction              (latest fetch per URL)
      → per-host supply cap             (no megahost dominates)
      → boilerplate line removal        (corpus-level line dedup)
      → duplicated-span screen          (exact substring dedup)
      → quality filter + repetition     (prepare_corpus: Gopher gates)
      → near-dup dedup, best survivor   (MinHash LSH → CC → argmax)
      → LM perplexity band filter       (KenLM-style interpolated-KN
                                         trigram — the CCNet recipe)
      → compression-ratio gate          (model-free: spam gzips too
                                         well, soup barely at all)
      → NB classifier gate              (fastText-style: heuristic
                                         seeds train a hashed-feature
                                         model that generalizes them)
      → DSIR targeted selection         (hashed-n-gram importance
                                         resampling toward a target
                                         domain)
      → eval-set decontamination        (13-gram collision screen)
      → Bloom novelty pre-screen        (join-free bit-array pass;
                                         exact near-dup screen then
                                         only sees survivors)
      → novelty screen vs prior corpus  (incremental ingest)
      → contamination-safe splits       (xxhash64, append-invariant)
      → split drift check               (PSI: train vs val distribution)
      → corpus stats                    (certified-exact heavy hitters)
      → domain mixture                  (temperature-scaled budgets)
      → sequence packing                (chunked, budget windows)
      → BPE vocab + encode stats        (tokenizer induction)
      → shard export + manifest         (hash shards, loader-ready)

Run: python examples/corpus_pipeline.py [sf_dir]   (default sf0.001)
Prints one JSON report of per-stage attrition.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from sparvi_core_spark import get_spark
    from sparvi_core_spark.functions.text import token_counts
    from sparvi_core_spark.operators.boilerplate import remove_boilerplate_lines
    from sparvi_core_spark.operators.decontamination import (
        filter_ngram_contaminated,
    )
    from sparvi_core_spark.operators.dedup import novelty_filter
    from sparvi_core_spark.operators.mixing import mix_corpora, mixture_report
    from sparvi_core_spark.operators.packing import pack_chunked, packing_stats
    from sparvi_core_spark.operators.pipeline import prepare_corpus
    from sparvi_core_spark.operators.sampling import hash_split

    spark = get_spark(app_name="corpus-pipeline-example", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    report["raw_docs"] = docs.count()

    # 0. recrawl compaction: a real crawl feed carries URLs and
    #    re-fetches; simulate both (URL from source+id, a 10% refetch
    #    batch whose URLs arrive tracker-decorated and differently
    #    cased — the raw-URL key would treat them as NEW pages). The
    #    canonical URL is the compaction key, so the newest fetch per
    #    RESOURCE wins in one aggregation.
    from sparvi_core_spark.functions.web import canonicalize_url, cap_per_host
    from sparvi_core_spark.operators.ingest import latest_by_key

    with_url = docs.withColumn(
        "url",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 (F.col("doc_id") % 1000).cast("string")),
    ).withColumn("fetched_at", F.lit(1))
    refetch = (
        with_url.filter(F.col("doc_id") % 10 == 0)
        .withColumn("fetched_at", F.lit(2))
        .withColumn(
            "url",
            F.concat(
                F.lit("HTTPS://"),
                F.upper("source"),
                F.lit(".EXAMPLE.COM/doc/"),
                (F.col("doc_id") % 1000).cast("string"),
                F.lit("/?utm_source=recrawl&fbclid=x"),
            ),
        )
    )
    both = with_url.unionByName(refetch).withColumn(
        "canon_url", canonicalize_url("url")
    )
    compacted = latest_by_key(
        both, ["canon_url"], "fetched_at", tie_col="doc_id"
    ).drop("canon_url")
    report["after_recrawl_compaction"] = compacted.count()

    # 0b. per-host supply cap: no single host contributes more than
    #     max_docs documents (unbiased hash draw; two-phase plan means
    #     no task sorts a megahost)
    docs = (
        cap_per_host(compacted, max_docs=400, order="hash")
        .drop("url", "fetched_at")
        .localCheckpoint()
    )
    report["after_host_cap"] = docs.count()

    # 1. corpus-level boilerplate lines (row-count invariant).
    #    Each stage's output feeds several downstream consumers — cut
    #    the lineage between stages (in production: write each stage to
    #    the lake and read it back; localCheckpoint is the in-session
    #    equivalent) so later actions don't recompute the whole chain.
    docs = remove_boilerplate_lines(docs, min_docs=2, min_frac=0.3).localCheckpoint()

    # 1b. exact substring dedup, the full ExactSubstr policy: docs
    #     DOMINATED by cross-document duplicated spans are dropped;
    #     flagged spans in the surviving docs are TRIMMED out (the
    #     paper's deletion mode), so a boilerplate paragraph shared by
    #     two otherwise-good documents costs the corpus one paragraph,
    #     not two documents
    from sparvi_core_spark.operators.substring import (
        remove_duplicated_spans,
        substring_dup_stats,
    )

    heavy = substring_dup_stats(docs, window=20, min_docs=2).filter(
        F.col("dup_token_frac") > 0.8
    )
    docs = docs.join(
        heavy.select(F.col("id").alias("__heavy")),
        docs["doc_id"] == F.col("__heavy"),
        "left_anti",
    ).localCheckpoint()
    report["after_span_screen"] = docs.count()

    trimmed = remove_duplicated_spans(docs, window=20, min_docs=2)
    report["spans_trimmed_tokens"] = trimmed.agg(
        F.sum("n_tokens_removed")
    ).first()[0]
    docs = (
        docs.drop("text")
        .join(trimmed.select(F.col("id").alias("doc_id"), "text"), "doc_id")
        .withColumn("n_chars", F.length("text"))
        .filter(F.col("text") != "")
        .localCheckpoint()
    )
    report["after_span_trim"] = docs.count()

    # 1c. threshold calibration BEFORE committing the quality cutoff:
    #     one corpus pass gives the doc/char attrition at every
    #     candidate threshold — min_quality below is picked off this
    #     curve, not guessed
    from sparvi_core_spark.functions.text import (
        gopher_quality_flags,
        quality_features,
    )
    from sparvi_core_spark.operators.selection import filter_sweep

    qf = quality_features(docs).join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    sweep = filter_sweep(
        qf, "quality_score", [0.1, 0.2, 0.3, 0.5, 0.7], weight_col="n_chars"
    )
    report["quality_sweep"] = {
        str(r["threshold"]): {
            "docs": r["docs_kept"], "doc_frac": r["doc_frac"],
            "char_frac": r["weight_frac"],
        }
        for r in sweep.collect()
    }

    # 1d. Gopher/MassiveText document-quality rules: the published
    #     named thresholds as one shuffle-free scan. The required-
    #     English-words rule is off here (the synthetic corpus has a
    #     non-English vocabulary by construction — a real English
    #     crawl keeps the default).
    gflags = gopher_quality_flags(docs, min_required_words=0)
    docs = docs.join(
        gflags.filter("passes_gopher").select(F.col("id").alias("doc_id")),
        "doc_id",
    ).localCheckpoint()
    report["after_gopher_rules"] = docs.count()

    # 2-3. quality + repetition gates, near-dup dedup keeping the
    #      best-quality copy of each cluster
    clean, prep = prepare_corpus(
        docs,
        min_quality=0.2,
        dedup_threshold=0.6,
        max_dup_line_frac=0.5,
        survivor="best_quality",
    )
    report["prepare_corpus"] = {
        k: v for k, v in prep.items() if isinstance(v, int)
    }

    # 3b. LM perplexity band filter: train an interpolated-KN trigram
    #     model on the cleaned corpus itself (production: a trusted
    #     reference corpus), drop the high-perplexity tail (gibberish)
    #     — the CCNet recipe (functions.lm's add-k bigram is the
    #     cheaper tier of the same stage)
    from sparvi_core_spark.functions.knlm import (
        score_perplexity_kn,
        train_kn_lm,
    )

    lm = train_kn_lm(clean)
    ppl = score_perplexity_kn(clean, lm, broadcast_model=True)
    cutoff = ppl.agg(
        F.percentile_approx("perplexity", 0.95).alias("p95")
    ).first()["p95"]
    clean = clean.join(
        ppl.filter(F.col("perplexity") <= cutoff).select("doc_id"), "doc_id"
    ).localCheckpoint()
    report["after_perplexity_filter"] = clean.count()
    report["perplexity_p95_cutoff"] = round(float(cutoff), 2)

    # 3b-ii. model-free compression gate: templated spam gzips too
    #        well, byte soup barely at all — zero training, map-only
    from sparvi_core_spark.operators.compression import compression_filter

    clean = compression_filter(
        clean, max_ratio=8.0, min_ratio=1.1
    ).localCheckpoint()
    report["after_compression_filter"] = clean.count()

    # 3c. trained classifier gate: the quality heuristic's verdicts
    #     become weak labels, a hashed-feature NB model learns to
    #     reproduce them from token evidence, and its predictions
    #     (which GENERALIZE past the hand-written rules) gate the
    #     corpus — the fastText quality-classifier recipe
    from sparvi_core_spark.operators.classify import classify_nb, train_nb

    median_q = clean.agg(
        F.percentile_approx("quality_score", 0.5)
    ).first()[0]
    seeds = clean.select(
        "doc_id",
        "text",
        F.when(F.col("quality_score") >= median_q, "keep")
        .otherwise("drop")
        .alias("seed_label"),
    )
    nb = train_nb(seeds, "seed_label", num_features=1 << 16)
    preds = classify_nb(clean, nb)
    agree = (
        seeds.join(preds.select("doc_id", "label"), "doc_id")
        .agg(F.avg((F.col("seed_label") == F.col("label")).cast("double")))
        .first()[0]
    )
    clean = clean.join(
        preds.filter(F.col("label") == "keep").select("doc_id"), "doc_id"
    ).localCheckpoint()
    report["after_classifier_gate"] = clean.count()
    report["classifier_seed_agreement"] = round(float(agree), 3)

    # 3c. DSIR: resample toward a (simulated) target domain — here the
    #     corpus's own English slice stands in for "looks like the
    #     reference corpus". Greedy mode keeps the attrition
    #     deterministic for the report; production uses the Gumbel
    #     sampler (greedy=False).
    from sparvi_core_spark.operators.selection import (
        select_corpus,
        train_dsir,
    )

    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    dsir = train_dsir(target, clean, num_buckets=4096)
    keep_n = int(report["after_classifier_gate"] * 0.9)
    clean = select_corpus(clean, dsir, keep_n, greedy=True).drop(
        "log_importance"
    )
    report["after_dsir_selection"] = clean.count()

    # 4. decontaminate against a (simulated) eval set
    evalset = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    decon = filter_ngram_contaminated(clean, evalset, n=13)
    report["decontaminated_docs"] = decon.count()

    # 5. novelty screen vs a (simulated) previously-ingested corpus.
    #    A Bloom pre-screen knocks out EXACT re-fetches map-only (no
    #    join, no prior-corpus re-shuffle); the MinHash near-dup
    #    screen then runs on the survivors. No false negatives: the
    #    bloom never lets a known text through to the corpus.
    from sparvi_core_spark.operators.membership import (
        bloom_build,
        bloom_probe,
    )

    prior = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    seen = bloom_build(
        prior, "text", expected_n=max(report["raw_docs"], 1), fpp=0.001
    )
    flagged = bloom_probe(decon, seen, "text")
    exact_refetch = flagged.filter(F.col("maybe_member"))
    decon = flagged.filter(~F.col("maybe_member")).drop("maybe_member")
    report["bloom_exact_refetches"] = exact_refetch.count()
    report["bloom_fill_ratio"] = round(seen.fill_ratio(), 3)
    novel, matches = novelty_filter(decon, prior, threshold=0.8)
    report["novel_docs"] = novel.count()
    report["recrawl_matches"] = matches.count()

    # 6. contamination-safe splits
    splits = hash_split(novel, {"train": 0.9, "val": 0.05, "test": 0.05})
    report["splits"] = {k: v.count() for k, v in splits.items()}

    # 6b. split integrity: a hash split must NOT change the data
    #     distribution — PSI of the train split against its parent
    #     corpus must read "stable" (< 0.1). (Against the tiny val
    #     split the index would be dominated by small-sample noise at
    #     this toy scale; compare like-sized populations.)
    from sparvi_core_spark.functions.stats import psi_drift

    drift = psi_drift(novel, splits["train"], "n_chars", bins=10).first()
    report["split_drift_psi_n_chars"] = drift["psi"]

    # 6c. corpus stats: exact top terms WITHOUT shuffling the full
    #     distinct-token space (certified by the Misra-Gries bound)
    from sparvi_core_spark.operators.frequent import heavy_hitters

    tok_stream = splits["train"].select(
        F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    ).filter(F.col("term") != "")
    hh = heavy_hitters(tok_stream, "term", k=10, capacity=1024)
    hh_rows = hh.topk.collect()
    report["top_terms"] = [(r["value"], r["n"]) for r in hh_rows[:5]]
    report["top_terms_certified_exact"] = hh.is_exact(hh_rows[-1]["n"])

    # 7. domain mixture over the train split: temperature-scaled
    #    weights (T=3 flattens the source distribution toward uniform
    #    without the hard cliff of exact-uniform; supply-capped)
    from sparvi_core_spark.operators.mixing import temperature_weights

    train = splits["train"]
    toks = token_counts(train).select(
        F.col("id").alias("doc_id"), F.col("ws_tokens").alias("n_tokens")
    )
    train_tok = train.join(toks, on="doc_id")
    total_budget = int(
        train_tok.agg(F.sum("n_tokens")).first()[0] * 0.8
    )
    weights = temperature_weights(
        train_tok, temperature=3.0, domain_col="source",
        tokens_col="n_tokens", total_tokens=total_budget,
    )
    mixed = mix_corpora(
        train_tok, weights, total_budget,
        domain_col="source", tokens_col="n_tokens",
    )
    report["mixture"] = [
        r.asDict()
        for r in mixture_report(
            mixed, weights, total_budget,
            domain_col="source", tokens_col="n_tokens",
        ).collect()
    ]

    # 8. pack into 2048-token context windows (num_groups sets shuffle
    #    parallelism — scale it to the corpus; every pack except each
    #    group's last is exactly full)
    packed = pack_chunked(mixed, budget=2048, sep_tokens=1, num_groups=2)
    report["packing"] = packing_stats(packed, budget=2048).first().asDict()

    # 9. tokenizer induction on the final train mix: BPE merges from
    #    distributed word counts, then encode to measure the
    #    tokens-per-word compression the learned vocab achieves
    from sparvi_core_spark.operators.bpe import bpe_encode, bpe_train

    merges = bpe_train(mixed, num_merges=200)
    enc = bpe_encode(mixed, merges).agg(
        F.sum("n_tokens").alias("bpe_tokens")
    ).first()
    ws_tokens = mixed.agg(F.sum("n_tokens")).first()[0]
    report["bpe"] = {
        "merges": len(merges),
        "bpe_tokens": int(enc["bpe_tokens"]),
        "bpe_tokens_per_word": round(enc["bpe_tokens"] / ws_tokens, 3),
    }

    # 10. mergeable release stats: profile THIS release once into
    #     summary sketches (never rescan it later), and measure how
    #     much of the previous release's doc set survives via theta
    #     sketches — the O(sketch) corpus-version diff
    from sparvi_core_spark.profiler.incremental import (
        merge_profiles,
        partition_profile,
        theta_overlap,
        theta_summary,
    )

    release = mixed.withColumn("fp", F.md5(F.col("text")))
    summary = partition_profile(
        release, ["n_tokens", "quality_score"], batch_id="release"
    )
    prof = {
        r["column"]: r.asDict() for r in merge_profiles(summary).collect()
    }
    report["release_profile"] = {
        c: {
            "rows": p["n_rows"],
            "mean": p["mean"],
            "p50": p["p50"],
        }
        for c, p in prof.items()
    }
    prior = docs.withColumn("fp", F.md5(F.col("text")))  # stand-in prior
    ov = theta_overlap(
        theta_summary(prior, ["fp"], batch_id="prior"),
        theta_summary(release, ["fp"], batch_id="release"),
    ).first()
    report["vs_prior_release"] = {
        "docs_shared": int(ov["n_intersection"]),
        "docs_new": int(ov["n_only_b"]),
        "docs_dropped": int(ov["n_only_a"]),
    }

    # 10b. lexical-health delta: aggressive filtering that collapsed
    #      diversity would show here (entropy/TTR crash, Zipf slope
    #      drifting from ≈ −1) before it shows in a trained model
    from sparvi_core_spark.operators.diversity import corpus_diversity

    # (`docs` was last reassigned after the span screen — that's the
    # honest "before the model-based gates" baseline)
    # cache_freq=True: the unigram frequency frame feeds two consumers
    # (totals + the Zipf head) and Catalyst doesn't share subplans, so
    # the default lazy plan tokenizes the corpus twice per call —
    # persisting the vocab-bounded frame tokenizes once per n-gram
    # order instead. Measured on the sf0.01 documents fixture
    # (local[32], best of 3): 1.07 s → 0.87 s per call (~1.2×); the
    # win grows with corpus size because the saved work is a
    # full-corpus tokenize, while the cached frame stays vocab-bounded.
    report["diversity"] = {
        "pre_filter": corpus_diversity(docs, cache_freq=True)
        .first()
        .asDict(),
        "release": corpus_diversity(mixed, cache_freq=True)
        .first()
        .asDict(),
    }

    # 10b'. distribution-shift audit between the same two snapshots:
    #       how much token MASS the gates moved (JS/TVD), whether the
    #       movement is one-sided (KL asymmetry), and the type-level
    #       survival rate (vocab Jaccard) — the number a release note
    #       quotes when swapping corpus versions
    from sparvi_core_spark.operators.diversity import corpus_divergence

    report["divergence_pre_vs_release"] = (
        corpus_divergence(docs, mixed).first().asDict()
    )

    # 10c. privacy scrub: redact PII in the release text (typed
    #      placeholders; card shapes over-removed — the safe
    #      direction) and record the release gate — total_* must be 0
    #      AFTER the scrub, whatever the crawl contained before.
    from sparvi_core_spark.operators.pii import pii_summary, redact_pii

    before_gate = pii_summary(mixed).first().asDict()
    mixed = redact_pii(mixed)
    after_gate = pii_summary(mixed).first().asDict()
    assert after_gate["docs_with_pii"] == 0, after_gate
    report["pii_gate"] = {
        "before_docs_with_pii": before_gate["docs_with_pii"],
        "after_docs_with_pii": after_gate["docs_with_pii"],
    }

    # 11. ship it: the train split as loader-ready hash shards with a
    #     manifest (membership is a pure function of doc_id — append
    #     a future crawl and unchanged docs keep their shard)
    import tempfile

    from sparvi_core_spark.sources.writers import write_training_shards

    shard_dir = os.path.join(tempfile.mkdtemp(prefix="corpus_"), "shards")
    manifest = write_training_shards(
        mixed, shard_dir, n_shards=4, tokens_col="n_tokens"
    )
    report["shards"] = {
        "n_shards": manifest["n_shards"],
        "rows": manifest["rows"],
        "tokens": manifest["tokens"],
        "path": shard_dir,
    }

    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
