"""Adversarial skew stress-bench: proves the dedup/sessionization caps
bound runtime on pathological inputs (the load-bearing 100 TB claims).

Separate from ``bench.py`` on purpose — the driver's per-round bench
must stay comparable round-over-round; this harness generates its own
hostile corpora:

- ``ngram``: one template mass-duplicated so every one of its shingles
  is ubiquitous. Uncapped, the shared-shingle self-join fans out as
  Σ df(shingle)² (quadratic in copies); the stop-shingle cap +
  mass-duplicate rescue bound it while still emitting every copy's
  rescue pair.
- ``lsh``: the same degenerate corpus collapses into one LSH bucket per
  band. ``max_bucket`` drops degenerate buckets (candidates for them
  come from the exact/rescue path instead); uncapped is all-pairs.
- ``session``: one user owning half of all events — the inherent
  single-task straggler of per-user ordering, measured against the
  uniform baseline to quantify (not hide) the skew cost.
- ``mix``: millions of documents in a handful of domains — the
  one-reducer-per-domain hazard of a naive
  ``Window.partitionBy(domain)`` cumulative sum. The two-phase plan
  (bucket pre-agg + boundary-bucket window) is measured against the
  exact single-window plan on identical data, with identical output.
- ``fuzzy``: one name mass-duplicated — every copy shares every
  deletion variant, so the uncapped variant join fans out as
  keys × copies² while ``max_bucket`` drops the degenerate variants
  (identical copies are exact duplicates; exact dedup owns them).
- ``host_cap``: one megahost owning half of all documents — the
  window plan (default) against the bucketed spill-regime plan,
  identical kept set asserted. Honest outcome: at THIS scale the
  window plan wins on wall clock (a 4M-row in-memory sort is cheap);
  the bucketed plan's value is shuffle volume + straggler/spill
  avoidance when a megagroup exceeds one reducer's memory — which a
  local bench cannot exhibit, so the entry records the local
  overhead rather than hiding it.

Prints ONE JSON line: {"metric": ..., "entries": {name: sec|rows, ...}}.
Run: ``python stress_bench.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sparvi_core_spark import get_spark
    from sparvi_core_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from sparvi_core_spark.operators.timeseries import session_stats

    spark = get_spark(
        app_name="sparvi-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    entries: dict[str, float | int] = {}

    def bench(name, fn):
        t0 = time.time()
        out = fn()
        entries[name] = round(time.time() - t0, 3)
        return out

    # --- pathological corpus: n_dup copies of one template + n_uniq unique
    template = (
        "click here to unsubscribe from this mailing list and stop "
        "receiving further notifications about your account status"
    )
    n_dup, n_uniq = 8000, 3000
    dup = spark.range(n_dup).select(
        F.col("id").alias("doc_id"), F.lit(template).alias("text")
    )
    # 14 pseudo-random words per unique doc (hash-derived, deterministic)
    words = [
        F.concat(
            F.lit("w"),
            F.substring(F.md5(F.concat(F.lit(str(k)), F.col("id").cast("string"))), 1, 7),
        )
        for k in range(14)
    ]
    uniq = spark.range(n_uniq).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )
    corpus = dup.unionByName(uniq).localCheckpoint()

    # ngram with the stop-shingle cap (+ mass-dup rescue): bounded.
    # (time the COUNT — the DataFrame build is lazy)
    entries["ngram_capped_pairs"] = bench(
        "ngram_capped_sec",
        lambda: ngram_jaccard_pairs(corpus, max_doc_freq=500, threshold=0.8).count(),
    )
    # uncapped: the Σ df² fan-out — the quadratic path the cap prevents
    entries["ngram_uncapped_pairs"] = bench(
        "ngram_uncapped_sec",
        lambda: ngram_jaccard_pairs(corpus, max_doc_freq=None, threshold=0.8).count(),
    )

    # LSH banding over the same corpus: n_dup identical docs = one
    # degenerate bucket per band
    sig = minhash_signatures(corpus, num_hashes=8).localCheckpoint()
    t0 = time.time()
    entries["lsh_capped_pairs"] = lsh_candidate_pairs(
        sig, num_hashes=8, bands=4, max_bucket=1000
    ).count()
    entries["lsh_capped_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    entries["lsh_uncapped_pairs"] = lsh_candidate_pairs(
        sig, num_hashes=8, bands=4, max_bucket=1 << 40
    ).count()
    entries["lsh_uncapped_sec"] = round(time.time() - t0, 3)

    # --- hot-user sessionization: n_ev events, uniform vs 50% on one user
    n_ev = 4_000_000
    base = spark.range(n_ev).select(
        F.col("id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000)
        ).alias("ts"),
    )
    uniform = base.select(
        (F.col("id") % 40_000).alias("user_id"), F.col("ts")
    ).localCheckpoint()
    hot = base.select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 40_000)
        .alias("user_id"),
        F.col("ts"),
    ).localCheckpoint()
    bench("session_uniform_sec", lambda: _force(session_stats(uniform)))
    bench("session_hot_user_sec", lambda: _force(session_stats(hot)))

    # --- corpus mixture: 8M docs, 4 domains (2M docs per window
    # partition in the exact plan — the single-reducer sort hazard)
    from sparvi_core_spark.operators.mixing import mix_corpora

    n_docs = 8_000_000
    domains = F.concat(F.lit("d"), (F.col("id") % 4).cast("string"))
    mix_corpus = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            domains.alias("domain"),
            (100 + (F.col("id") * 37) % 900).alias("n_tokens"),
        )
        .localCheckpoint()
    )
    mix_weights = {f"d{i}": 0.25 for i in range(4)}
    # ~half the total supply: the cutoff lands mid-domain everywhere
    mix_total = 8_000_000 * 550 // 2
    entries["mix_exact_rows"] = bench(
        "mix_exact_sec",
        lambda: mix_corpora(
            mix_corpus, mix_weights, mix_total, exact=True
        ).count(),
    )
    entries["mix_bucketed_rows"] = bench(
        "mix_bucketed_sec",
        lambda: mix_corpora(
            mix_corpus, mix_weights, mix_total, exact=False
        ).count(),
    )
    assert entries["mix_exact_rows"] == entries["mix_bucketed_rows"], (
        "two-phase mixture must select the identical set"
    )

    # --- fuzzy matching: one mass-duplicated name. 2k identical
    # 19-char strings share ~20 deletion keys → uncapped candidate
    # fan-out is keys × copies²/2 (~40M before distinct); capped, the
    # hot variants drop out and only the near-unique tail pairs up
    from sparvi_core_spark.operators.fuzzy import fuzzy_self_pairs

    n_fdup, n_funiq = 2_000, 5_000
    fdup = spark.range(n_fdup).select(
        F.col("id").alias("doc_id"), F.lit("Customer#000000001").alias("text")
    )
    funiq = spark.range(n_funiq).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("Customer#"),
            F.lpad((F.col("id") + 10_000).cast("string"), 9, "0"),
        ).alias("text"),
    )
    fuzzy_corpus = fdup.unionByName(funiq).localCheckpoint()
    entries["fuzzy_capped_pairs"] = bench(
        "fuzzy_capped_sec",
        lambda: fuzzy_self_pairs(
            fuzzy_corpus, max_edits=1, max_bucket=500
        ).count(),
    )
    entries["fuzzy_uncapped_pairs"] = bench(
        "fuzzy_uncapped_sec",
        lambda: fuzzy_self_pairs(fuzzy_corpus, max_edits=1).count(),
    )

    # --- megahost document cap: 8M docs, half on one host
    from sparvi_core_spark.functions.web import cap_per_group

    n_cdocs = 8_000_000
    hosts = F.when(F.col("id") % 2 == 0, F.lit("megahost.com")).otherwise(
        F.concat(F.lit("h"), (F.col("id") % 40_000).cast("string"))
    )
    cap_corpus = (
        spark.range(n_cdocs)
        .select(F.col("id").alias("doc_id"), hosts.alias("host"))
        .localCheckpoint()
    )
    entries["host_cap_window_rows"] = bench(
        "host_cap_window_sec",
        lambda: cap_per_group(
            cap_corpus, "host", 100, order="hash", plan="window"
        ).count(),
    )
    entries["host_cap_bucketed_rows"] = bench(
        "host_cap_bucketed_sec",
        lambda: cap_per_group(
            cap_corpus, "host", 100, order="hash", plan="bucketed"
        ).count(),
    )
    assert entries["host_cap_window_rows"] == entries["host_cap_bucketed_rows"], (
        "the two cap plans must keep the identical set"
    )

    # --- semantic dedup: big-cluster pair-search cost. 16k vectors in
    # 8 tight clusters of ~2k (the regime SemDeDup exists for), 160
    # planted twin pairs. Three knobs measured on identical data:
    # the salted pair join (big clusters otherwise evaluate their
    # quadratic term in ONE sort-merge task each), nprobe=2 (the
    # boundary-recall knob, ~4x candidate work at this cluster count),
    # and max_bucket (the degenerate-fit guard) — all returning the
    # same twin pairs.
    from sparvi_core_spark.operators.similarity import semantic_dedup

    dim, n_clusters, per_cluster = 16, 8, 2000
    n_vec = n_clusters * per_cluster
    vbase = spark.range(n_vec).select(
        F.col("id").alias("vec_id"), (F.col("id") % n_clusters).alias("c")
    )

    def _vec(idc):
        # cluster axis * 10 + per-id pseudo-random spread: members of a
        # cluster sit at cosine ~0.8 from each other (below threshold),
        # planted twins at exactly 1.0
        return F.array(
            *[
                (
                    F.when(F.col("c") % dim == i, F.lit(10.0)).otherwise(
                        F.lit(0.0)
                    )
                    + (
                        F.pmod(F.xxhash64(idc, F.lit(i)), F.lit(1000))
                        / F.lit(1000.0)
                        - F.lit(0.5)
                    )
                    * F.lit(4.0)
                )
                for i in range(dim)
            ]
        )

    v_orig = vbase.select("vec_id", "c", _vec(F.col("vec_id")).alias("embedding"))
    v_twin = vbase.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + n_vec).alias("vec_id"),
        "c",
        _vec(F.col("vec_id")).alias("embedding"),
    )
    emb_corpus = v_orig.unionByName(v_twin).drop("c").localCheckpoint()

    sem_pairs = {}
    for name, kwargs in (
        # expression-join engine with the salt parallelism knob (each
        # bucket otherwise evaluates its quadratic term in one task)
        ("semantic_expr_salted", {"salt_buckets": 32}),
        # BLAS engine: blocked per-bucket matmul via applyInPandas —
        # identical pair set, the 100 TB default for dense cosine
        ("semantic_blas", {"engine": "blas"}),
        # nprobe=2 on FEW well-separated clusters is its own hostile
        # case: every vector's second choice concentrates on the most
        # central centroid (here a 12.5k-member probe bucket, ~6x the
        # pair work, in ONE key) — the BLAS engine absorbs it
        ("semantic_blas_nprobe2", {"engine": "blas", "nprobe": 2}),
        ("semantic_capped", {"max_bucket": 500}),  # drops every cluster
    ):
        def run(kwargs=kwargs):
            _, rep = semantic_dedup(
                emb_corpus,
                threshold=0.99,
                n_clusters=n_clusters,
                kmeans_iter=4,
                **kwargs,
            )
            return rep["pairs"].count()

        sem_pairs[name] = bench(f"{name}_sec", run)
        entries[f"{name}_pairs"] = sem_pairs[name]
    assert sem_pairs["semantic_blas"] == sem_pairs["semantic_expr_salted"], (
        "the two engines must find the identical pair count"
    )
    assert sem_pairs["semantic_blas_nprobe2"] >= sem_pairs["semantic_blas"]
    assert sem_pairs["semantic_capped"] == 0  # every bucket above the cap

    # --- ivf_large_k: multi-probe assignment at k >= 4096 centroids —
    # the regime where the literal-expression strategy is documented
    # as unusable (its expression tree grows as k × dim). The join
    # strategy (centroids as broadcast DATA) keeps the plan O(1); the
    # blas strategy (broadcast NumPy matrix + blocked matmul) is the
    # throughput path. Identical assignments asserted.
    from sparvi_core_spark.operators.similarity import ivf_assign_probes

    ivf_dim, ivf_k, ivf_n = 16, 4096, 20000
    big_cents = spark.range(ivf_k).select(
        F.col("id").cast("int").alias("bucket"),
        F.array(
            *[
                F.pmod(F.xxhash64("id", F.lit(i)), F.lit(1000)) / F.lit(100.0)
                for i in range(ivf_dim)
            ]
        ).alias("centroid"),
    ).localCheckpoint()
    big_vecs = spark.range(ivf_n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.pmod(F.xxhash64("id", F.lit(1000 + i)), F.lit(1000))
                / F.lit(100.0)
                for i in range(ivf_dim)
            ]
        ).alias("embedding"),
    ).localCheckpoint()
    ivf_rows = {}
    for strat in ("join", "blas"):
        def run_ivf(strat=strat):
            return ivf_assign_probes(
                big_vecs, big_cents, nprobe=2, strategy=strat
            ).count()

        ivf_rows[strat] = bench(f"ivf_large_k_{strat}_sec", run_ivf)
        entries[f"ivf_large_k_{strat}_rows"] = ivf_rows[strat]
    assert ivf_rows["join"] == ivf_rows["blas"] == 2 * ivf_n

    # --- pq_at_scale: product-quantization encode + ADC search over a
    # 200k x dim-64 corpus — the embedding-compression path. Encode is
    # measured on both engines (identical codes asserted via count +
    # order-insensitive checksum); search runs 100 queries through the
    # no-decode ADC scan. Codebook: m=8 x ks=256 trained briefly on a
    # 4k hash-sample (training quality isn't what this cell measures).
    from sparvi_core_spark.operators.quantization import (
        pq_encode,
        pq_search,
        pq_train,
    )

    pq_dim, pq_n = 64, 200_000
    pq_vecs = spark.range(pq_n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.pmod(F.xxhash64("id", F.lit(5000 + i)), F.lit(1000))
                / F.lit(100.0)
                for i in range(pq_dim)
            ]
        ).alias("embedding"),
    ).localCheckpoint()
    pq_cb, _ = pq_train(
        pq_vecs.filter(F.pmod("vec_id", F.lit(50)) == 0),
        m=8, ks=256, max_iter=2,
    )
    pq_cb = pq_cb.localCheckpoint()

    pq_sums = {}
    for eng in ("expr", "blas"):
        def run_enc(eng=eng):
            out = pq_encode(pq_vecs, pq_cb, engine=eng)
            # bit_xor: order-insensitive fold that cannot overflow
            # (sum of 200k xxhash64 longs trips ANSI overflow)
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(
                    F.xxhash64("id", F.col("codes").cast("string"))
                ).alias("s"),
            ).first()
            pq_sums[eng] = (row["n"], row["s"])

        bench(f"pq_encode_{eng}_sec", run_enc)
    assert pq_sums["expr"] == pq_sums["blas"]
    assert pq_sums["expr"][0] == pq_n
    entries["pq_encode_rows"] = pq_n

    pq_codes = pq_encode(pq_vecs, pq_cb, engine="blas").localCheckpoint()
    pq_queries = pq_vecs.filter(F.pmod("vec_id", F.lit(2000)) == 0)

    def run_search():
        return pq_search(pq_queries, pq_codes, pq_cb, k=10).count()

    entries["pq_search_rows"] = bench("pq_search_sec", run_search)
    assert entries["pq_search_rows"] == 100 * 10

    # --- opq_at_scale: the two distributed kernels OPQ adds on top of
    # PQ, at the same 200k x dim-64 corpus — the map-only rotation
    # matmul (every encode/query pays it) and the eigenvalue-allocation
    # covariance pass (once per train: XᵀX partials, dim² per batch).
    from sparvi_core_spark.operators.quantization import (
        _eigen_allocation_rotation,
        rotate_vectors,
    )

    import numpy as np

    R_stress = np.linalg.qr(
        np.random.default_rng(11).normal(size=(pq_dim, pq_dim))
    )[0].tolist()

    def run_rotate():
        n = rotate_vectors(pq_vecs, R_stress).count()
        assert n == pq_n

    bench("opq_rotate_sec", run_rotate)
    entries["opq_rotate_rows"] = pq_n

    def run_cov():
        R0 = _eigen_allocation_rotation(pq_vecs, pq_dim, 8, "vec_id", "embedding")
        R0 = np.asarray(R0)
        assert np.allclose(R0.T @ R0, np.eye(pq_dim), atol=1e-8)

    bench("opq_eigen_init_sec", run_cov)

    # --- warc_ingest: parse throughput of the zero-dependency WARC
    # reader on self-built segments (8 files x 2k records x ~1.5 KB
    # HTML, per-record gzip members — the CommonCrawl layout). Records
    # MB/s of COMPRESSED input through binaryFile + the Arrow parser.
    import tempfile

    from sparvi_core_spark.sources.warc import (
        make_warc_bytes,
        make_warc_record,
        read_warc,
    )

    warc_dir = tempfile.mkdtemp(prefix="stress_warc_")
    body = ("<html><body>" + "<p>corpus ingest text</p>" * 50
            + "</body></html>").encode()
    total_bytes = 0
    for seg in range(8):
        recs = [
            make_warc_record(
                f"http://h{i % 97}.example.com/{seg}/{i}",
                body,
                record_id=f"<urn:uuid:{seg}-{i}>",
            )
            for i in range(2000)
        ]
        payload = make_warc_bytes(recs, gzip_members=True)
        total_bytes += len(payload)
        with open(os.path.join(warc_dir, f"seg{seg}.warc.gz"), "wb") as fh:
            fh.write(payload)

    def run_warc():
        n = read_warc(spark, warc_dir, warc_types=["response"]).count()
        assert n == 8 * 2000

    bench("warc_parse_sec", run_warc)
    entries["warc_compressed_mb"] = round(total_bytes / 1e6, 1)

    # --- bloom: membership at the scale where joins start to hurt ----
    # 4M reference keys → one bit-array build, then a map-only probe of
    # 4M mixed keys; the exact anti-join on the same frames is the
    # honest comparator (what bloom_novel replaces at 100 TB).
    from sparvi_core_spark.operators.membership import (
        bloom_build,
        bloom_novel,
    )

    ref_keys = spark.range(0, 4_000_000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("key")
    )
    probe_keys = spark.range(2_000_000, 6_000_000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("key")
    )
    bloom_model = {}

    def run_bloom_build():
        bloom_model["m"] = bloom_build(
            ref_keys, "key", expected_n=4_000_000, fpp=0.01
        )

    bench("bloom_build_sec", run_bloom_build)
    entries["bloom_bits_mb"] = round(bloom_model["m"].m / 8e6, 1)

    def run_bloom_probe():
        n = bloom_novel(probe_keys, bloom_model["m"], "key").count()
        # 2M genuinely new minus ~fpp over-drop; no false negatives
        assert 1_900_000 < n <= 2_000_000
        entries["bloom_novel_rows"] = n

    bench("bloom_probe_sec", run_bloom_probe)

    def run_exact_anti():
        n = probe_keys.join(ref_keys, "key", "left_anti").count()
        assert n == 2_000_000

    bench("exact_anti_join_sec", run_exact_anti)

    # --- stored_index_lifecycle: the ANN serving path ON DISK, both
    # layouts, on the same 200k x dim-64 corpus as the pq cells:
    # write (once) / append (daily, O(batch)) / search (always) for
    # the float IVF index, then write / search (ADC + exact re-rank)
    # for the IVF-PQ coded index — plus the measured bytes-at-rest
    # ratio between the two layouts (the reason codes are the
    # billion-scale default). Model training is brief and sampled;
    # it is NOT what these cells measure.
    import shutil

    from sparvi_core_spark.operators.quantization import ivf_residuals
    from sparvi_core_spark.operators.similarity import kmeans_fit
    from sparvi_core_spark.sources.ann_index import (
        append_ivf_index,
        search_ivf_index,
        write_ivf_index,
    )
    from sparvi_core_spark.sources.ivfpq_index import (
        search_ivfpq_index,
        write_ivfpq_index,
    )

    idx_root = tempfile.mkdtemp(prefix="stress_idx_")
    fidx, cidx = f"{idx_root}/floats", f"{idx_root}/codes"
    idx_corpus = pq_vecs.filter(F.col("vec_id") < 190_000).localCheckpoint()
    idx_batch = pq_vecs.filter(F.col("vec_id") >= 190_000).localCheckpoint()
    idx_cents, _ = kmeans_fit(
        idx_corpus.filter(F.pmod("vec_id", F.lit(20)) == 0),
        k=64, max_iter=3, seed=3,
    )
    idx_cents = idx_cents.localCheckpoint()
    idx_queries = pq_vecs.filter(
        F.pmod("vec_id", F.lit(2000)) == 0
    ).localCheckpoint()  # 100 queries

    def _du_buckets(root):
        """Bytes at rest in the bucket=*/ data dirs only (manifest,
        centroids, codebook, float side-stores excluded)."""
        total = 0
        for dirpath, _, files in os.walk(root):
            if (
                "bucket=" not in dirpath
                or "_floats" in dirpath
                or "_vectors" in dirpath
            ):
                continue
            for f in files:
                if not f.startswith((".", "_")):
                    total += os.path.getsize(os.path.join(dirpath, f))
        return total

    def run_idx_write():
        man = write_ivf_index(idx_corpus, idx_cents, fidx, files_per_bucket=2)
        assert man["n_vectors"] == 190_000

    bench("idx_float_write_sec", run_idx_write)
    entries["idx_float_mb"] = round(_du_buckets(fidx) / 1e6, 1)

    def run_idx_append():
        man = append_ivf_index(idx_batch, fidx)
        assert man["n_vectors"] == 200_000

    bench("idx_float_append_sec", run_idx_append)

    def run_idx_search():
        n = search_ivf_index(
            spark, fidx, idx_queries, k=10, nprobe=2, engine="blas"
        ).count()
        assert n == 100 * 10

    bench("idx_float_search_sec", run_idx_search)

    idx_cb, _ = pq_train(
        ivf_residuals(
            idx_corpus.filter(F.pmod("vec_id", F.lit(50)) == 0), idx_cents
        ),
        m=8, ks=256, id_col="id", vec_col="residual", max_iter=2,
    )
    idx_cb = idx_cb.localCheckpoint()

    def run_pq_write():
        man = write_ivfpq_index(
            idx_corpus, idx_cents, idx_cb, cidx,
            files_per_bucket=2, store_floats=True,
        )
        assert man["n_vectors"] == 190_000

    bench("idx_pq_write_sec", run_pq_write)
    entries["idx_pq_mb"] = round(_du_buckets(cidx) / 1e6, 1)
    entries["idx_bytes_ratio"] = round(
        entries["idx_float_mb"] / max(entries["idx_pq_mb"], 0.1), 1
    )

    def run_pq_search():
        n = search_ivfpq_index(
            spark, cidx, idx_queries, k=10, nprobe=2
        ).count()
        assert n == 100 * 10

    bench("idx_pq_search_sec", run_pq_search)

    def run_pq_rerank():
        n = search_ivfpq_index(
            spark, cidx, idx_queries, k=10, nprobe=2, rerank=30
        ).count()
        assert n == 100 * 10

    bench("idx_pq_rerank_sec", run_pq_rerank)

    # binary index ON DISK: the ladder's cheapest stored tier (r8) —
    # write (sketch + prefix-partitioned codes + bucketed float
    # side-store), append, probed search (radius-2 file pruning),
    # flat search (exact), and pruned exact rerank; bytes-at-rest vs
    # the float layout recorded
    from sparvi_core_spark.sources.binary_index import (
        append_binary_index,
        search_binary_index,
        write_binary_index,
    )

    bidx = f"{idx_root}/binary"

    def run_bin_write():
        man = write_binary_index(
            idx_corpus, bidx, bits=256, seed=7, prefix_bits=12,
            engine="blas", files_per_bucket=1,
        )
        assert man["n_vectors"] == 190_000

    bench("idx_bin_write_sec", run_bin_write)
    entries["idx_bin_mb"] = round(_du_buckets(bidx) / 1e6, 1)
    entries["idx_bin_vs_float_ratio"] = round(
        entries["idx_float_mb"] / max(entries["idx_bin_mb"], 0.1), 1
    )

    def run_bin_append():
        man = append_binary_index(spark, bidx, idx_batch, engine="blas")
        assert man["n_vectors"] == 200_000

    bench("idx_bin_append_sec", run_bin_append)

    def run_bin_search_probed():
        n = search_binary_index(
            spark, bidx, idx_queries, k=10, radius=2, engine="blas"
        ).count()
        assert n == 100 * 10

    bench("idx_bin_search_probed_sec", run_bin_search_probed)

    def run_bin_search_flat():
        n = search_binary_index(
            spark, bidx, idx_queries, k=10, radius=None, engine="blas"
        ).count()
        assert n == 100 * 10

    bench("idx_bin_search_flat_sec", run_bin_search_flat)

    def run_bin_rerank():
        n = search_binary_index(
            spark, bidx, idx_queries, k=10, radius=2, rerank=50,
            engine="blas",
        ).count()
        assert n == 100 * 10

    bench("idx_bin_rerank_sec", run_bin_rerank)
    shutil.rmtree(idx_root, ignore_errors=True)

    # binary-sketch tier on the same 190k × dim-64 corpus: one
    # Arrow-matmul binarize pass, then Hamming pre-rank + exact
    # re-rank for the same 100 queries (32 B/vector at 256 bits —
    # the broadcast-able representation the float tiers can't be)
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk_rerank,
    )

    sk_corpus = None

    def run_sketch_build():
        nonlocal sk_corpus
        sk_corpus = binarize_embeddings(
            idx_corpus, bits=256, seed=7, engine="blas"
        ).localCheckpoint()
        assert sk_corpus.count() == 190_000

    bench("sketch_build_sec", run_sketch_build)
    sk_queries = binarize_embeddings(
        idx_queries, bits=256, seed=7, engine="blas"
    ).localCheckpoint()

    def run_sketch_search():
        n = hamming_topk_rerank(
            sk_corpus, sk_queries, k=10, rerank=50
        ).count()
        assert n == 100 * 10

    bench("sketch_search_sec", run_sketch_search)

    # near-pair mining under a degenerate bucket: 4k sketches share
    # one word value (word-1 bucket fans 4k² candidates uncapped) but
    # contain NO true near pairs through it — the planted truth is
    # 100k even/odd pairs at distance 0, which share ALL words and so
    # survive any single-bucket drop. The cap must change the cost,
    # never the answer.
    from sparvi_core_spark.operators.binary_sketch import (
        hamming_near_pairs,
    )

    pair_base = F.col("id") - F.col("id") % 2
    sk_pairs = (
        spark.range(200_000)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                F.when(F.col("id") < 4000, F.lit(0).cast("long")).otherwise(
                    F.xxhash64(pair_base, F.lit("w0"))
                ),
                F.xxhash64(pair_base, F.lit("w1")),
                F.xxhash64(pair_base, F.lit("w2")),
                F.xxhash64(pair_base, F.lit("w3")),
            ).alias("sketch"),
        )
        .localCheckpoint()
    )

    def run_sketch_pairs_capped():
        n = hamming_near_pairs(
            sk_pairs, max_dist=1, max_bucket=100
        ).count()
        assert n == 100_000, n

    bench("sketch_pairs_capped_sec", run_sketch_pairs_capped)

    def run_sketch_pairs_uncapped():
        n = hamming_near_pairs(sk_pairs, max_dist=1).count()
        assert n == 100_000, n

    bench("sketch_pairs_uncapped_sec", run_sketch_pairs_uncapped)

    # --- minhash dedup index ON DISK (r8): write a 150k-doc corpus's
    # band + signature stores once, then dedup a 1k recrawl batch
    # against it two ways — the stored-index probe (reads only the
    # batch's band buckets) vs recomputing signatures for the WHOLE
    # corpus + batch (what every crawl would pay without the index).
    # Same planted truth both ways: 500 batch docs are copies of
    # stored docs; both paths must find all 500.
    from sparvi_core_spark.sources.minhash_index import (
        append_minhash_index,
        probe_minhash_index,
        write_minhash_index,
    )

    mh_root = tempfile.mkdtemp(prefix="stress_mhidx_")
    mh_path = f"{mh_root}/idx"
    n_mh = 150_000
    mh_words = [
        F.concat(
            F.lit("w"),
            F.substring(
                F.md5(F.concat(F.lit(f"mh{k}|"), F.col("id").cast("string"))),
                1, 6,
            ),
        )
        for k in range(20)
    ]
    mh_corpus = spark.range(n_mh).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *mh_words).alias("text")
    ).localCheckpoint()
    # batch: 500 exact copies of stored docs (ids shifted) + 500 fresh
    mh_batch = (
        mh_corpus.filter(F.col("doc_id") < 500)
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
        .unionByName(
            spark.range(500).select(
                (F.col("id") + 6_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit("f"),
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"fresh{k}|"),
                                        F.col("id").cast("string"),
                                    )
                                ),
                                1, 6,
                            ),
                        )
                        for k in range(20)
                    ],
                ).alias("text"),
            )
        )
        .localCheckpoint()
    )

    def run_mh_write():
        man = write_minhash_index(
            mh_corpus, mh_path, num_hashes=16, threshold=0.8, n_buckets=256
        )
        assert man["n_docs"] == n_mh

    bench("mhidx_write_sec", run_mh_write)

    def run_mh_append():
        man = append_minhash_index(
            spark, mh_path, mh_batch.filter(F.col("doc_id") >= 6_000_000)
        )
        assert man["n_docs"] == n_mh + 500

    bench("mhidx_append_sec", run_mh_append)

    def run_mh_probe():
        n = (
            probe_minhash_index(spark, mh_path, mh_batch, threshold=0.9)
            .filter(F.col("batch_id") >= 5_000_000)
            .filter(F.col("batch_id") < 6_000_000)
            .count()
        )
        assert n >= 500, n  # every planted copy found

    bench("mhidx_probe_sec", run_mh_probe)

    def run_mh_recompute_baseline():
        # the no-index alternative: sign corpus + batch from scratch,
        # band, join — the cost a stored index amortizes away
        sig_all = minhash_signatures(
            mh_corpus.unionByName(mh_batch), num_hashes=16
        )
        cand = lsh_candidate_pairs(
            sig_all, num_hashes=16, bands=4, max_bucket=1 << 40
        )
        n = cand.filter(
            (F.col("id_a") < 5_000_000) & (F.col("id_b") >= 5_000_000)
            & (F.col("id_b") < 6_000_000)
        ).count()
        assert n >= 500, n

    bench("mhidx_recompute_baseline_sec", run_mh_recompute_baseline)
    shutil.rmtree(mh_root, ignore_errors=True)

    # --- AllPairs lossless prefix-filter join (r8): the unique corpus
    # plus ONE planted near-dup per unique doc (a one-word tail
    # append: jaccard 12/13 ≈ 0.92), so the planted truth is exactly
    # n_uniq pairs and both paths do real verification work. The
    # mass-duplicate pile is deliberately excluded — there the TRUE
    # answer is quadratic (every copy pairs with every copy), which
    # measures output size, not the filter.
    from sparvi_core_spark.operators.dedup import (
        allpairs_candidates,
        allpairs_jaccard_pairs,
    )

    near = uniq.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ztail")).alias("text"),
    )
    ap_corpus = uniq.unionByName(near).localCheckpoint()

    def run_allpairs():
        n = allpairs_jaccard_pairs(ap_corpus, threshold=0.8).count()
        assert n == n_uniq, n
        entries["allpairs_pairs"] = n

    bench("allpairs_sec", run_allpairs)
    entries["allpairs_candidates"] = allpairs_candidates(
        ap_corpus, threshold=0.8
    ).count()

    def run_allpairs_brute():
        n = ngram_jaccard_pairs(
            ap_corpus, max_doc_freq=None, threshold=0.8
        ).count()
        assert n == n_uniq, n

    bench("allpairs_brute_sec", run_allpairs_brute)

    print(
        json.dumps(
            {
                "metric": "sparvi_core_spark skew stress suite",
                "unit": "sec",
                "entries": entries,
                "corpus": {"dup_docs": n_dup, "uniq_docs": n_uniq, "events": n_ev},
            }
        )
    )


if __name__ == "__main__":
    main()
