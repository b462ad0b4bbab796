"""End-to-end embedding/similarity pipeline: the ANN surface composed
the way a retrieval + semantic-dedup run uses it.

    documents                 (text corpus)
      → RAG chunking          (map-only overlapping windows)
      → embeddings            (precomputed table here; in production a
                               vectorized encoder over mapInPandas —
                               see operators.multimodal.extract_features
                               for the batch shape)
      → IVF build             (k-means: broadcast assign + rebuild)
      → ANN search            (query-side multi-probe, cell-pruned)
      → recall audit          (multi-probe vs brute force @ k)
      → semantic dedup        (bucket-local pairs, nprobe=2 boundary
                               recovery, best survivor)
      → SRP fallback          (index-free sign-LSH near-dup pass with
                               bit-flip probing — no build step)
      → IVF-PQ                (residual product quantization: m code
                               bytes per vector replace the floats;
                               ADC search over probed cells only, with
                               the same recall audit)
      → OPQ                   (learned rotation: eigenvalue-allocation
                               init + refinement; MSE trace)
      → ops health            (embedding column audit + per-cell index
                               skew/drift report)

Run: python examples/embedding_pipeline.py [sf_dir]  (default sf0.01)
Prints one JSON report.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from sparvi_core_spark import get_spark
    from sparvi_core_spark.operators.packing import chunk_documents
    from sparvi_core_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        embedding_near_duplicates,
        kmeans_fit,
        random_hyperplane_probes,
        semantic_dedup,
    )

    spark = get_spark(
        app_name="embedding-pipeline-example",
        master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    report["docs"] = docs.count()
    report["vectors"] = emb.count()

    # 1. RAG chunking: overlapping token windows, zero shuffle — the
    #    front end that would feed an encoder
    chunks = chunk_documents(docs, chunk_tokens=64, overlap_tokens=8)
    report["chunks"] = chunks.count()

    # 2. IVF build: k-means over the embedding column (here the
    #    pre-embedded table stands in for the encoder output)
    k = 16
    centroids, kinfo = kmeans_fit(emb, k=k, max_iter=8)
    report["kmeans"] = {
        "k": k,
        "iterations": kinfo["iterations"],
        "converged": kinfo["converged"],
    }

    # 3. ANN search with query-side multi-probe, and 4. a recall audit
    #    against the brute-force truth on the same queries — swept over
    #    nprobe to show the knob: recall climbs toward 1.0 as more
    #    cells are probed, cost stays ~nprobe/k of brute force. (These
    #    synthetic embeddings are nearly unclustered — the hardest case
    #    for IVF — so low-nprobe recall here is the honest floor, not
    #    the typical value on real, clusterable embeddings.)
    queries = emb.filter("vec_id % 97 = 0")
    report["queries"] = queries.count()
    exact = cosine_topk(emb, queries, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = {}
    for nprobe in (1, 2, 4, 8):
        approx = cosine_topk_ivf(emb, queries, centroids, k=10, nprobe=nprobe)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        recall[f"nprobe={nprobe}"] = round(len(a & e) / max(len(e), 1), 4)
    report["ann"] = {"pairs_exact": len(e), "recall_at_10": recall}

    # 5. semantic dedup with boundary-pair recovery
    survivors, sem = semantic_dedup(
        emb, threshold=0.98, n_clusters=k, nprobe=2, kmeans_iter=8
    )
    report["semantic_dedup"] = {
        "survivors": survivors.count(),
        "pairs": sem["pairs"].count(),
    }

    # 6. index-free fallback: SRP sign-LSH with bit-flip probing —
    #    near-dup pairs with NO build pass (new corpus, first contact)
    probed = random_hyperplane_probes(emb, planes=12, nprobe=2)
    srp_pairs = (
        embedding_near_duplicates(probed, threshold=0.98, bucket_col="bucket")
        .distinct()
        .count()
    )
    report["srp_near_dups"] = srp_pairs

    # 6b. binary-sketch tier: 256-bit packed SRP sketches (32 B/vector
    #     — broadcast-able corpus-wide), Hamming pre-rank + exact
    #     re-rank; recall audited against the same brute-force truth
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk_rerank,
    )

    sk = binarize_embeddings(emb, bits=256, seed=7).localCheckpoint()
    hq = sk.join(queries.select("vec_id"), "vec_id")
    h = {
        (r["query_id"], r["neighbor_id"])
        for r in hamming_topk_rerank(sk, hq, k=10, rerank=50).collect()
    }
    report["binary_sketch"] = {
        "bits": 256,
        "recall_at_10": round(len(h & e) / max(len(e), 1), 4),
    }

    # 7. IVF-PQ: compress the corpus to m code bytes + a bucket id per
    #    vector (64 floats -> 8 bytes here), then search the CODES —
    #    the float table is never read by the probe. The recall audit
    #    runs against the same brute-force truth as step 4.
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        ivfpq_encode,
        ivfpq_search,
        pq_train,
    )

    res = ivf_residuals(emb, centroids)
    cb, pqinfo = pq_train(
        res, m=8, ks=64, id_col="id", vec_col="residual", max_iter=6
    )
    coded = ivfpq_encode(emb, centroids, cb).localCheckpoint()
    pq_recall = {}
    for nprobe in (2, 4, 8):
        approx = ivfpq_search(queries, coded, centroids, cb, k=10, nprobe=nprobe)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        pq_recall[f"nprobe={nprobe}"] = round(len(a & e) / max(len(e), 1), 4)
    report["ivfpq"] = {
        "m": pqinfo["m"],
        "ks": pqinfo["ks"],
        "code_bytes_per_vector": pqinfo["m"],
        "float_bytes_per_vector": pqinfo["dim"] * 4,
        "recall_at_10": pq_recall,
    }

    # 8. OPQ: learn a rotation so the PQ split stops fighting the
    #    data's correlation structure — report the MSE it buys back
    from sparvi_core_spark.operators.quantization import opq_train

    _, _, oinfo = opq_train(emb, m=8, ks=16, opq_iters=3, pq_max_iter=4)
    report["opq"] = {
        "init": oinfo["init"],
        "mse_trace": oinfo["mse_trace"],
    }

    # 8b. PCA: fit on the corpus, project queries+corpus, and audit
    #     what the cut costs — the width reduction that shrinks every
    #     downstream matmul/codebook when the spectrum allows it
    from sparvi_core_spark.operators.projection import pca_fit, pca_project

    pca = pca_fit(emb, variance=0.8)
    proj = pca_project(emb, pca)
    pq_ids = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(proj, pca_project(queries, pca), k=10).collect()
    }
    report["pca"] = {
        "in_dim": len(pca.mean),
        "out_dim": pca.out_dim,
        "coverage": round(sum(pca.explained_variance_ratio()), 3),
        "recall_at_10_vs_full": round(len(pq_ids & e) / len(e), 3),
    }

    # 9. ops health: the checks that run before every build and after
    #    every append (dirty columns, cell skew, centroid drift)
    from sparvi_core_spark.operators.ann_health import (
        embedding_health,
        ivf_health,
    )

    health = embedding_health(emb).first().asDict()
    cells = ivf_health(emb, centroids).collect()
    fracs = [r["frac"] for r in cells]
    report["health"] = {
        "column": {
            k: health[k] for k in ("n_vectors", "n_null", "n_nan",
                                   "n_zero_norm", "n_dims_distinct")
        },
        "index": {
            "cells": len(cells),
            "empty_cells": sum(1 for r in cells if r["n"] == 0),
            "max_cell_frac": max(fracs),
        },
    }

    # 10. persist: write the corpus as an on-storage IVF index (parquet
    #     hive-partitioned by cell, centroids + manifest inside), then
    #     search THROUGH the files — partition pruning means only the
    #     probed cells' files are listed and read. Same results as the
    #     in-memory path; the report shows the fraction of the corpus
    #     the search never touched.
    import shutil
    import tempfile

    from sparvi_core_spark.sources.ann_index import (
        read_ivf_index,
        search_ivf_index,
        write_ivf_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="ivf-index-")
    new_dir = tempfile.mkdtemp(prefix="ivf-retrain-")
    try:
        man = write_ivf_index(emb, centroids, idx_dir)
        stored = search_ivf_index(spark, idx_dir, queries, k=10, nprobe=2)
        s = {(r["query_id"], r["neighbor_id"]) for r in stored.collect()}
        mem = cosine_topk_ivf(emb, queries, centroids, k=10, nprobe=2)
        m = {(r["query_id"], r["neighbor_id"]) for r in mem.collect()}
        data, _, _ = read_ivf_index(spark, idx_dir)
        report["stored_index"] = {
            "cells": man["k"],
            "files": len(data.inputFiles()),
            "matches_in_memory_ivf": s == m,
            "n_vectors": man["n_vectors"],
        }

        # 11. the index's LIFE: day-2 vectors append without a rebuild
        #     (assignment over just the batch), compaction folds the
        #     small files back — touching only the fragmented cells —
        #     the health gauge watches centroid drift, and when it
        #     creeps, retrain writes a fresh index NEXT TO the serving
        #     one (blue/green; never in place).
        from sparvi_core_spark.sources.ann_index import (
            append_ivf_index,
            compact_ivf_index,
            ivf_index_health,
            retrain_ivf_index,
        )

        day2 = emb.limit(200).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
        man = append_ivf_index(day2, idx_dir)
        comp = compact_ivf_index(spark, idx_dir)
        drift = ivf_index_health(spark, idx_dir).agg(
            F.max("mean_distance").alias("worst_cell_mean_distance")
        ).first()
        man2, fit_info = retrain_ivf_index(
            spark, idx_dir, new_dir, seed=7
        )
        report["index_lifecycle"] = {
            "appended": int(day2.count()),
            "appends": man["appends"],
            "cells_compacted": comp["cells_compacted"],
            "files_before": comp["files_before"],
            "files_after": comp["files_after"],
            "worst_cell_mean_distance": float(
                drift["worst_cell_mean_distance"]
            ),
            "retrained_k": man2["k"],
            "retrain_iterations": fit_info["iterations"],
        }
        # 12. the BILLION-scale layout: the same corpus persisted as
        #     residual PQ CODES partitioned by cell (the float index
        #     stores dim doubles per vector; this stores m small ints —
        #     measured ratio below), searched by ADC over only the
        #     probed cells' code files, with exact re-rank of the few
        #     survivors from the cell-partitioned float side-store.
        import os

        from sparvi_core_spark.sources.ivfpq_index import (
            search_ivfpq_index,
            write_ivfpq_index,
        )

        pq_dir = tempfile.mkdtemp(prefix="ivfpq-index-")

        def _du(root):
            t = 0
            for dp, _, fs in os.walk(root):
                if "bucket=" not in dp or "_floats" in dp:
                    continue
                t += sum(
                    os.path.getsize(os.path.join(dp, f))
                    for f in fs
                    if not f.startswith((".", "_"))
                )
            return t

        try:
            pman = write_ivfpq_index(
                emb, centroids, cb, pq_dir, store_floats=True
            )
            adc = search_ivfpq_index(spark, pq_dir, queries, k=10, nprobe=2)
            rr = search_ivfpq_index(
                spark, pq_dir, queries, k=10, nprobe=2, rerank=30
            )
            a = {(r["query_id"], r["neighbor_id"]) for r in adc.collect()}
            rset = {(r["query_id"], r["neighbor_id"]) for r in rr.collect()}
            report["stored_ivfpq"] = {
                "n_vectors": pman["n_vectors"],
                "m": pman["m"],
                "ks": pman["ks"],
                "code_bytes": _du(pq_dir),
                "float_bytes": _du(idx_dir),
                "bytes_ratio": round(_du(idx_dir) / max(_du(pq_dir), 1), 1),
                "adc_vs_rerank_overlap": len(a & rset),
            }
        finally:
            shutil.rmtree(pq_dir, ignore_errors=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(new_dir, ignore_errors=True)

    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
