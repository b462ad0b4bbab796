"""Product quantization: train / encode / decode / ADC search.

Correctness strategy: ``pq_train`` is an iterative fixpoint (no SQL
oracle — the ``kmeans_fit`` class), pinned by planted-structure
recovery; ``pq_encode`` has a DuckDB twin (test_oracle_parity) plus
expr==blas engine parity here; ``pq_search`` is pinned through the
ADC identity — its distances must EQUAL exact L2 against the decoded
reconstruction, so search correctness reduces to encode correctness
plus a NumPy-twinned ranking check.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.quantization import (
    pq_decode,
    pq_encode,
    pq_search,
    pq_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _planted(spark, n_per=20, protos_a=3, protos_b=3, noise=0.05, dim=8):
    """Vectors whose two dim/2 halves are drawn from separable
    prototype sets: PQ with m=2 must recover the prototype grid."""
    rng = np.random.default_rng(7)
    half = dim // 2
    pa = rng.normal(size=(protos_a, half)) * 10
    pb = rng.normal(size=(protos_b, half)) * 10
    rows = []
    vid = 0
    for i in range(protos_a):
        for j in range(protos_b):
            for _ in range(n_per):
                v = np.concatenate(
                    [pa[i] + rng.normal(size=half) * noise,
                     pb[j] + rng.normal(size=half) * noise]
                )
                rows.append((vid, i, j, [float(x) for x in v]))
                vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, pa int, pb int, embedding array<double>"
    )


def test_pq_train_recovers_planted_structure(spark):
    """On a corpus whose subspace halves come from 3x3 separable
    prototypes, a ks=3 / m=2 codebook converges and the codes form a
    perfect relabeling of the planted (pa, pb) grid."""
    df = _planted(spark)
    cb, info = pq_train(df, m=2, ks=3, max_iter=20, seed=1)
    assert info["converged"] and info["m"] == 2 and info["ks"] == 3
    assert info["dim"] == 8
    codes = pq_encode(df, cb).join(
        df.select(F.col("vec_id").alias("id"), "pa", "pb"), "id"
    )
    got = codes.select(
        "pa", "pb", F.element_at("codes", 1).alias("c0"),
        F.element_at("codes", 2).alias("c1"),
    ).distinct().collect()
    # every planted cell maps to exactly one (c0, c1) pair, and the
    # mapping is a bijection per axis (codes are a relabeling)
    assert len(got) == 9
    a_map = {r["pa"]: r["c0"] for r in got}
    b_map = {r["pb"]: r["c1"] for r in got}
    assert all(r["c0"] == a_map[r["pa"]] for r in got)
    assert all(r["c1"] == b_map[r["pb"]] for r in got)
    assert len(set(a_map.values())) == 3 and len(set(b_map.values())) == 3


def test_pq_encode_engines_parity(spark):
    """expr and blas engines emit identical codes on the embeddings
    fixture (the +-1-ulp rounding boundary is theoretical; the fixture
    must not exercise it)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, _ = pq_train(emb, m=4, ks=8, max_iter=5, seed=3)
    e1 = {r["id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    e2 = {
        r["id"]: list(r["codes"])
        for r in pq_encode(emb, cb, engine="blas").collect()
    }
    assert e1 == e2 and len(e1) > 0


def test_pq_decode_exact_on_centroid_vectors(spark):
    """Vectors that ARE concatenations of codebook centroids encode to
    those codes and decode back bit-exactly (zero quantization error
    on the codebook's own span)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, _ = pq_train(emb, m=4, ks=4, max_iter=5, seed=5)
    cents = {(r["subspace"], r["code"]): r["centroid"] for r in cb.collect()}
    synth = []
    for i, picks in enumerate([(0, 1, 2, 3), (3, 2, 1, 0), (1, 1, 1, 1)]):
        v = [x for s, c in enumerate(picks) for x in cents[(s, c)]]
        synth.append((i, picks, v))
    df = spark.createDataFrame(
        [(i, v) for i, _, v in synth], "vec_id long, embedding array<double>"
    )
    codes = {r["id"]: list(r["codes"]) for r in pq_encode(df, cb).collect()}
    for i, picks, _ in synth:
        assert codes[i] == list(picks)
    dec = {
        r["id"]: list(r["embedding"])
        for r in pq_decode(
            pq_encode(df, cb), cb
        ).collect()
    }
    for i, _, v in synth:
        assert dec[i] == pytest.approx(v, abs=0)


def test_adc_identity_and_search_matches_reconstruction_ranking(spark):
    """The ADC invariant: every pq_search l2 distance equals the exact
    L2 distance from the query to the DECODED neighbor (rounded to 4,
    like the search contract) — and therefore the full top-k ranking
    equals a NumPy brute-force ranking over the reconstructions with
    the same (distance asc, id asc) tie contract."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, _ = pq_train(emb, m=8, ks=8, max_iter=5, seed=11)
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 5)
    got = pq_search(queries, codes, cb, k=7).collect()

    dec = {
        r["id"]: np.array(r["embedding"])
        for r in pq_decode(codes, cb).collect()
    }
    qv = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in queries.collect()
    }
    # identity: reported distance == round(l2(q, decode(x)), 4)
    for r in got:
        exact = np.linalg.norm(qv[r["query_id"]] - dec[r["neighbor_id"]])
        assert r["distance"] == pytest.approx(round(exact, 4), abs=1e-9)
    # ranking: == NumPy brute force over reconstructions
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["distance"])
        )
    ids = sorted(dec)
    for qid, rows in by_q.items():
        d = np.array([round(np.linalg.norm(qv[qid] - dec[i]), 4) for i in ids])
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))[:7]
        expect = [(rk + 1, ids[j], d[j]) for rk, j in enumerate(order)]
        assert sorted(rows) == pytest.approx(expect)


def test_pq_search_ip_metric(spark):
    """Inner-product ADC: scores equal q . decode(x) (rounded), ranked
    descending with id-asc ties."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, _ = pq_train(emb, m=4, ks=8, max_iter=5, seed=13)
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 3)
    got = pq_search(queries, codes, cb, k=5, metric="ip").collect()
    dec = {
        r["id"]: np.array(r["embedding"])
        for r in pq_decode(codes, cb).collect()
    }
    qv = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in queries.collect()
    }
    for r in got:
        exact = float(qv[r["query_id"]] @ dec[r["neighbor_id"]])
        assert r["score"] == pytest.approx(round(exact, 4), abs=1e-9)
    for qid in qv:
        rows = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert len(rows) == 5
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_pq_recall_on_clustered_corpus(spark):
    """End-to-end quality tripwire (the ANN recall-curve convention):
    on a clustered corpus, the exact float-vector top-10 lands inside
    the ADC top-30 candidates (R10@30 — the standard PQ recall form:
    within-cluster spacing below the quantization resolution ties
    ADC distances, so exact-rank recall@10 would measure tie order,
    not search quality). Measured 1.00 at these settings; the 0.9
    floor pins a regression, and deterministic data and seeds make it
    a tripwire, not a distribution."""
    df = _planted(spark, n_per=25, noise=0.5)  # 225 vectors, 9 clusters
    cb, _ = pq_train(df, m=2, ks=16, max_iter=10, seed=17)
    codes = pq_encode(df, cb)
    queries = df.filter(F.col("vec_id") % 45 == 0)  # 5 queries
    got = pq_search(queries, codes, cb, k=31).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    hits = total = 0
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(by_q) == 5
    for qid, found in by_q.items():
        found = found - {qid}
        d = sorted(
            (np.linalg.norm(vecs[qid] - v), i)
            for i, v in vecs.items()
            if i != qid
        )[:10]
        truth = {i for _, i in d}
        hits += len(truth & found)
        total += len(truth)
    assert total == 50 and hits / total >= 0.9


def test_pq_compression_accounting(spark):
    """The point of PQ: m code bytes replace dim floats. ks<=256 is
    enforced (one byte per code), and the codes frame carries exactly
    m small ints per row."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, info = pq_train(emb, m=8, ks=4, max_iter=3)
    codes = pq_encode(emb, cb)
    row = codes.select(
        F.size("codes").alias("m"), F.array_max("codes").alias("mx")
    ).agg(F.max("m").alias("m"), F.max("mx").alias("mx")).first()
    assert row["m"] == 8 and row["mx"] <= 3
    assert info["dim"] == 64  # 64 floats -> 8 bytes: 32x at float32


def test_pq_validation_errors(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7)
    with pytest.raises(ValueError, match="ks"):
        pq_train(emb, m=4, ks=300)
    with pytest.raises(ValueError, match="m must be"):
        pq_train(emb, m=0)
    cb, _ = pq_train(emb, m=4, ks=2, max_iter=1)
    with pytest.raises(ValueError, match="engine"):
        pq_encode(emb, cb, engine="gpu")
    with pytest.raises(ValueError, match="metric"):
        pq_search(emb.limit(1), pq_encode(emb, cb), cb, metric="hamming")
    with pytest.raises(ValueError, match="k must be"):
        pq_search(emb.limit(1), pq_encode(emb, cb), cb, k=0)
    with pytest.raises(ValueError, match="query side is empty"):
        pq_search(emb.filter("vec_id < 0"), pq_encode(emb, cb), cb)


def test_pq_null_vectors_dropped(spark):
    """NULL vectors get no codes (encode) and NULL code rows are
    skipped in search — the module-wide null contract."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    cb, _ = pq_train(emb, m=4, ks=4, max_iter=2)
    withnull = emb.unionByName(
        emb.sparkSession.createDataFrame(
            [(9999, 0, None)], "vec_id long, label int, embedding array<float>"
        ).select("vec_id", "label", "embedding")
    )
    codes = pq_encode(withnull, cb)
    assert codes.filter(F.col("id") == 9999).count() == 0
    assert codes.count() == 20


# --- IVF-PQ (IVFADC) ---------------------------------------------------


def test_ivf_residuals_exact(spark):
    """residual == v - centroid(assigned bucket), bit-exact against a
    driver-side recomputation."""
    from sparvi_core_spark.operators.quantization import ivf_residuals
    from sparvi_core_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents, _ = kmeans_fit(emb, k=4, seed=3)
    cents = cents.localCheckpoint()
    cmap = {r["bucket"]: np.array(r["centroid"]) for r in cents.collect()}
    res = {
        r["id"]: (r["bucket"], np.array(r["residual"]))
        for r in ivf_residuals(emb, cents).collect()
    }
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in emb.collect()
    }
    assert set(res) == set(vecs)
    for vid, (b, rv) in res.items():
        np.testing.assert_allclose(rv, vecs[vid] - cmap[b], atol=0)


def test_ivfpq_identity_and_exhaustive_ranking(spark):
    """The IVFADC identity: every reported distance equals
    round(l2(q, centroid(bucket) + decode(codes)), 4); and with
    nprobe = #cells (exhaustive probing) the top-k ranking equals a
    NumPy brute force over the reconstructions."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        ivfpq_encode,
        ivfpq_search,
    )
    from sparvi_core_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents, _ = kmeans_fit(emb, k=4, seed=5)
    cents = cents.localCheckpoint()
    res = ivf_residuals(emb, cents)
    cb, _ = pq_train(
        res, m=8, ks=8, id_col="id", vec_col="residual", max_iter=4
    )
    coded = ivfpq_encode(emb, cents, cb).localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 4)
    got = ivfpq_search(queries, coded, cents, cb, k=6, nprobe=4).collect()

    cmap = {r["bucket"]: np.array(r["centroid"]) for r in cents.collect()}
    dec = {
        r["id"]: np.array(r["embedding"])
        for r in pq_decode(coded, cb).collect()
    }
    bmap = {r["id"]: r["bucket"] for r in coded.collect()}
    recon = {i: cmap[bmap[i]] + dec[i] for i in dec}
    qv = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in queries.collect()
    }
    for r in got:
        exact = np.linalg.norm(qv[r["query_id"]] - recon[r["neighbor_id"]])
        assert r["distance"] == pytest.approx(round(exact, 4), abs=1e-9)
    ids = sorted(recon)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["distance"])
        )
    assert set(by_q) == set(qv)
    for qid, rows in by_q.items():
        d = np.array(
            [round(np.linalg.norm(qv[qid] - recon[i]), 4) for i in ids]
        )
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))[:6]
        expect = [(rk + 1, ids[j], d[j]) for rk, j in enumerate(order)]
        assert sorted(rows) == pytest.approx(expect)


@pytest.mark.slow
def test_ivfpq_recall_on_clustered_corpus(spark):
    """End-to-end IVFADC quality tripwire: clustered corpus, k-means
    coarse cells, residual codebook, nprobe=2 — the exact float top-10
    lands inside the ADC top-30 (R10@30 >= 0.9; deterministic seeds)."""
    from sparvi_core_spark.operators.quantization import (
        ivf_residuals,
        ivfpq_encode,
        ivfpq_search,
    )
    from sparvi_core_spark.operators.similarity import kmeans_fit

    df = _planted(spark, n_per=25, noise=0.5)  # 225 vectors, 9 clusters
    cents, _ = kmeans_fit(df, k=9, max_iter=15, seed=23)
    cents = cents.localCheckpoint()
    res = ivf_residuals(df, cents)
    cb, _ = pq_train(
        res, m=2, ks=16, id_col="id", vec_col="residual", max_iter=10
    )
    coded = ivfpq_encode(df, cents, cb).localCheckpoint()
    queries = df.filter(F.col("vec_id") % 45 == 0)  # 5 queries
    got = ivfpq_search(queries, coded, cents, cb, k=31, nprobe=2).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(by_q) == 5
    hits = total = 0
    for qid, found in by_q.items():
        found = found - {qid}
        d = sorted(
            (np.linalg.norm(vecs[qid] - v), i)
            for i, v in vecs.items()
            if i != qid
        )[:10]
        truth = {i for _, i in d}
        hits += len(truth & found)
        total += len(truth)
    assert total == 50 and hits / total >= 0.9


# --- Scalar (int8) quantization ----------------------------------------


def test_sq_error_bound_proven(spark):
    """The load-bearing invariant: per-dimension reconstruction error
    <= (hi - lo) / 510 for EVERY value — by construction, not tuning.
    Endpoints reconstruct exactly; constant dimensions decode to lo."""
    from sparvi_core_spark.operators.quantization import (
        sq_decode,
        sq_encode,
        sq_train,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bounds = sq_train(emb).localCheckpoint()
    b = {r["pos"]: (r["lo"], r["hi"]) for r in bounds.collect()}
    dec = {
        r["id"]: r["embedding"]
        for r in sq_decode(sq_encode(emb, bounds), bounds).collect()
    }
    orig = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    assert set(dec) == set(orig)
    worst = 0.0
    for vid, xs in orig.items():
        for i, x in enumerate(xs):
            lo, hi = b[i]
            tol = (hi - lo) / 510 + 1e-12
            err = abs(dec[vid][i] - min(max(x, lo), hi))
            worst = max(worst, err - (hi - lo) / 510)
            assert err <= tol, (vid, i, err, tol)
    assert worst <= 1e-12

    # endpoints: a vector of exact per-dim lo (hi) codes to 0 (255)
    # and reconstructs exactly
    dim = len(b)
    ends = spark.createDataFrame(
        [
            (0, [b[i][0] for i in range(dim)]),
            (1, [b[i][1] for i in range(dim)]),
        ],
        "vec_id long, embedding array<double>",
    )
    codes = {r["id"]: list(r["codes"]) for r in sq_encode(ends, bounds).collect()}
    assert codes[0] == [0] * dim and codes[1] == [255] * dim
    rec = {
        r["id"]: r["embedding"]
        for r in sq_decode(sq_encode(ends, bounds), bounds).collect()
    }
    for i in range(dim):
        assert rec[0][i] == pytest.approx(b[i][0], abs=1e-12)
        assert rec[1][i] == pytest.approx(b[i][1], abs=1e-12)


def test_sq_constant_dimension_and_nulls(spark):
    from sparvi_core_spark.operators.quantization import (
        sq_decode,
        sq_encode,
        sq_train,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    bounds = sq_train(df).localCheckpoint()
    codes = {r["id"]: list(r["codes"]) for r in sq_encode(df, bounds).collect()}
    assert set(codes) == {0, 1}  # NULL vector dropped
    assert codes[0][0] == 0 and codes[1][0] == 0  # constant dim -> 0
    dec = {
        r["id"]: r["embedding"]
        for r in sq_decode(sq_encode(df, bounds), bounds).collect()
    }
    assert dec[0][0] == 1.0 and dec[1][0] == 1.0  # decodes to lo


def test_sq_search_recall_via_reconstruction(spark):
    """int8 is the near-exact tier: cosine top-10 over the
    reconstructions recalls >= 0.9 of the float top-10 on the real
    fixture (deterministic — a tripwire)."""
    from sparvi_core_spark.operators.quantization import (
        sq_decode,
        sq_encode,
        sq_train,
    )
    from sparvi_core_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bounds = sq_train(emb).localCheckpoint()
    recon = sq_decode(sq_encode(emb, bounds), bounds).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    rq = recon.join(
        queries.select("vec_id"), "vec_id"
    )
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(recon, rq, k=10).collect()
    }
    assert len(exact) > 0
    assert len(exact & approx) / len(exact) >= 0.9
