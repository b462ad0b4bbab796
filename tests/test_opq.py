"""OPQ: rotation orthogonality, NumPy parity of the distributed
kernels (rotate, cross-covariance), a monotone MSE trace under the
warm-started alternation, the headline claim — OPQ beats plain PQ on
anisotropic data — and search-path consistency."""

from __future__ import annotations

import numpy as np
import pytest

from sparvi_core_spark.operators.quantization import (
    _cross_covariance,
    opq_encode,
    opq_search,
    opq_train,
    pq_decode,
    pq_encode,
    pq_train,
    rotate_vectors,
)


def _df(spark, X, id_offset=0):
    return spark.createDataFrame(
        [(i + id_offset, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def aniso(spark):
    """The canonical OPQ demo: a 4×4 grid of clusters living entirely
    in dims (0, 1), dims (2, 3) pure noise. Plain PQ with m=2, ks=4
    must cram 16 distinct 2-D centers into 4 codes in subspace 1 while
    subspace 2's 4 codes quantize noise; the optimal rotation routes
    one grid axis to each subspace (4 values each → near-exact)."""
    rng = np.random.default_rng(5)
    gx, gy = np.meshgrid(np.arange(4), np.arange(4))
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1) * 6.0
    lab = rng.integers(0, 16, size=400)
    X = np.zeros((400, 4))
    X[:, :2] = centers[lab] + rng.normal(0, 0.2, size=(400, 2))
    X[:, 2:] = rng.normal(0, 0.05, size=(400, 2))
    return _df(spark, X), X, lab


def test_rotate_vectors_numpy_parity_and_nulls(spark):
    import pyspark.sql.types as T

    rng = np.random.default_rng(1)
    X = rng.normal(size=(20, 4))
    R = np.linalg.qr(rng.normal(size=(4, 4)))[0]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(X)] + [(99, None)]
    df = spark.createDataFrame(rows, schema)
    out = {
        r["vec_id"]: r["embedding"]
        for r in rotate_vectors(df, R.tolist()).collect()
    }
    assert out[99] is None
    want = X @ R
    for i in range(20):
        assert np.allclose(out[i], want[i], atol=1e-12)


def test_cross_covariance_numpy_parity(spark):
    rng = np.random.default_rng(2)
    X = rng.normal(size=(50, 4))
    Y = rng.normal(size=(50, 4))
    M = _cross_covariance(
        _df(spark, X), _df(spark, Y), "vec_id", "embedding", "embedding", 4
    )
    assert np.allclose(M, X.T @ Y, atol=1e-8)


def test_opq_rotation_orthogonal_and_trace_monotone(spark, aniso):
    df, _, _ = aniso
    codebook, R, info = opq_train(
        df, m=2, ks=4, opq_iters=4, pq_max_iter=4, seed=3
    )
    R = np.asarray(R)
    assert np.allclose(R.T @ R, np.eye(4), atol=1e-9)
    assert info["init"] == "eigen"
    trace = info["mse_trace"]
    assert len(trace) == 4
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-6, trace


@pytest.mark.slow
def test_opq_beats_plain_pq_on_anisotropic_data(spark, aniso):
    df, X, _ = aniso
    # plain PQ baseline at a larger Lloyd budget
    pq_cb, _ = pq_train(df, m=2, ks=4, max_iter=8, seed=3)
    codes = pq_encode(df, pq_cb)
    recon = pq_decode(codes, pq_cb)
    got = {r["id"]: np.array(r["embedding"]) for r in recon.collect()}
    pq_mse = float(
        np.mean([np.sum((X[i] - got[i]) ** 2) for i in range(len(X))])
    )
    _, _, info = opq_train(df, m=2, ks=4, opq_iters=4, pq_max_iter=4, seed=3)
    opq_mse = info["mse_trace"][-1]
    # eigenvalue allocation + refinement must recover (almost) all of
    # the misalignment loss — order of magnitude, not percent
    assert opq_mse < 0.1 * pq_mse, (opq_mse, pq_mse)


@pytest.mark.slow
def test_identity_init_is_a_fixpoint_motivating_eigen(spark, aniso):
    """The documented failure mode: from R = I the alternation barely
    moves (M ≈ symmetric PSD → Procrustes returns ≈ I) — pinned here
    so the 'eigen' default never silently regresses to it."""
    df, _, _ = aniso
    _, R, info = opq_train(
        df, m=2, ks=4, opq_iters=2, pq_max_iter=4, seed=3, init="identity"
    )
    assert np.allclose(np.asarray(R), np.eye(4), atol=1e-3)
    _, _, einfo = opq_train(
        df, m=2, ks=4, opq_iters=2, pq_max_iter=4, seed=3, init="eigen"
    )
    assert einfo["mse_trace"][-1] < 0.1 * info["mse_trace"][-1]


def test_opq_search_consistent_with_manual_rotation(spark, aniso):
    df, X, lab = aniso
    codebook, R, _ = opq_train(
        df, m=2, ks=4, opq_iters=2, pq_max_iter=3, seed=3
    )
    codes = opq_encode(df, codebook, R)
    queries = _df(spark, X[:5], id_offset=1000)
    got = opq_search(queries, codes, codebook, R, k=3).collect()
    # manual path: rotate queries yourself, use the plain PQ surface
    from sparvi_core_spark.operators.quantization import pq_search

    manual = pq_search(
        rotate_vectors(queries, R), codes, codebook, k=3
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in rows
    )
    assert key(got) == key(manual)
    # top-1 lands in the query's own cluster (ADC ties within a cell
    # break to the smallest id, so "self" is not the contract)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    for q, n in top1.items():
        assert lab[q - 1000] == lab[n], (q, n)
