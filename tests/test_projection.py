"""PCA projection / whitening (`operators/projection.py`).

NumPy is the oracle: the full fit (covariance → eigh → sign pinning →
optional whitening) is re-derived driver-side from the collected
fixture and compared value-for-value, so the distributed moment kernel
has an independent twin. Behavioral pins: whitened output has identity
covariance, full-width projection preserves Euclidean geometry, NULLs
pass through, and the projection plan is exchange-free (map-only).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.projection import (
    PCAModel,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark, views):
    return spark.table("embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def _np_pca(X, k, whiten=False, eps=1e-9):
    mu = X.mean(axis=0)
    C = (X.T @ X) / len(X) - np.outer(mu, mu)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, V = np.maximum(w[order], 0.0), V[:, order]
    W = V[:, :k].copy()
    for j in range(k):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    lam = w[:k]
    if whiten:
        W = W / np.sqrt(lam + eps)[None, :]
    return mu, W, lam, float(np.trace(C))


def test_fit_matches_numpy_twin(emb, emb_np):
    _, X = emb_np
    model = pca_fit(emb, out_dim=16)
    mu, W, lam, total = _np_pca(X, 16)
    assert np.allclose(model.mean, mu, atol=1e-9)
    assert np.allclose(model.explained_variance, lam, atol=1e-8)
    assert model.total_variance == pytest.approx(total, abs=1e-8)
    assert np.allclose(np.asarray(model.components), W, atol=1e-7)


def test_project_matches_numpy_twin(emb, emb_np):
    ids, X = emb_np
    model = pca_fit(emb, out_dim=8, whiten=True)
    mu, W, _, _ = _np_pca(X, 8, whiten=True)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in pca_project(emb, model).collect()
    }
    want = (X - mu) @ W
    assert set(got) == set(int(i) for i in ids)
    for i, row in zip(ids, want):
        assert np.allclose(got[int(i)], row, atol=1e-7)


def test_whitened_output_has_identity_covariance(emb):
    model = pca_fit(emb, out_dim=12, whiten=True)
    Y = np.array(
        [r["embedding"] for r in pca_project(emb, model).collect()]
    )
    C = np.cov(Y, rowvar=False, bias=True)
    assert np.allclose(C, np.eye(12), atol=1e-6)


def test_full_width_projection_preserves_euclidean(emb, emb_np):
    _, X = emb_np
    d = X.shape[1]
    model = pca_fit(emb, out_dim=d)
    rows = pca_project(emb, model).orderBy("vec_id").collect()
    Y = np.array([r["embedding"] for r in rows])
    for a, b in [(0, 1), (2, 40), (7, 311)]:
        assert np.linalg.norm(Y[a] - Y[b]) == pytest.approx(
            np.linalg.norm(X[a] - X[b]), abs=1e-8
        )


def test_variance_threshold_picks_minimal_k(emb, emb_np):
    _, X = emb_np
    model = pca_fit(emb, variance=0.9)
    _, _, lam_all, total = _np_pca(X, X.shape[1])
    covered = np.cumsum(lam_all) / total
    want_k = int(np.searchsorted(covered, 0.9) + 1)
    assert model.out_dim == want_k
    r = model.explained_variance_ratio()
    assert sum(r) >= 0.9
    assert sum(r[:-1]) < 0.9  # one fewer would not cover


def test_null_vectors_pass_through_and_ids_survive(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [0.0, 1.0, -1.0]),
         (4, [2.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, out_dim=2)
    rows = {r["vec_id"]: r["embedding"] for r in pca_project(df, model).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2] is None
    assert len(rows[1]) == 2


def test_projection_plan_is_exchange_free(emb):
    model = pca_fit(emb, out_dim=4)
    plan = (
        pca_project(emb, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_string_ids_supported(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [1.0, 1.0])],
        "doc string, embedding array<double>",
    )
    model = pca_fit(df, out_dim=1)
    rows = pca_project(df, model, id_col="doc").collect()
    assert {r["doc"] for r in rows} == {"a", "b", "c"}


def test_fit_argument_errors(spark, emb):
    with pytest.raises(ValueError, match="exactly one"):
        pca_fit(emb)
    with pytest.raises(ValueError, match="exactly one"):
        pca_fit(emb, out_dim=4, variance=0.9)
    with pytest.raises(ValueError, match="out_dim"):
        pca_fit(emb, out_dim=0)
    with pytest.raises(ValueError, match="variance"):
        pca_fit(emb, variance=1.5)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-NULL"):
        pca_fit(empty, out_dim=2)
    one = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="≥2"):
        pca_fit(one, out_dim=1)


def test_ann_handoff_after_projection(emb):
    """Projected frame drops straight into the ANN surface."""
    from sparvi_core_spark.operators.similarity import cosine_topk

    model = pca_fit(emb, out_dim=16)
    proj = pca_project(emb, model)
    qs = proj.filter(F.col("vec_id") < 3)
    out = cosine_topk(proj, qs, k=5)
    got = out.groupBy("query_id").count().collect()
    assert {r["query_id"]: r["count"] for r in got} == {0: 5, 1: 5, 2: 5}
