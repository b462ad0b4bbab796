"""ANN health reports: planted dirty vectors (NULL / NaN / ragged /
zero-norm), a NumPy reference for the per-cell IVF stats, empty-cell
reporting, and the drift signal rising when data moves away from the
centroids. embedding_health's DuckDB pair lives in
tests/test_oracle_parity.py::test_local_embedding_health_parity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sparvi_core_spark.operators.ann_health import embedding_health, ivf_health


def test_embedding_health_planted_dirt(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.0, 0.0]),          # zero norm
        (3, None),                # null vector
        (4, [float("nan"), 1.0]), # NaN
        (5, [1.0, 0.0, 0.0]),     # ragged (dim 3)
        (6, [0.0, 1.0]),          # norm 1
    ]
    r = embedding_health(
        spark.createDataFrame(rows, schema)
    ).first().asDict()
    assert r["n_vectors"] == 6 and r["n_null"] == 1
    assert r["n_dims_distinct"] == 2
    assert (r["dim_min"], r["dim_max"]) == (2, 3)
    assert r["n_nan"] == 1 and r["n_zero_norm"] == 1
    # norm stats over the clean population {5, 0, 1, 1}
    clean = [5.0, 0.0, 1.0, 1.0]
    assert r["norm_mean"] == pytest.approx(sum(clean) / 4, abs=1e-6)
    assert r["norm_min"] == 0.0 and r["norm_max"] == 5.0
    sd = (sum((x - 1.75) ** 2 for x in clean) / 3) ** 0.5
    assert r["norm_std"] == pytest.approx(sd, abs=1e-6)


def test_embedding_health_on_fixture(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    r = embedding_health(emb).first().asDict()
    assert r["n_vectors"] == emb.count()
    assert r["n_null"] == 0 and r["n_nan"] == 0
    assert r["n_dims_distinct"] == 1


def _centroids(spark, cents):
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "bucket int, centroid array<double>",
    )


def test_ivf_health_numpy_reference(spark):
    rng = np.random.default_rng(7)
    cents = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = np.vstack(
        [c + rng.normal(0, 1.0, size=(40, 2)) for c in cents[:2]]
    )  # cell 2 stays EMPTY
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    rep = {
        r["bucket"]: r
        for r in ivf_health(df, _centroids(spark, cents)).collect()
    }
    assert set(rep) == {0, 1, 2}
    assert rep[2]["n"] == 0 and rep[2]["mean_distance"] is None
    assert rep[2]["frac"] == 0.0
    # NumPy twin: argmin assignment + per-cell mean/max distance
    d = np.linalg.norm(pts[:, None, :] - cents[None, :, :], axis=2)
    lab = d.argmin(axis=1)
    for b in (0, 1):
        mask = lab == b
        assert rep[b]["n"] == int(mask.sum())
        assert rep[b]["frac"] == pytest.approx(mask.mean(), abs=1e-6)
        # ivf_assign rounds distances to 4 before the stats
        dists = np.round(d[mask, b], 4)
        assert rep[b]["mean_distance"] == pytest.approx(
            dists.mean(), abs=1e-4
        )
        assert rep[b]["max_distance"] == pytest.approx(
            dists.max(), abs=1e-4
        )
        assert rep[b]["p95_distance"] <= rep[b]["max_distance"]
    assert abs(sum(r["frac"] for r in rep.values()) - 1.0) < 1e-6


def test_ivf_health_drift_signal(spark):
    rng = np.random.default_rng(11)
    cents = np.array([[0.0, 0.0], [10.0, 0.0]])
    near = rng.normal(0, 0.5, size=(50, 2))
    far = near + np.array([3.0, 3.0])  # the corpus moved; index didn't
    mk = lambda pts: spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    c = _centroids(spark, cents)
    before = ivf_health(mk(near), c).filter("bucket = 0").first()
    after = ivf_health(mk(far), c).filter("bucket = 0").first()
    assert after["mean_distance"] > before["mean_distance"] * 2


def test_embedding_drift_reference_and_signal(spark):
    rng = np.random.default_rng(3)
    A = rng.normal(0, 1, size=(300, 8))
    B = A + 0.0  # identical corpus
    mk = lambda X, off=0: spark.createDataFrame(
        [(i + off, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    from sparvi_core_spark.operators.ann_health import embedding_drift

    same = embedding_drift(mk(A), mk(B, 1000)).first().asDict()
    assert same["n_a"] == same["n_b"] == 300
    assert same["mean_l2_shift"] == pytest.approx(0.0, abs=1e-6)
    assert same["mean_cosine"] == pytest.approx(1.0, abs=1e-6)
    assert same["smd_max"] == pytest.approx(0.0, abs=1e-6)

    # dimension 3 drifts by +2σ: SMD flags it, NumPy twin agrees
    C = A.copy()
    C[:, 3] += 2.0
    got = embedding_drift(mk(A), mk(C, 1000)).first().asDict()
    # float32 storage: compare against the float32-rounded data
    A32, C32 = A.astype(np.float32).astype(float), C.astype(
        np.float32
    ).astype(float)
    mu_a, mu_c = A32.mean(0), C32.mean(0)
    pooled = np.sqrt((A32.var(0) + C32.var(0)) / 2)
    smd = np.abs(mu_a - mu_c) / pooled
    assert got["mean_l2_shift"] == pytest.approx(
        float(np.linalg.norm(mu_a - mu_c)), abs=1e-5
    )
    assert got["smd_max"] == pytest.approx(float(smd.max()), abs=1e-5)
    assert got["smd_avg"] == pytest.approx(float(smd.mean()), abs=1e-5)
    assert got["smd_max"] > 1.5  # the planted 2σ shift is flagged


def test_embedding_drift_constant_dim_no_nan(spark):
    rows_a = [(i, [1.0, float(i)]) for i in range(20)]
    rows_b = [(i + 100, [1.0, float(i) + 5.0]) for i in range(20)]
    from sparvi_core_spark.operators.ann_health import embedding_drift

    df = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    r = embedding_drift(df(rows_a), df(rows_b)).first().asDict()
    # dim 0 is constant on both sides → excluded from SMD, not NaN/inf
    assert r["smd_max"] is not None and math.isfinite(r["smd_max"])
    assert r["smd_avg"] > 0
