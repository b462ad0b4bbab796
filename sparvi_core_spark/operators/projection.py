"""PCA projection / whitening over an embedding column — the
dimensionality-reduction step in front of the ANN stack: cut a
768/1536-dim embedding corpus to the 64–256 dims that carry the
variance before top-k search, IVF build, PQ/OPQ coding, or near-dup
screening — at 100 TB the single cheapest way to shrink every
downstream matmul, shuffle, and codebook by 3–10×.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface, sitting
between ``pool_embeddings`` (chunk→doc vectors) and
``operators.similarity`` / ``operators.quantization`` (search and
compression).

Scale design (the part that matters at 100 TB):

- **Fit is ONE corpus pass, no joins**: each Arrow batch contributes a
  d×d Gram partial, a d-vector sum, and a count (a blocked ``XᵀX``);
  the driver combines partials into the covariance and runs ``eigh``
  on its own d×d — collect volume is partials × d², never row-scale.
  (The OPQ init computes the same moment via an id self-join; this
  kernel skips the join entirely.)
- **Projection is map-only**: ``(x − μ) @ W`` per Arrow batch with the
  (d × k)-double model shipped in the kernel closure (≤ a few MB at
  any realistic d) — zero shuffles, NULL vectors pass through as NULL
  (the package-wide dirty-input contract).
- **Whitening is a column rescale of W** (1/√λ), decided at fit time —
  projection cost is identical either way.
- Eigen-sign is pinned (largest-|loading| coordinate positive) so fits
  are deterministic across sessions and BLAS builds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class PCAModel:
    """A fitted projection: ``mean`` (d), ``components`` (d × k,
    column j = j-th principal direction, already whitened-scaled when
    ``whiten``), ``explained_variance`` (k eigenvalues, descending),
    ``total_variance`` (trace of the covariance) — plain Python lists,
    so the model serializes anywhere and ships driver-side.
    """

    mean: list[float]
    components: list[list[float]]
    explained_variance: list[float]
    total_variance: float
    whiten: bool = False

    @property
    def out_dim(self) -> int:
        return len(self.explained_variance)

    def explained_variance_ratio(self) -> list[float]:
        t = self.total_variance or 1.0
        return [v / t for v in self.explained_variance]


def _moments(vectors: DataFrame, vec_col: str, dim: int):
    """One pass → (XᵀX as d×d, Σx as d, n). NULL vectors skipped."""
    import numpy as np
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "g": [list((X.T @ X).ravel())],
                    "s": [list(X.sum(axis=0))],
                    "n": [len(X)],
                }
            )

    parts = (
        vectors.select(vec_col)
        .mapInPandas(kern, "g array<double>, s array<double>, n long")
        .collect()
    )
    G = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0
    for r in parts:
        G += np.asarray(r["g"]).reshape(dim, dim)
        s += np.asarray(r["s"])
        n += r["n"]
    return G, s, n


def pca_fit(
    vectors: DataFrame,
    out_dim: int | None = None,
    vec_col: str = "embedding",
    variance: float | None = None,
    whiten: bool = False,
    eps: float = 1e-9,
) -> PCAModel:
    """Fit PCA over an embedding column → :class:`PCAModel`.

    Pick the output width either explicitly (``out_dim``) or by
    coverage (``variance=0.95`` keeps the smallest k whose eigenvalues
    sum to ≥95% of the trace); exactly one of the two must be given.
    ``whiten=True`` scales each component by 1/√(λ+eps) so projected
    coordinates have unit variance (the isotropic input PQ and
    Euclidean ANN prefer). Covariance uses the 1/n (population)
    normalization — the convention shared with the OPQ eigen init.
    """
    import numpy as np

    if (out_dim is None) == (variance is None):
        raise ValueError("give exactly one of out_dim= or variance=")
    first = vectors.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        raise ValueError(f"no non-NULL vectors in {vec_col!r}")
    dim = len(first[0])
    G, s, n = _moments(vectors, vec_col, dim)
    if n < 2:
        raise ValueError(f"PCA needs ≥2 vectors, got {n}")
    mu = s / n
    C = G / n - np.outer(mu, mu)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, V = np.maximum(w[order], 0.0), V[:, order]
    total = float(np.trace(C))
    if out_dim is None:
        if not (0.0 < variance <= 1.0):
            raise ValueError(f"variance must be in (0, 1], got {variance}")
        covered = np.cumsum(w) / (total or 1.0)
        out_dim = int(np.searchsorted(covered, variance) + 1)
    if not (1 <= out_dim <= dim):
        raise ValueError(f"out_dim must be in [1, {dim}], got {out_dim}")
    W = V[:, :out_dim].copy()
    # deterministic sign: largest-|loading| coordinate positive
    for j in range(out_dim):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    lam = w[:out_dim]
    if whiten:
        W = W / np.sqrt(lam + eps)[None, :]
    return PCAModel(
        mean=[float(x) for x in mu],
        components=[[float(x) for x in row] for row in W],
        explained_variance=[float(x) for x in lam],
        total_variance=total,
        whiten=whiten,
    )


def pca_project(
    vectors: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only projection: (id, x) → (id, (x − μ) @ W) with the model
    in the kernel closure. Zero shuffles; NULL vectors pass through as
    NULL; output column keeps ``vec_col``'s name so the frame drops
    into every ANN/PQ operator unchanged.
    """
    import numpy as np

    from sparvi_core_spark.operators.similarity import _blas_id_ddl

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    mu = np.asarray(model.mean, dtype=np.float64)
    W = np.asarray(model.components, dtype=np.float64)

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            mask = pdf[vec_col].notna()
            ids = pdf[id_col].to_numpy()
            ids = ids.astype("U") if id_is_str else ids.astype(np.int64)
            out = np.empty(len(pdf), dtype=object)
            if mask.any():
                X = np.stack(pdf.loc[mask, vec_col].to_numpy()).astype(
                    np.float64
                )
                out[np.flatnonzero(mask.to_numpy())] = list((X - mu) @ W)
            yield pd.DataFrame({"id": ids, "vec": out})

    return (
        vectors.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(kern, f"id {id_ddl}, vec array<double>")
        .select(F.col("id").alias(id_col), F.col("vec").alias(vec_col))
    )
