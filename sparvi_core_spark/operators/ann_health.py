"""ANN operational health — the checks that run before/after every
index build and every corpus append at scale: is the embedding column
itself sound (dims consistent, no NaN/zero-norm junk), and is the IVF
index still fit for the data (balanced cells, no dead cells, assignment
distances not drifting)? A skewed or stale index silently turns
"nprobe=2" into "recall cliff"; these reports make that visible as
numbers instead of bad search results.

No analog in the reference engine (SURVEY.md §2.8) — the ops
counterpart of the build/search surface in ``operators.similarity``.

Scale design (the part that matters at 100 TB):

- :func:`embedding_health` is ONE linear pass reduced to a single row
  of scalars — every check (dim spread, NaN/zero-norm counts, norm
  moments) is an expression inside one aggregate; nothing shuffles but
  the one-row partial aggregates.
- :func:`ivf_health` reuses ``ivf_assign`` (broadcast centroids,
  min_by argmin — one corpus pass) and reduces to one row PER BUCKET;
  empty cells survive via a right join against the centroid table
  (they are the signal: dead cells = wasted probes).
- Everything is built-in expressions; no Python on the executors.

``embedding_health`` has a DuckDB oracle pair; ``ivf_health`` is
pinned against a NumPy reference (same convention as pagerank — the
centroid input makes a SQL twin clumsy, not the math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.operators.similarity import ivf_assign


def embedding_health(
    vectors: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One-row embedding-column report →
    (n_vectors, n_null, n_dims_distinct, dim_min, dim_max, n_nan,
    n_zero_norm, norm_mean, norm_std, norm_min, norm_max).

    ``n_dims_distinct > 1`` means ragged vectors (a broken encoder
    batch — most ANN kernels will crash or silently mis-rank);
    ``n_nan``/``n_zero_norm`` rows are excluded from cosine paths by
    the similarity operators' filters, so non-zero counts here explain
    "missing" search results. Norm stats on the REAL (non-null,
    NaN-free) population; all one aggregate over one corpus pass.
    """
    v = F.col(vec_col)
    sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    has_nan = F.exists(v, lambda x: F.isnan(x.cast("double")))
    norm = F.sqrt(sq)
    clean_norm = F.when(v.isNotNull() & ~has_nan, norm)
    per = vectors.select(
        v.isNull().cast("long").alias("is_null"),
        F.when(v.isNotNull(), F.size(v)).alias("dim"),
        F.when(v.isNotNull() & has_nan, 1).otherwise(0).alias("is_nan"),
        F.when(clean_norm == 0.0, 1).otherwise(0).alias("is_zero"),
        clean_norm.alias("norm"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("is_null").alias("n_null"),
        F.count_distinct("dim").alias("n_dims_distinct"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.sum("is_nan").alias("n_nan"),
        F.sum("is_zero").alias("n_zero_norm"),
        F.round(F.avg("norm"), round_to).alias("norm_mean"),
        F.round(F.stddev_samp("norm"), round_to).alias("norm_std"),
        F.round(F.min("norm"), round_to).alias("norm_min"),
        F.round(F.max("norm"), round_to).alias("norm_max"),
    )
    return agg


def ivf_health(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-cell IVF index report →
    (bucket, n, frac, mean_distance, p95_distance, max_distance),
    one row per CENTROID — including empty cells (n = 0, NULL
    distances). Read it like a DBA reads a partition-size listing:

    - ``frac`` spread ≫ 1/k → skewed cells (hot cells blow up probe
      cost; consider re-training or salting the hot bucket).
    - Empty cells → wasted probes / k too large for the data.
    - ``mean_distance`` creeping up across appends → centroid drift;
      the index needs a re-train (this is the "when do I rebuild"
      signal an append-only ingest pipeline watches).

    One ``ivf_assign`` pass (broadcast centroids) + a per-bucket
    aggregate + a broadcast right join against the centroid list.
    """
    assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    per_bucket = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("distance"), round_to).alias("mean_distance"),
        F.round(
            F.percentile_approx("distance", 0.95), round_to
        ).alias("p95_distance"),
        F.round(F.max("distance"), round_to).alias("max_distance"),
    )
    total = assigned.agg(F.count(F.lit(1)).alias("_total"))
    return (
        F.broadcast(centroids.select("bucket"))
        .join(per_bucket, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(
                F.when(
                    F.col("_total") > 0,
                    F.coalesce(F.col("n"), F.lit(0))
                    / F.col("_total").cast("double"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("frac"),
            "mean_distance",
            "p95_distance",
            "max_distance",
        )
    )


def embedding_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One-row distribution-shift report between two embedding corpora
    (yesterday vs today, encoder v1 vs v2) →
    (n_a, n_b, mean_l2_shift, mean_cosine, smd_max, smd_avg).

    - ``mean_l2_shift`` / ``mean_cosine``: distance / cosine between
      the two mean vectors — a centroid that moved means EVERY cached
      index assignment and calibration threshold is suspect.
    - ``smd_max`` / ``smd_avg``: per-dimension standardized mean
      difference |μa − μb| / pooled σ (Cohen's d), max and average
      over dimensions — catches a single drifting feature dimension
      that the global mean hides. SMD > 0.1 is the conventional
      "not negligible" line.

    Read with its blind spots in mind (they are the metric's math, not
    bugs — measured on the fixture): SMD is SCALE-INVARIANT, so an
    encoder that rescaled everything uniformly is invisible here and
    loud in ``embedding_health``'s norm stats; and ``mean_cosine`` is
    noise when the corpus mean is near zero (centered / unit-random
    embeddings — ‖μ‖ ≈ 0 makes its direction meaningless), so anchor
    on ``mean_l2_shift``/SMD for those.

    One linear pass per side (posexplode → per-dimension avg/var,
    map-side combined, output = dim rows), a dim-bounded join, one
    scalar aggregate. NULL vectors are excluded; dimensions with zero
    pooled variance report NULL SMD (constant on both sides → no
    drift signal, not a divide-by-zero).
    """
    def per_dim(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("pos")
            .agg(
                F.avg(F.col("val").cast("double")).alias(f"mu_{tag}"),
                F.var_pop(F.col("val").cast("double")).alias(f"var_{tag}"),
            )
        )

    counts = (
        a.filter(F.col(vec_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(
            b.filter(F.col(vec_col).isNotNull()).agg(
                F.count(F.lit(1)).alias("n_b")
            )
        )
    )
    dims = per_dim(a, "a").join(per_dim(b, "b"), "pos")
    pooled = F.sqrt((F.col("var_a") + F.col("var_b")) / 2.0)
    smd = F.when(
        pooled > 0, F.abs(F.col("mu_a") - F.col("mu_b")) / pooled
    )
    agg = dims.agg(
        F.sqrt(
            F.sum(
                (F.col("mu_a") - F.col("mu_b"))
                * (F.col("mu_a") - F.col("mu_b"))
            )
        ).alias("mean_l2_shift"),
        (
            F.sum(F.col("mu_a") * F.col("mu_b"))
            / (
                F.sqrt(F.sum(F.col("mu_a") * F.col("mu_a")))
                * F.sqrt(F.sum(F.col("mu_b") * F.col("mu_b")))
            )
        ).alias("mean_cosine"),
        F.max(smd).alias("smd_max"),
        F.avg(smd).alias("smd_avg"),
    )
    return counts.crossJoin(F.broadcast(agg)).select(
        "n_a",
        "n_b",
        F.round("mean_l2_shift", round_to).alias("mean_l2_shift"),
        F.round("mean_cosine", round_to).alias("mean_cosine"),
        F.round("smd_max", round_to).alias("smd_max"),
        F.round("smd_avg", round_to).alias("smd_avg"),
    )
