"""Cluster-based corpus curation — the "organize the embedding space,
then curate per cell" tier (SemDeDup / SSL-prototypes / DataComp
style): k-means the corpus once, then read per-cluster health, flag
semantic outliers, pick prototypes, and draw cluster-balanced
subsamples — all against the one cached (id, cluster, distance)
assignment.

Why cluster-level curation at 100 TB: global quality filters treat
the corpus as one distribution, but web-scale corpora are mixtures —
a near-duplicate pile-up, a boilerplate genre, or a single dominant
topic each live in their own region of embedding space. Clustering
makes those regions addressable: downweight the mega-cluster, drop
the far tail of every cluster (garbage/mislabeled docs), keep
per-cell prototypes for inspection.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- The expensive step happens ONCE: :func:`cluster_corpus` is
  ``kmeans_fit`` + ``ivf_assign`` (broadcast centroids, ``min_by``
  argmin — no window, no per-vector shuffle). Everything downstream
  consumes the assignment frame.
- Per-cluster statistics are one map-side-combined groupBy producing
  a #clusters-sized table; outlier flagging and rate-based sampling
  then BROADCAST that table back — map-only passes over the corpus,
  no corpus-keyed shuffle (plan-pinned in tests).
- :func:`balanced_cluster_sample` has two modes: ``"rate"`` (default)
  is a join-free-in-spirit Bernoulli thinning — per-cluster keep
  rates from the tiny size table, membership decided by a
  deterministic ``xxhash64(id, salt)`` uniform, so the draw is
  append-stable and layout-invariant (the ``hash_split`` contract);
  ``"exact"`` pays one shuffle keyed on the cluster plus a
  per-cluster sort for exact counts — correct, but a mega-cluster
  makes it the skew hot spot, which is why it is not the default.
- Budget math reuses :func:`mixing.temperature_weights` (UniMax
  capping: no cluster is budgeted above its supply, surplus
  re-distributes), so cluster sampling and domain mixing share one
  tested definition of "temperature".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparvi_core_spark.operators.sampling import _BUCKETS, _hash_bucket

_MAX_CLUSTERS = 100_000


def cluster_corpus(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
    init: str = "parallel",
) -> tuple[DataFrame, DataFrame, dict]:
    """K-means the corpus and assign every vector: returns
    ``(assigned, centroids, info)`` where ``assigned`` is
    ``(id, bucket, distance)`` — the frame every other operator in
    this module consumes (cache it), ``centroids`` is the
    ``(bucket, centroid)`` table (broadcastable, reusable by the ANN
    stack), and ``info`` is ``kmeans_fit``'s convergence report.
    NULL vectors get no assignment (``ivf_assign``'s contract).
    Defaults to k-means|| seeding (``init="parallel"``): curation
    reads per-cluster structure, so a split/merge local optimum from
    uniform seeding corrupts every downstream report."""
    from sparvi_core_spark.operators.similarity import ivf_assign, kmeans_fit

    centroids, info = kmeans_fit(
        vectors,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        max_iter=max_iter,
        seed=seed,
        init=init,
    )
    assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    return assigned, centroids, info


def cluster_report(assigned: DataFrame) -> DataFrame:
    """Per-cluster health table from an assignment frame: size, share
    of the corpus, and the distance-to-centroid distribution (mean /
    sample-stddev / max — the dispersion numbers that tell a tight
    topic from a junk drawer). ONE map-side-combined groupBy; the
    share join is a whole-frame window over #clusters rows (trivial
    by construction)."""
    per = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("distance"), 6).alias("dist_mean"),
        F.round(
            F.coalesce(F.stddev_samp("distance"), F.lit(0.0)), 6
        ).alias("dist_stddev"),
        F.round(F.max("distance"), 6).alias("dist_max"),
    )
    w = Window.partitionBy()
    return per.select(
        "bucket",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("share"),
        "dist_mean",
        "dist_stddev",
        "dist_max",
    )


def semantic_outliers(
    assigned: DataFrame,
    z: float = 3.0,
) -> DataFrame:
    """Flag docs in the far tail of their OWN cluster:
    ``distance > mean + z·stddev`` within the cluster — the
    embedding-space garbage detector (mis-embedded docs, wrong-corpus
    strays, residual near-dup pile-ups park far from every centroid).
    Adds ``dist_z`` (NULL when the cluster has no dispersion) and
    ``is_outlier`` (never NULL; dispersion-free clusters flag
    nothing). Per-cluster stats are #clusters rows BROADCAST back —
    the corpus crosses no exchange (plan-pinned in tests)."""
    stats = assigned.groupBy("bucket").agg(
        F.avg("distance").alias("__mu"),
        F.stddev_samp("distance").alias("__sd"),
    )
    zcol = (F.col("distance") - F.col("__mu")) / F.col("__sd")
    return (
        assigned.join(F.broadcast(stats), "bucket")
        .select(
            *assigned.columns,
            F.round(
                F.when(F.col("__sd") > 0, zcol), 4
            ).alias("dist_z"),
            F.coalesce(
                F.when(F.col("__sd") > 0, zcol > F.lit(float(z))),
                F.lit(False),
            ).alias("is_outlier"),
        )
    )


def cluster_prototypes(
    assigned: DataFrame,
    per_cluster: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """The ``per_cluster`` docs CLOSEST to each centroid — the
    cluster's prototypes (inspection anchors; SemDeDup keeps exactly
    these when collapsing a semantic cluster). Output adds ``rank``
    (0 = nearest). Ties break id-ascending for determinism. One
    shuffle keyed on the cluster; the per-cluster sort is spillable,
    and the kept set is #clusters × per_cluster — driver-safe to
    collect downstream."""
    if per_cluster < 1:
        raise ValueError(f"per_cluster must be >= 1, got {per_cluster}")
    w = Window.partitionBy("bucket").orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w) - 1)
        .filter(F.col("rank") < per_cluster)
    )


def balanced_cluster_sample(
    assigned: DataFrame,
    per_cluster: int | None = None,
    total: int | None = None,
    temperature: float = 100.0,
    method: str = "rate",
    salt: str = "v1",
    id_col: str = "id",
    max_clusters: int = _MAX_CLUSTERS,
) -> DataFrame:
    """Cluster-balanced subsample of an assignment frame — the
    anti-mega-cluster draw: either ``per_cluster`` docs from every
    cluster (hard balance) or a ``total`` budget split
    ``∝ size^(1/temperature)`` with UniMax capping (``temperature=1``
    keeps the natural mix, large values approach uniform; shared
    definition with ``mixing.temperature_weights``).

    ``method="rate"`` (default, the 100 TB path): per-cluster keep
    RATES ride a broadcast of the #clusters-sized size table; a row
    stays iff its deterministic ``xxhash64(id, salt)`` uniform falls
    under its cluster's rate — map-only over the corpus, counts hit
    the budget in expectation (binomial, ±√budget), and the draw is
    append-stable and layout-invariant. ``method="exact"`` ranks by
    the same hash inside each cluster (one cluster-keyed shuffle) and
    keeps exactly the budget — use when the count contract matters
    more than the skew risk of sorting the mega-cluster.
    """
    if (per_cluster is None) == (total is None):
        raise ValueError("pass exactly one of per_cluster / total")
    if method not in ("rate", "exact"):
        raise ValueError(f"method must be 'rate' or 'exact', got {method!r}")
    sizes = (
        assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .limit(max_clusters + 1)
        .collect()
    )
    if len(sizes) > max_clusters:
        raise ValueError(
            f"balanced_cluster_sample found more than "
            f"max_clusters={max_clusters} clusters; the bucket column "
            "looks like an id, not a clustering — check the assignment "
            "frame or raise max_clusters"
        )
    n_by_bucket = {r["bucket"]: int(r["__n"]) for r in sizes}
    if per_cluster is not None:
        if per_cluster < 1:
            raise ValueError(f"per_cluster must be >= 1, got {per_cluster}")
        budgets = {b: min(per_cluster, n) for b, n in n_by_bucket.items()}
    else:
        if total < 1:
            raise ValueError(f"total must be >= 1, got {total}")
        from sparvi_core_spark.operators.mixing import temperature_weights

        spark = assigned.sparkSession
        counts = spark.createDataFrame(
            [(b, n) for b, n in n_by_bucket.items()], ["bucket", "n"]
        )
        fracs = temperature_weights(
            counts,
            temperature=temperature,
            domain_col="bucket",
            tokens_col="n",
            total_tokens=total,
        )
        budgets = {
            b: min(n_by_bucket[b], round(f * total))
            for b, f in fracs.items()
        }
    spark = assigned.sparkSession
    btab = F.broadcast(
        spark.createDataFrame(
            [(b, int(v), n_by_bucket[b]) for b, v in budgets.items()],
            ["bucket", "__budget", "__n_sz"],
        )
    )
    joined = assigned.join(btab, "bucket")
    if method == "rate":
        u = (_hash_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(_BUCKETS))
        rate = F.col("__budget") / F.col("__n_sz")
        return joined.filter(u < rate).drop("__budget", "__n_sz")
    w = Window.partitionBy("bucket").orderBy(
        _hash_bucket(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__budget"))
        .drop("__budget", "__n_sz", "__rk")
    )
