"""Dataset splitting and sampling for training-data pipelines.

Two properties matter at 100 TB and neither comes from
``randomSplit``:

- **Determinism by KEY, not by partitioning**: ``randomSplit`` assigns
  rows by per-partition RNG streams, so the same row can land in a
  different split after a repartition, compaction, or re-run — silent
  train/test contamination. Hashing a stable id makes the assignment a
  pure function of the row.
- **No extra pass**: hash splits are a filter (codegen, pushed past
  projections); stratified sampling uses Spark's native ``sampleBy``
  (per-stratum Bernoulli, one scan, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKETS = 1_000_000  # ppm resolution for split fractions


def _hash_bucket(id_col: str, salt: str) -> F.Column:
    # xxhash64 is a stable 64-bit hash (same value across sessions,
    # partitionings, and Spark versions); pmod folds it into ppm buckets
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> dict[str, DataFrame]:
    """Deterministic disjoint splits keyed on ``xxhash64(id, salt)``.

    ``weights`` maps split name → fraction (must sum to ~1). A row's
    split is a pure function of (id, salt): stable across re-runs,
    repartitions, and incremental appends — new rows join a split
    without moving old ones, which is what train/test contamination
    control actually requires. Each returned frame is a FILTER on the
    input (no shuffle, no extra scan; evaluate lazily as usual).
    Change ``salt`` to draw an independent re-split.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(id_col, salt)
    out: dict[str, DataFrame] = {}
    lo = 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else lo + int(weights[name] * _BUCKETS)
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> dict[str, DataFrame]:
    """Leakage-safe splits: near-duplicate cluster members NEVER
    straddle a split boundary.

    ``hash_split`` keys each row on its own id, so the two halves of a
    near-dup pair can land in train and eval — the leakage
    ``cross_split_contamination`` exists to DETECT. This variant
    prevents it: rows are keyed on ``coalesce(cluster, id)`` (the
    ``(id, cluster)`` frame from ``dedup.dedup_clusters`` /
    ``semantic_dedup``'s report), so every member of a cluster shares
    one hash and therefore one split; singletons keep their own id
    key, which makes the assignment identical to ``hash_split`` for
    every non-duplicated row — appending new docs moves nobody.

    Plan: one left join of the corpus against the cluster frame (only
    duplicated ids appear there, so it is usually far smaller than the
    corpus — AQE broadcasts it under the threshold), then the same
    ppm-bucket filters as ``hash_split``. Fractions apply to cluster
    KEYS; heavily duplicated corpora will see row fractions skew
    toward whichever split the big clusters hash into (inherent to
    group-level splitting, not a bug).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key = "__split_key"
    keyed = df.join(
        clusters.select(
            F.col("id").alias(id_col), F.col("cluster").alias("__cl")
        ),
        id_col,
        "left",
    ).withColumn(key, F.coalesce(F.col("__cl"), F.col(id_col)))
    bucket = _hash_bucket(key, salt)
    out: dict[str, DataFrame] = {}
    lo = 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else lo + int(weights[name] * _BUCKETS)
        out[name] = keyed.filter((bucket >= lo) & (bucket < hi)).drop(
            "__cl", key
        )
        lo = hi
    return out


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction`` subsample by the same key-hash rule —
    the repeatable alternative to ``df.sample`` for experiment
    subsets (same ids selected every run, on any cluster layout)."""
    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_hash_bucket(id_col, salt) < int(fraction * _BUCKETS))


def cross_split_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int | None = None,
    shingle_n: int = 3,
) -> DataFrame:
    """Eval-set docs that are near-duplicates of train-set docs —
    the leakage a held-out split must be screened for before its
    scores mean anything (splitting by hash prevents EXACT-row
    contamination; near-duplicate text still crosses splits freely).

    Returns (eval_id, train_id, est_jaccard): one row per contaminated
    pair at estimated Jaccard ≥ ``threshold``.

    Plan: tag each side, union, and run the scale-hardened
    MinHash+LSH pair generator
    (:func:`~sparvi_core_spark.operators.dedup.minhash_dedup_pairs` —
    banded candidates, capped buckets, never all-pairs), then keep only
    pairs whose members straddle the split via two equi-joins of the
    (small) pair frame against the (id → split) map. Ids must be
    unique ACROSS both frames (true for any two splits of one corpus,
    e.g. from :func:`hash_split`).
    """
    from sparvi_core_spark.operators.dedup import minhash_dedup_pairs

    t = train.select(F.col(id_col), F.col(text_col), F.lit(0).alias("__split"))
    e = eval_df.select(F.col(id_col), F.col(text_col), F.lit(1).alias("__split"))
    both = t.unionByName(e)
    pairs = minhash_dedup_pairs(
        both,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        shingle_n=shingle_n,
    )
    splits = both.select(F.col(id_col).alias("__sid"), "__split")
    sa = splits.select(F.col("__sid").alias("__ida"), F.col("__split").alias("__spa"))
    sb = splits.select(F.col("__sid").alias("__idb"), F.col("__split").alias("__spb"))
    tagged = (
        pairs.join(sa, pairs["id_a"] == F.col("__ida"))
        .join(sb, pairs["id_b"] == F.col("__idb"))
        .filter(F.col("__spa") != F.col("__spb"))
    )
    return tagged.select(
        F.when(F.col("__spa") == 1, F.col("id_a")).otherwise(F.col("id_b")).alias("eval_id"),
        F.when(F.col("__spa") == 0, F.col("id_a")).otherwise(F.col("id_b")).alias("train_id"),
        "est_jaccard",
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
    default_fraction: float | None = None,
    max_strata: int = 10_000,
) -> DataFrame:
    """Per-stratum Bernoulli sampling via native ``sampleBy`` — one
    scan, no shuffle; strata absent from ``fractions`` default to
    ``default_fraction`` (or 0, sampleBy's own rule). The standard tool
    for rebalancing a skewed corpus (e.g. downsampling a dominant
    language) before training.

    ``default_fraction`` needs the distinct strata on the driver; that
    collect is bounded by ``max_strata`` (LIMIT max_strata+1), so
    pointing it at a high-cardinality column (a doc id, a URL) fails
    loudly instead of materializing millions of keys driver-side —
    the intended strata are languages/domains/sources, which number
    in the hundreds.
    """
    if default_fraction is not None:
        keys = [
            r[0]
            for r in df.select(strata_col).distinct().limit(max_strata + 1).collect()
        ]
        if len(keys) > max_strata:
            raise ValueError(
                f"stratified_sample(default_fraction=...) found more than "
                f"max_strata={max_strata} distinct values in {strata_col!r}; "
                "this column is too high-cardinality to enumerate driver-side "
                "— pass explicit fractions, raise max_strata, or stratify on "
                "a coarser column"
            )
        fractions = {k: fractions.get(k, default_fraction) for k in keys}
    return df.sampleBy(strata_col, fractions, seed=seed)


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    drawn with probability proportional to ``weight_col`` (the standard
    quality-weighted corpus subsample), reproducible across runs,
    partitionings, and cluster sizes.

    Efraimidis-Spirakis A-ES keys: each row gets
    ``key = -ln(u) / w`` with ``u`` uniform in (0,1); the k SMALLEST
    keys are exactly a weight-proportional without-replacement draw.
    Instead of ``rand()`` (per-partition RNG streams — a repartition
    changes the sample), ``u`` is derived from ``xxhash64(id, salt)``,
    so the draw is a pure function of (id, salt): append-stable,
    layout-invariant, and re-runnable — the same properties
    ``hash_split`` guarantees for splits. Vary ``salt`` to get an
    independent redraw.

    Rows with NULL, zero, or negative weight are excluded (zero weight
    means "never sample"; negative weights have no sampling meaning).

    Scale: the selection is Spark's ``TakeOrderedAndProject`` — each
    partition keeps its local top-k, only k·partitions candidate rows
    move — no full sort, no global shuffle of the data. ``k`` is
    driver-bounded by construction, same contract as the profiler's
    outlier listing.
    """
    # u in (0,1): fold the hash into ppm buckets and center, so u is
    # never exactly 0 or 1 and -ln(u) stays finite
    u = (_hash_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__aes_key", key)
        .orderBy("__aes_key")
        .limit(k)
        .drop("__aes_key")
    )
