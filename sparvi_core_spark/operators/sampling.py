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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
    default_fraction: float | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling via native ``sampleBy`` — one
    scan, no shuffle; strata absent from ``fractions`` default to
    ``default_fraction`` (or 0, sampleBy's own rule). The standard tool
    for rebalancing a skewed corpus (e.g. downsampling a dominant
    language) before training."""
    if default_fraction is not None:
        keys = [r[0] for r in df.select(strata_col).distinct().collect()]
        fractions = {k: fractions.get(k, default_fraction) for k in keys}
    return df.sampleBy(strata_col, fractions, seed=seed)
