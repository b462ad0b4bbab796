"""KMV (bottom-k minhash) set sketches — corpus-level overlap and
cardinality WITHOUT a join: one pass per corpus builds a fixed-size
sketch of its key set; Jaccard / containment / intersection between
any two corpora are then driver-side arithmetic on 2×k hashes.

This is the sketch tier over the exact operators: ``corpus_diff``
answers "what changed?" with a full-outer hash join (exact, but both
sides shuffle every run); a KMV sketch answers "how much do these two
100 TB corpora overlap?" from k×8 bytes per corpus, built once,
merged freely, compared in microseconds. The standard use: recrawl
overlap audits, train-vs-eval corpus overlap triage before the exact
decontamination pass, dedup-rate forecasting across corpus versions.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Estimator facts (Beyer et al., SIGMOD'07 — public): for a sketch
holding the k smallest of D uniform hashes, ``(k−1)/R_k`` (R_k the
normalized k-th minimum) is unbiased for D with rel. std err
≈ 1/√(k−2); the k smallest of A∪B are a uniform sample of the union,
so the fraction of them present in BOTH sketches estimates Jaccard.
Membership tests inside the sample are EXACT, not probabilistic: a
sketch saturated at threshold τ knows membership perfectly for every
hash ≤ τ, and the sample is clipped to min(τ_A, τ_B) before counting.
Below saturation (distinct keys ≤ k) every estimate degenerates to
the exact value — the small-corpus regime costs nothing.

Scale design (the part that matters at 100 TB):

- **Hashes are computed JVM-side** (``xxhash64``, salted), so the
  Arrow kernel only sees one int64 column — key bytes never cross
  into Python, and the same-salt discipline makes sketches from
  different jobs/sessions comparable bit-for-bit.
- **Build is one pass, collect volume = partitions × k × 8 bytes**:
  each partition folds all its Arrow batches into ONE local
  distinct-bottom-k array (memory ≤ k + batch per task) and yields a
  single binary row; the driver merges. At 4096 hashes × 8 B = 32 KB
  per partition, a 100k-partition scan collects ~3 GB — past that,
  insert one ``repartition(√P)`` + local-merge round before the
  collect (bottom-k sketches are closed under union-then-trim, so
  tree merging is lossless by construction).
- **Sketches MERGE** (:func:`merge_kmv` = union + trim ≡ sketch of
  the union, exact-pinned in tests): shard the build per day / per
  source, keep the 32 KB artifacts, compare any pair later — the
  same sufficient-statistics contract as every mergeable model in
  this package.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_DEFAULT_SALT = "sparvi-kmv"
_TWO64 = float(2**64)


def _hash_col(cols: list[str], salt: str):
    """One salted JVM-side base hash; mapped to uint64 in the kernel
    so hash order is uniform over [0, 2^64)."""
    return F.xxhash64(F.lit(salt), *[F.col(c) for c in cols])


@dataclass(frozen=True)
class KMVSketch:
    """The k smallest distinct (salted) key hashes of a corpus, as a
    sorted tuple of uint64 ints — plus the geometry needed to compare
    two sketches safely. Pickles anywhere; 8k bytes of payload."""

    values: tuple[int, ...]
    k: int
    salt: str
    n_rows: int

    @property
    def saturated(self) -> bool:
        """True = the corpus had more than k distinct keys, so
        ``values`` is a sample bounded by its max (the threshold τ);
        False = ``values`` IS the exact distinct hash set."""
        return len(self.values) >= self.k

    def distinct_estimate(self) -> float:
        """Distinct-key count: exact below saturation, else the
        unbiased KMV estimator (k−1)/R_k."""
        if not self.saturated:
            return float(len(self.values))
        r_k = (self.values[self.k - 1] + 1) / _TWO64
        return (self.k - 1) / r_k


def _check_comparable(a: KMVSketch, b: KMVSketch) -> None:
    if a.salt != b.salt:
        raise ValueError(
            f"sketches hashed with different salts are not comparable: "
            f"{a.salt!r} vs {b.salt!r}"
        )


def kmv_sketch(
    df: DataFrame,
    cols: str | list[str],
    k: int = 4096,
    salt: str = _DEFAULT_SALT,
) -> KMVSketch:
    """One pass over ``df`` → :class:`KMVSketch` of the key ``cols``
    (a column name or a list hashed as a tuple). NULL keys (any NULL
    component) are skipped — NULL is not a member, matching the Bloom
    membership contract. ``salt`` must match across every sketch you
    intend to merge or compare."""
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [cols] if isinstance(cols, str) else list(cols)
    hashed = df.na.drop(subset=keys).select(
        _hash_col(keys, salt).alias("__h")
    )

    def kern(batches):
        cur = np.array([], dtype=np.uint64)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf["__h"].to_numpy().astype(np.uint64)
            cur = np.unique(np.concatenate([cur, h]))[:k]
            n += len(pdf)
        yield pd.DataFrame({"vals": [cur.tobytes()], "n": [n]})

    parts = hashed.mapInPandas(kern, "vals binary, n long").collect()
    acc = np.array([], dtype=np.uint64)
    total = 0
    for r in parts:
        acc = np.unique(
            np.concatenate([acc, np.frombuffer(r["vals"], dtype=np.uint64)])
        )[:k]
        total += r["n"]
    return KMVSketch(
        values=tuple(int(v) for v in acc), k=k, salt=salt, n_rows=total
    )


def merge_kmv(a: KMVSketch, b: KMVSketch) -> KMVSketch:
    """Sketch of the UNION: merged distinct values trimmed to
    min(k_a, k_b) — exactly what :func:`kmv_sketch` over the
    concatenated corpora would build (pinned in tests)."""
    import numpy as np

    _check_comparable(a, b)
    k = min(a.k, b.k)
    vals = np.unique(
        np.concatenate(
            [
                np.array(a.values, dtype=np.uint64),
                np.array(b.values, dtype=np.uint64),
            ]
        )
    )[:k]
    return KMVSketch(
        values=tuple(int(v) for v in vals),
        k=k,
        salt=a.salt,
        n_rows=a.n_rows + b.n_rows,
    )


def kmv_jaccard(a: KMVSketch, b: KMVSketch) -> float:
    """Jaccard |A∩B| / |A∪B| of the two key sets: the bottom-k' of
    the union, clipped to the smaller saturation threshold so every
    membership test inside the sample is exact, scored by the
    fraction present in both sketches. Exact below saturation."""
    _check_comparable(a, b)
    sa, sb = set(a.values), set(b.values)
    union = sorted(sa | sb)
    tau = None
    if a.saturated:
        tau = a.values[-1]
    if b.saturated:
        tau = b.values[-1] if tau is None else min(tau, b.values[-1])
    if tau is not None:
        union = [v for v in union if v <= tau]
    kp = min(a.k, b.k)
    sample = union[:kp]
    if not sample:
        return 0.0
    inter = sum(1 for v in sample if v in sa and v in sb)
    return inter / len(sample)


def kmv_overlap_report(a: KMVSketch, b: KMVSketch) -> dict:
    """The corpus-overlap numbers an ingest audit wants, in one dict:
    distinct estimates for each side, the union and intersection, the
    Jaccard, and both containments (what fraction of A is inside B,
    and vice versa). All driver-side arithmetic on the two sketches;
    every value is exact when both corpora are below saturation."""
    _check_comparable(a, b)
    j = kmv_jaccard(a, b)
    da = a.distinct_estimate()
    db = b.distinct_estimate()
    union = merge_kmv(a, b).distinct_estimate()
    inter = j * union
    return {
        "jaccard": j,
        "distinct_a": da,
        "distinct_b": db,
        "distinct_union": union,
        "distinct_intersection": inter,
        "containment_a_in_b": inter / da if da > 0 else 0.0,
        "containment_b_in_a": inter / db if db > 0 else 0.0,
    }


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: str | list[str],
    k: int = 4096,
    salt: str = _DEFAULT_SALT,
) -> DataFrame:
    """Convenience wrapper: sketch both frames, return the overlap
    report as a ONE-ROW DataFrame (column names = report keys) so the
    numbers drop straight into audit tables / dashboards. Two scans
    (one per corpus), no join, driver work = O(k log k)."""
    a = kmv_sketch(df_a, cols, k=k, salt=salt)
    b = kmv_sketch(df_b, cols, k=k, salt=salt)
    rep = kmv_overlap_report(a, b)
    spark = df_a.sparkSession
    return spark.createDataFrame(
        [tuple(float(rep[c]) for c in sorted(rep))],
        ", ".join(f"{c} double" for c in sorted(rep)),
    )
