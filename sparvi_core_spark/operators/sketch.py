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


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation
# ---------------------------------------------------------------------------
#
# The point-frequency sibling of the set sketches above (Cormode &
# Muthukrishnan 2005, public): a depth × width counter matrix where
# each occurrence increments one counter per row (position =
# row-salted hash of the key mod width); the estimate for ANY key is
# the min over its depth counters — always >= the true count, and
# within eps·N (eps = e/width) with probability 1 - (1/2)^depth.
# Misra-Gries (operators.frequent) answers "WHICH keys are heavy";
# CMS answers "how often is THIS key" for keys chosen AFTER the scan,
# merges across shards/streams by elementwise addition, and costs
# depth × width counters regardless of corpus size.
#
# Scale design: the build is ONE explode(depth) + one map-side-combined
# groupBy whose result is at most depth × width rows (a 5×2048 sketch
# collects 10k rows however large the corpus); scoring a key frame is
# a BROADCAST join against that cell table — map-only over the keys.
# Hashes are md5-derived on purpose (not xxhash64): the same formula
# is re-derivable in DuckDB SQL and driver-side Python, so sketches
# are cross-engine-checkable (the oracle pair re-builds the whole CMS
# in SQL) and point queries need no Spark session.

_CMS_SALT = "sparvi-cms"
_US = "\x1f"


@dataclass(frozen=True)
class CMSketch:
    """depth × width counters + geometry. ``n_items`` is the total
    added weight N, so ``error_bound`` = e·N/width is computable
    without re-scanning."""

    counts: tuple[tuple[int, ...], ...]
    depth: int
    width: int
    salt: str
    n_items: int

    def error_bound(self) -> float:
        """eps·N with eps = e/width: an estimate exceeds the true
        count by more than this with probability < (1/2)^depth."""
        import math

        return math.e * self.n_items / self.width

    def estimate(self, *key_parts) -> int:
        """Driver-side point query (no Spark needed): min over the
        depth counters at this key's positions. Key parts are joined
        exactly as the build joined its columns."""
        import hashlib

        key = _US.join(str(p) for p in key_parts)
        best = None
        for r in range(self.depth):
            h = hashlib.md5(
                f"{self.salt}|{r}|{key}".encode()
            ).hexdigest()
            pos = int(h[:15], 16) % self.width
            c = self.counts[r][pos]
            best = c if best is None else min(best, c)
        return int(best)


def _cms_check(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError(
            f"need depth >= 1 and width >= 2, got depth={depth} width={width}"
        )
    if depth * width > 50_000_000:
        raise ValueError(
            f"depth*width = {depth * width} counters will not collect "
            f"comfortably; shrink the sketch"
        )


def _cms_pos(row_col, key_col, salt: str, width: int):
    """Counter position for (row, key): first 60 bits of
    md5('salt|row|key') mod width — byte-identical in Spark, DuckDB
    (hex-literal cast) and Python (int(hex, 16)), which is the whole
    reason this is md5 and not xxhash64."""
    h = F.md5(
        F.concat(
            F.lit(f"{salt}|"), row_col.cast("string"), F.lit("|"), key_col
        )
    )
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(width)
    )


def _cms_key(cols: list[str]):
    return F.concat_ws(_US, *[F.col(c).cast("string") for c in cols])


def _cms_cells(
    df: DataFrame,
    keys: list[str],
    depth: int,
    width: int,
    weight_col: str | None,
    salt: str,
) -> DataFrame:
    """The counter-cell frame ``(__r, __p, __c)`` — at most
    depth × width rows after the map-side-combined aggregate. The
    batch tier collects it; the streaming tier appends it to a store
    per micro-batch."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    base = df.na.drop(subset=keys).select(
        _cms_key(keys).alias("__key"), w.alias("__w")
    )
    return (
        base.withColumn(
            "__r", F.explode(F.array(*[F.lit(r) for r in range(depth)]))
        )
        .groupBy(
            F.col("__r"),
            _cms_pos(F.col("__r"), F.col("__key"), salt, width).alias("__p"),
        )
        .agg(F.sum("__w").alias("__c"))
    )


def cms_build(
    df: DataFrame,
    cols: str | list[str],
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
    salt: str = _CMS_SALT,
) -> CMSketch:
    """One pass over ``df`` → :class:`CMSketch` of the key ``cols``
    (a column name or list joined as a tuple; NULL components skip
    the row, the Bloom/KMV membership contract). ``weight_col`` adds
    that column's value per row instead of 1 (token counts, bytes).
    The shuffle carries at most depth × width cells."""
    _cms_check(depth, width)
    keys = [cols] if isinstance(cols, str) else list(cols)
    cells = _cms_cells(df, keys, depth, width, weight_col, salt).collect()
    counts = [[0] * width for _ in range(depth)]
    for r in cells:
        counts[r["__r"]][r["__p"]] = int(r["__c"])
    n = sum(counts[0]) if depth else 0
    return CMSketch(
        counts=tuple(tuple(row) for row in counts),
        depth=depth,
        width=width,
        salt=salt,
        n_items=n,
    )


def merge_cms(a: CMSketch, b: CMSketch) -> CMSketch:
    """Sketch of the concatenated corpora: elementwise counter sums —
    exactly what one build over both would produce (pinned in tests).
    Geometry and salt must match (different hashes are not addable)."""
    if (a.depth, a.width, a.salt) != (b.depth, b.width, b.salt):
        raise ValueError(
            f"sketches are not mergeable: "
            f"({a.depth}x{a.width}, {a.salt!r}) vs "
            f"({b.depth}x{b.width}, {b.salt!r})"
        )
    counts = tuple(
        tuple(x + y for x, y in zip(ra, rb))
        for ra, rb in zip(a.counts, b.counts)
    )
    return CMSketch(
        counts=counts,
        depth=a.depth,
        width=a.width,
        salt=a.salt,
        n_items=a.n_items + b.n_items,
    )


def cms_score(
    keys_df: DataFrame,
    sketch: CMSketch,
    cols: str | list[str],
    out: str = "est",
) -> DataFrame:
    """Estimated frequency for every key row in ``keys_df`` →
    the key columns plus ``out``. Map-only over the keys: the sketch's
    non-zero cells become a broadcast table (≤ depth × width rows),
    each key explodes to its depth (row, pos) probes, and the min
    comes back in one small aggregate. Duplicate key rows collapse
    (the estimate is a property of the key)."""
    keys = [cols] if isinstance(cols, str) else list(cols)
    spark = keys_df.sparkSession
    cell_rows = [
        (r, p, c)
        for r, row in enumerate(sketch.counts)
        for p, c in enumerate(row)
        if c
    ]
    cells = spark.createDataFrame(
        cell_rows or [(0, 0, 0)], "__r int, __p long, __c long"
    )
    if not cell_rows:
        cells = cells.filter(F.lit(False))
    probes = (
        keys_df.na.drop(subset=keys)
        .select(*keys, _cms_key(keys).alias("__key"))
        .distinct()
        .withColumn(
            "__r",
            F.explode(F.array(*[F.lit(r) for r in range(sketch.depth)])),
        )
        .withColumn(
            "__p",
            _cms_pos(F.col("__r"), F.col("__key"), sketch.salt, sketch.width),
        )
    )
    return (
        probes.join(F.broadcast(cells), ["__r", "__p"], "left")
        .groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("__c"), F.lit(0))).alias(out))
    )
