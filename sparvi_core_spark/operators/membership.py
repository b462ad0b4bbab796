"""Distributed Bloom-filter membership — the join-free fast path for
"have we seen this key before?" at corpus scale: build a fixed-size
bit array over a reference key set (yesterday's corpus, the eval-set
n-grams, the seen-URL list) in one pass, broadcast it, and probe any
frame MAP-ONLY — no shuffle, no join, no reference re-scan per probe.

This is the scale escape hatch for the exact-membership operators:
``novelty_screen``'s anti-join and ``decontamination``'s broadcast
n-gram join are exact but move reference data per run; a Bloom filter
is O(bits) forever after one build, at the price of a tunable
false-positive rate. The guarantee direction matters: NO FALSE
NEGATIVES — a probe that says "unseen" is always right, so dedup /
novelty / decontamination built on ``maybe_member`` can only
over-drop by ~fpp, never let a known duplicate through.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- **Hashes are computed JVM-side** (``xxhash64``), so the Arrow
  kernels only ever see two int64 columns — key bytes never cross
  into Python. Bit positions come from Kirsch–Mitzenmacher double
  hashing (h1 + i·h2 mod m), the standard trick that makes k probes
  cost two hashes.
- **Build is one pass, collect volume = partitions × m/8 bytes**:
  each partition accumulates ONE local bitmap across all its Arrow
  batches and yields a single binary row; the driver ORs them. With
  the default 1% fpp, 100M keys is ~120 MB of bits — broadcastable;
  the sizing formula is printed on the model so the caller can check
  before shipping.
- **Probe is map-only and exchange-free** (plan-pinned in tests): the
  bitmap rides a Spark broadcast, each batch is a vectorized gather.
- **Filters MERGE** (:func:`merge_blooms` is a bitwise OR): shard the
  build, union the evidence — the same sufficient-statistics contract
  as every mergeable model in this package.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_H2_SALT = "sparvi-bloom-h2"


def _hash_cols(cols: list[str]) -> tuple[Column, Column]:
    """The two JVM-side base hashes for double hashing. h2 salts the
    tuple so the pair is (close enough to) independent."""
    h1 = F.xxhash64(*[F.col(c) for c in cols])
    h2 = F.xxhash64(F.lit(_H2_SALT), *[F.col(c) for c in cols])
    return h1, h2


def bloom_params(expected_n: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: bits m = ⌈−n·ln p / ln²2⌉ (rounded up to a
    byte), hash count k = round(m/n·ln 2), both floored at sane
    minimums."""
    if expected_n <= 0:
        raise ValueError(f"expected_n must be positive, got {expected_n}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / expected_n * math.log(2)))
    return m, k


@dataclass
class BloomModel:
    """A built filter: the bit array plus its geometry. ``bits`` is a
    plain ``bytes`` (little-endian bit order within each byte), so the
    model pickles into a Spark broadcast and serializes anywhere."""

    bits: bytes
    m: int
    k: int
    n_inserted: int

    def fill_ratio(self) -> float:
        """Fraction of set bits — the saturation gauge. The expected
        fpp of a filter this full is ``fill**k``; past ~50% the filter
        was undersized for what went in."""
        import numpy as np

        arr = np.frombuffer(self.bits, dtype=np.uint8)
        return float(np.unpackbits(arr).sum()) / self.m


def _positions(h1, h2, k: int, m: int):
    """(rows × k) bit positions via double hashing, uint64 wraparound."""
    import numpy as np

    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((a[:, None] + i * b[:, None]) % np.uint64(m)).astype(np.int64)


def bloom_build(
    df: DataFrame,
    cols: str | list[str],
    expected_n: int,
    fpp: float = 0.01,
) -> BloomModel:
    """One pass over ``df`` → :class:`BloomModel` for the key
    ``cols`` (a column name or a list hashed as a tuple). NULL keys
    (any NULL component) are skipped — NULL is not a member. Size the
    filter for the real cardinality: ``expected_n`` only fixes the
    geometry, overfilling degrades fpp (watch :meth:`fill_ratio`).
    """
    import numpy as np
    import pandas as pd

    keys = [cols] if isinstance(cols, str) else list(cols)
    m, k = bloom_params(expected_n, fpp)
    h1, h2 = _hash_cols(keys)
    hashed = df.na.drop(subset=keys).select(
        h1.alias("__h1"), h2.alias("__h2")
    )

    def kern(batches):
        local = np.zeros(m // 8, dtype=np.uint8)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pos = _positions(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), k, m
            ).ravel()
            np.bitwise_or.at(local, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
            n += len(pdf)
        yield pd.DataFrame({"bits": [local.tobytes()], "n": [n]})

    parts = hashed.mapInPandas(kern, "bits binary, n long").collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    total = 0
    for r in parts:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
        total += r["n"]
    return BloomModel(bits=acc.tobytes(), m=m, k=k, n_inserted=total)


def merge_blooms(a: BloomModel, b: BloomModel) -> BloomModel:
    """Bitwise OR of two same-geometry filters ≡ the filter built over
    the union of their inserts (exact, by construction)."""
    import numpy as np

    if (a.m, a.k) != (b.m, b.k):
        raise ValueError(
            f"cannot merge blooms with different geometry: "
            f"(m={a.m}, k={a.k}) vs (m={b.m}, k={b.k})"
        )
    bits = (
        np.frombuffer(a.bits, dtype=np.uint8)
        | np.frombuffer(b.bits, dtype=np.uint8)
    ).tobytes()
    return BloomModel(
        bits=bits, m=a.m, k=a.k, n_inserted=a.n_inserted + b.n_inserted
    )


def bloom_probe(
    df: DataFrame,
    model: BloomModel,
    cols: str | list[str],
    result_col: str = "maybe_member",
) -> DataFrame:
    """``df`` + a boolean ``result_col``: False = certainly NOT in the
    build set; True = in it with probability ≈ 1−fpp. NULL keys get a
    NULL verdict. Map-only: the bitmap ships as a Spark broadcast,
    every batch is a vectorized bit-gather; zero exchanges
    (plan-pinned in tests).
    """
    import numpy as np

    keys = [cols] if isinstance(cols, str) else list(cols)
    m, k = model.m, model.k
    bc = df.sparkSession.sparkContext.broadcast(
        np.frombuffer(model.bits, dtype=np.uint8)
    )
    h1, h2 = _hash_cols(keys)
    null_key = None
    for c in keys:
        n = F.col(c).isNull()
        null_key = n if null_key is None else (null_key | n)
    # Hashes are computed UNCONDITIONALLY (xxhash64 is total — it never
    # returns NULL), with the null verdict carried in a separate boolean
    # column. Gating the hash behind F.when(...) would make the column
    # nullable, and an Arrow batch mixing NULL and non-NULL keys then
    # lands in pandas as float64 — whose 52-bit mantissa silently drops
    # low bits of the 64-bit hash on .astype(int64), yielding wrong bit
    # positions and FALSE NEGATIVES (breaking the filter's one guarantee).
    src = (
        df.withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .withColumn("__nullkey", null_key)
    )
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(result_col, T.BooleanType(), True)]
    )

    def kern(batches):
        bits = bc.value
        for pdf in batches:
            ok = ~pdf["__nullkey"].to_numpy(dtype=bool)
            verdict = np.full(len(pdf), None, dtype=object)
            if ok.any():
                pos = _positions(
                    pdf["__h1"].to_numpy()[ok].astype(np.int64),
                    pdf["__h2"].to_numpy()[ok].astype(np.int64),
                    k,
                    m,
                )
                hit = (
                    (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                ).all(axis=1)
                verdict[np.flatnonzero(ok)] = [bool(x) for x in hit]
            out = pdf.drop(columns=["__h1", "__h2", "__nullkey"])
            out[result_col] = verdict
            yield out

    return src.mapInPandas(kern, out_schema)


def bloom_novel(
    df: DataFrame,
    model: BloomModel,
    cols: str | list[str],
) -> DataFrame:
    """Keep only rows CERTAIN to be new (the no-false-negative side of
    the filter): the join-free novelty screen. Over-drops ≈ fpp of the
    genuinely-new rows; never passes a known key. NULL keys are
    dropped (unknowable)."""
    flagged = bloom_probe(df, model, cols, result_col="__maybe")
    return flagged.filter(F.col("__maybe") == F.lit(False)).drop("__maybe")
