"""Packed binary embedding sketches + Hamming search — the cheapest
tier of the ANN storage/serving ladder (float32 → SQ int8 → PQ codes →
1 bit per projection). ``sign(v · h_i)`` over ``bits`` seeded Gaussian
hyperplanes (Charikar 2002 signed random projections — the same planes
``similarity.random_hyperplane_buckets`` uses for ≤62-bit LSH
bucketing, extended here to arbitrary width and PACKED into
``array<bigint>`` words), searched by Hamming distance
(XOR + popcount), optionally exact-re-ranked from the float vectors —
the binary-pre-rank pattern FAISS ships as IndexBinaryFlat/IndexLSH.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Why this tier exists when SQ/PQ already do compression:

- **Smallest footprint**: 256 bits = 32 bytes/vector — 96× smaller
  than dim-768 float32, 4× smaller than m=16 PQ codes — and sketches
  for 1e9 vectors fit in 32 GB, broadcast-able corpus-wide state that
  float vectors can never be.
- **Cheapest distance**: XOR + ``bit_count`` are single-instruction
  bit ops inside whole-stage codegen — no float math, no codebook
  lookup — so Hamming pre-ranking a candidate pool costs a fraction
  of even ADC.
- Hamming(a,b)/bits estimates θ/π (each bit disagrees with
  probability θ/π), so the pre-rank ordering converges on the true
  cosine ordering as ``bits`` grows; the exact re-rank removes the
  residual error from the final top-k.

Scale design (the part that matters at 100 TB):

- ``binarize_embeddings`` is one map-only pass. Two engines, same
  contract as ``ivf_assign_probes`` (the measured r5/r6 lesson that
  literal expression trees stop scaling): ``"expr"`` builds the packed
  words as pure codegen expressions (zero Python — right when
  bits × dim is small), ``"blas"`` is one Arrow-batched NumPy matmul +
  ``packbits`` per batch (right at dim-768 × 256 bits, where the expr
  tree would carry ~200k literals). Both produce BIT-IDENTICAL words
  (pinned), so the choice is pure cost.
- ``hamming_topk`` broadcasts the (small) query side through a
  BroadcastNestedLoopJoin — the corpus streams, nothing shuffles but
  the window's Q×N→Q×k reduction, identical shape to ``cosine_topk``
  but over 32-byte rows instead of float arrays.
- ``hamming_topk_rerank`` re-ranks ONLY the Q × rerank candidate pool
  (a broadcast semi-join against the float corpus), so full-precision
  vectors are touched for a vanishing fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from sparvi_core_spark.operators.similarity import _dot, srp_planes

WORD_BITS = 64

# expr-tree size guard: beyond this many (plane × dim) literal terms
# the analyzer cost dominates and the Arrow matmul path wins (the same
# measured threshold family as ivf_assign_probes' auto mode)
_EXPR_MAX_TERMS = 32768


def _packed_words_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Packed sign-bit words as pure codegen expressions: word w bit j
    is ``sign(v · plane[w*64+j])``, accumulated with bitwise OR (no
    overflow concerns at bit 63, unlike addition)."""
    words = []
    for w in range(0, len(planes), WORD_BITS):
        acc = F.lit(0).cast("long")
        for j, coeffs in enumerate(planes[w : w + WORD_BITS]):
            h = F.array(*[F.lit(c) for c in coeffs])
            acc = acc.bitwiseOR(
                F.when(
                    _dot(vec, h) >= 0,
                    F.shiftleft(F.lit(1).cast("long"), j),
                ).otherwise(F.lit(0).cast("long"))
            )
        words.append(acc)
    return F.array(*words)


def binarize_embeddings(
    vectors: DataFrame,
    bits: int = 256,
    seed: int = 42,
    vec_col: str = "embedding",
    out: str = "sketch",
    engine: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    """Input columns + ``out``: the ``bits``-wide SRP sign sketch
    packed little-endian into ``bits/64`` int64 words. NULL vectors
    sketch to NULL. ``bits`` must be a multiple of 64 (whole words —
    keeps Hamming distances exact with no masking).

    ``engine="expr"`` (codegen expressions) and ``"blas"``
    (Arrow-batched ``sign(V·Pᵀ)`` + ``np.packbits``) are bit-identical
    — pinned in tests; ``"auto"`` picks by ``bits × dim``. Map-only
    either way."""
    if bits < WORD_BITS or bits % WORD_BITS:
        raise ValueError(f"bits must be a positive multiple of 64, got {bits}")
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    planes = srp_planes(bits, dim, seed)
    if engine == "auto":
        engine = "expr" if bits * dim <= _EXPR_MAX_TERMS else "blas"
    if engine == "expr":
        # guard NULL vectors explicitly: when(NULL >= 0) otherwise(0)
        # would silently sketch them as all-zero words
        return vectors.withColumn(
            out,
            F.when(
                F.col(vec_col).isNotNull(),
                _packed_words_expr(F.col(vec_col), planes),
            ),
        )
    if engine != "blas":
        raise ValueError(f"unknown engine {engine!r} (expr|blas|auto)")

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    plane_mat = np.asarray(planes, dtype=np.float64)  # (bits, dim)
    out_schema = StructType(
        list(vectors.schema.fields)
        + [StructField(out, ArrayType(LongType()))]
    )

    def _kernel(batches):
        for pdf in batches:
            vals = pdf[vec_col]
            mask = vals.notna().to_numpy()
            words = np.empty(len(pdf), dtype=object)
            words[:] = None
            if mask.any():
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in vals[mask]]
                )
                signs = (mat @ plane_mat.T) >= 0  # (n, bits)
                packed = np.packbits(
                    signs, axis=1, bitorder="little"
                ).view("<i8")  # (n, bits/64) little-endian == expr path
                for i, row in zip(np.flatnonzero(mask), packed):
                    words[i] = [int(x) for x in row]
            pdf = pdf.copy()
            pdf[out] = words
            yield pdf

    return vectors.mapInPandas(_kernel, schema=out_schema)


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sketches: Σ popcount(xor)
    over words — single-instruction bit ops, no float math."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def hamming_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Brute-force Hamming top-k over packed sketches:
    ``(query_id, neighbor_id, distance, rank)``, distance ascending,
    neighbor-id ties (the search contract, mirroring ``cosine_topk``).
    Self-matches excluded; NULL sketches on either side drop out. The
    query side broadcasts; the corpus streams."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(sketch_col).alias("qs")
    ).filter(F.col("qs").isNotNull())
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(sketch_col).alias("ns")
    ).filter(F.col("ns").isNotNull())
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            hamming_distance(F.col("qs"), F.col("ns")).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hamming_topk_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Binary pre-rank + exact re-rank: Hamming top-``rerank``
    candidates per query from the sketches, then exact cosine over
    ONLY that Q × rerank pool → ``(query_id, neighbor_id, cosine,
    rank)``, cosine descending (``cosine_topk``'s contract, so recall
    tripwires compare directly). Both frames must carry ``sketch_col``
    AND ``vec_col`` (binarize both sides with the same bits/seed).

    The float corpus is touched only through a broadcast-able
    candidate join — rows(candidates) = Q × rerank regardless of
    corpus size."""
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    cands = hamming_topk(
        vectors, queries, k=rerank, id_col=id_col, sketch_col=sketch_col
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = cands.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id")
    qn = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nn = F.sqrt(_dot(F.col("nv"), F.col("nv")))
    cos = F.round(
        _dot(F.col("qv"), F.col("nv"))
        / F.when(qn * nn > 0, qn * nn),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", cos.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hamming_near_pairs(
    df: DataFrame,
    max_dist: int,
    id_col: str = "vec_id",
    sketch_col: str = "sketch",
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT all-pairs Hamming near-duplicate mining over packed
    sketches, without the all-pairs join: pigeonhole word blocking →
    ``(id_a, id_b, distance)`` for every pair with
    ``hamming ≤ max_dist`` (ids ordered ``a < b``).

    The guarantee (multi-index hashing, Norouzi et al. CVPR'12, with
    the words as the substrings — the same pigeonhole
    ``dedup.simhash_near_pairs`` uses for 64-bit SimHash): a pair
    within ``max_dist < n_words`` differs in at most ``n_words − 1``
    words, so at least ONE word matches exactly — candidate
    generation over word-equality buckets is lossless, and the exact
    distance filter removes false candidates. ``max_dist ≥ n_words``
    is refused (the guarantee would silently break) — widen the
    sketch or raise ``bits`` per word budget instead.

    Scale: candidates come from equi-join buckets keyed on
    (word index, word value) — never a cartesian; the shuffle carries
    (8-byte word, id) rows, map-side-combinable. A word value shared
    by B sketches fans out B² pairs IN THAT BUCKET ONLY;
    ``max_bucket`` drops degenerate buckets (all-zero sketches from
    zero vectors, saturated codes), with the same documented recall
    caveat as the SimHash cap: dropped buckets generate no candidates.
    NULL sketches never pair.
    """
    n_words = (
        df.select(F.max(F.size(F.col(sketch_col)))).first()[0] or 0
    )
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if max_dist >= n_words:
        raise ValueError(
            f"max_dist ({max_dist}) must be < the word count "
            f"({n_words}) for the pigeonhole guarantee to hold — use "
            f"wider sketches or hamming_topk for large radii"
        )
    base = df.select(
        F.col(id_col).alias("id"), F.col(sketch_col).alias("sk")
    ).filter(F.col("sk").isNotNull())
    words = base.select(
        "id", F.posexplode(F.col("sk")).alias("widx", "wval")
    )
    if max_bucket is not None:
        counts = words.groupBy("widx", "wval").agg(
            F.count(F.lit(1)).alias("_n")
        )
        words = words.join(
            counts.filter(F.col("_n") <= max_bucket), ["widx", "wval"]
        ).drop("_n")
    a = words.alias("a")
    b = words.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.widx") == F.col("b.widx"))
            & (F.col("a.wval") == F.col("b.wval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("sk").alias("sk_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sk").alias("sk_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            hamming_distance(F.col("sk_a"), F.col("sk_b")).alias(
                "distance"
            ),
        )
        .filter(F.col("distance") <= max_dist)
    )
