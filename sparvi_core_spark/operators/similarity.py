"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, and a
partition-pruned (IVF-style) variant as the scale path. All math is
built-in expressions (``zip_with`` dot products folded with
``aggregate``) — JVM-side, no Python in the hot loop; the per-element
double accumulation is sequential, which makes results bit-deterministic
and oracle-comparable.

At 100 TB: brute force is O(Q×N) — only for small query sets against a
broadcastable query side; the bucketed variant prunes to matching
partitions (precomputed cluster assignments), the standard IVF
trade-off. For very high QPS, pre-normalize vectors once
(``norm_col``) so each probe is a single dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Note on the per-pair dot: an element_at-unrolled "codegen" variant
# was measured and REJECTED — at dim 16 it only matched the aggregate
# form once norms were hoisted (1.9 s vs 2.1 s per 8M pairs), and at
# dim 64 the 128-element_at expression was 6x SLOWER than aggregate
# (branchy generated code beats the JIT). The wins that stayed: hoist
# norms out of the pair loop, and the BLAS engine for dense buckets.


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine_similarity(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k: (query_id, neighbor_id, cosine, rank).

    The (small) query side is broadcast → Catalyst plans
    BroadcastNestedLoopJoin; the big vector side streams through
    without a shuffle; ranking shuffles only Q×N scored rows reduced by
    the window's top-k. Ties broken by neighbor id for determinism.
    """
    # norms are computed ONCE per side before the join (identical math,
    # sqrt(dot(v,v)), so results are bit-equal to the inline formula) —
    # the per-pair work inside the BroadcastNestedLoopJoin is a single
    # dot product. Zero-norm vectors have no direction to rank on and
    # are excluded (also keeps the division ANSI-safe).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    ).filter(F.col("qnorm") > 0)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("nnorm"),
    ).filter(F.col("nnorm") > 0)
    scored = v.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm")), 4
    )
    scored = scored.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_bucketed(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    engine: str = "expr",
) -> DataFrame:
    """IVF-style top-k: search only vectors in the query's bucket
    (cluster assignment precomputed in ``bucket_col``).

    The equi-join on the bucket key replaces the cross join — Catalyst
    broadcasts the query side and prunes every non-matching bucket, so
    cost drops from O(Q×N) to O(Q×N/buckets). Recall < 1.0 by design
    (neighbors outside the probed bucket are missed) — the classic IVF
    nprobe=1 trade-off; raise recall by probing adjacent buckets
    (``cosine_topk_ivf``).

    ``engine="blas"``: per-bucket cogrouped ``applyInPandas`` — the
    query block × corpus block cosine matrix as one BLAS matmul with
    vectorized per-query top-k, then a global window over the (tiny)
    per-bucket candidates. Same ranking contract (rounded cosine desc,
    neighbor id asc); the float64 half-even vs half-up ±1-ulp rounding
    boundary is the only possible difference, as with the near-dup
    engine. Use for big query batches; ``"expr"`` (default) is the
    decimal-exact oracle path.
    """
    if engine not in ("expr", "blas"):
        raise ValueError(f"engine must be 'expr' or 'blas', got {engine}")
    if engine == "blas":
        return _topk_bucketed_blas(
            vectors, queries, k, id_col, vec_col, bucket_col
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(bucket_col).alias("qb"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    ).filter(F.col("qnorm") > 0)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col(bucket_col).alias("nb"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("nnorm"),
    ).filter(F.col("nnorm") > 0)
    scored = v.join(F.broadcast(q), F.col("qb") == F.col("nb")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm")), 4
    )
    scored = scored.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _blas_id_ddl(df: DataFrame, id_col: str) -> tuple[str, bool]:
    """DDL type for the id column in BLAS kernel output, derived from
    the INPUT schema so both engines agree (the expr engine preserves
    the id type; hard-coding ``long`` broke string-id parity).
    Integral and string ids supported; anything else raises — match
    the expr engine by switching it on, or cast your ids.
    Returns ``(ddl_type, is_string)``."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    ddl = {
        T.ByteType: "tinyint",
        T.ShortType: "smallint",
        T.IntegerType: "int",
        T.LongType: "bigint",
        T.StringType: "string",
    }.get(type(dt))
    if ddl is None:
        raise ValueError(
            f"engine='blas' supports integral or string id columns, got "
            f"{dt.simpleString()} for {id_col!r} — cast the ids or use "
            "engine='expr'"
        )
    return ddl, isinstance(dt, T.StringType)


def _topk_bucketed_blas(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    bucket_col: str,
) -> DataFrame:
    """Bucketed top-k candidates as a cogrouped per-bucket matmul.

    Each bucket's kernel emits its LOCAL top-k per query (the exact
    value-correct set under the expression engine's ordering — rounded
    cosine desc, neighbor id asc); the global window then ranks the
    union, which for multi-probe queries (one row per probed bucket)
    merges candidates across cells. Local-top-k ⊇ contribution to
    global-top-k, so nothing is lost. NULL vectors and zero-norm rows
    excluded on both sides (the expr engine's exclusion semantics).

    The per-query selection is fully vectorized (no Python row loop):
    per block, the kk-th-largest threshold comes from one
    ``np.partition``, rows strictly above it are in, and boundary TIES
    are resolved id-ascending by a cumulative-count mask over the
    id-sorted corpus — the exact set a (cosine desc, id asc) sort
    would pick, in O(n) per query after the O(n) partition. Output
    order within the candidate set is irrelevant: the global window
    does the ranking.
    """
    import numpy as np
    import pandas as pd

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    qid_ddl, qid_is_str = _blas_id_ddl(queries, id_col)
    empty = {
        "query_id": "object" if qid_is_str else "int64",
        "neighbor_id": "object" if id_is_str else "int64",
        "cosine": "float64",
    }

    def _empty():
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in empty.items()}
        )

    def _ids(col: "pd.Series", is_str: bool) -> "np.ndarray":
        a = col.to_numpy()
        # unicode dtype: vectorized ==/argsort (object arrays are not)
        return a.astype("U") if is_str else a.astype(np.int64)

    def _bucket_topk(corp: "pd.DataFrame", qs: "pd.DataFrame") -> "pd.DataFrame":
        corp = corp[corp["__nv"].notna()]
        qs = qs[qs["__qv"].notna()]
        if corp.empty or qs.empty:
            return _empty()
        nid = _ids(corp["__nid"], id_is_str)
        V = np.stack(corp["__nv"].to_numpy()).astype(np.float64)
        vn = np.linalg.norm(V, axis=1)
        ok = vn > 0
        nid, V, vn = nid[ok], V[ok], vn[ok]
        qid = _ids(qs["__qid"], qid_is_str)
        Q = np.stack(qs["__qv"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(Q, axis=1)
        qok = qn > 0
        qid, Q, qn = qid[qok], Q[qok], qn[qok]
        n = len(nid)
        if n == 0 or len(qid) == 0:
            return _empty()
        # id-ascending corpus order makes "smallest ids among tied
        # cosines" equal to "first in column order" below
        o = np.argsort(nid, kind="stable")
        nid = nid[o]
        Vn = (V / vn[:, None])[o]
        Qn = Q / qn[:, None]
        kk = min(k, n)
        out_q, out_n, out_c = [], [], []
        for s in range(0, len(qid), _BLAS_BLOCK):
            qblk = qid[s : s + _BLAS_BLOCK]
            vals = np.round(Qn[s : s + _BLAS_BLOCK] @ Vn.T, 4)
            if id_is_str == qid_is_str:  # mixed types can't self-match
                vals[nid[None, :] == qblk[:, None]] = -np.inf  # self out
            thr = np.partition(vals, n - kk, axis=1)[:, n - kk]
            mask_gt = vals > thr[:, None]
            mask_eq = vals == thr[:, None]
            # fill the remaining (kk - #gt) slots with the id-smallest
            # ties: cumulative tie rank < need, in id-asc column order
            need = kk - mask_gt.sum(axis=1)
            eq_rank = np.cumsum(mask_eq, axis=1, dtype=np.int64) - 1
            final = mask_gt | (mask_eq & (eq_rank < need[:, None]))
            final &= np.isfinite(vals)  # rows with < kk real candidates
            ri, ci = np.nonzero(final)
            if len(ri) == 0:
                continue
            out_q.append(qblk[ri])
            out_n.append(nid[ci])
            out_c.append(vals[ri, ci])
        if not out_q:
            return _empty()
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    # per-side renames: vectors/queries often derive from the SAME
    # frame (self-search), which otherwise trips the ambiguous
    # self-join analyzer check in the cogroup
    corp = vectors.select(
        F.col(id_col).alias("__nid"),
        F.col(vec_col).alias("__nv"),
        F.col(bucket_col).alias("__bk"),
    )
    qsf = queries.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.col(bucket_col).alias("__qbk"),
    )
    cand = (
        corp.groupBy("__bk")
        .cogroup(qsf.groupBy("__qbk"))
        .applyInPandas(
            _bucket_topk,
            f"query_id {qid_ddl}, neighbor_id {id_ddl}, cosine double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "expr",
) -> DataFrame:
    """IVF top-k with QUERY-side multi-probe — the "probe adjacent
    buckets" recall knob ``cosine_topk_bucketed`` documents:

    * corpus vectors are assigned once to their single nearest
      centroid (``ivf_assign`` — at 100 TB you precompute and store
      this; here it is derived so the operator is one call);
    * each query is probed into its ``nprobe`` nearest cells
      (``ivf_assign_probes`` — queries are the small side, so the
      ×nprobe duplication is broadcast-cheap);
    * the bucket equi-join + per-query top-k window do the rest. A
      (query, neighbor) pair can arise from at most one probe (every
      corpus vector lives in exactly one cell), so no dedup is needed.

    Recall rises from IVF nprobe=1's "nearest cell only" to "union of
    the nprobe nearest cells" at ~nprobe× scan cost of the bucketed
    search — still O(Q × N × nprobe / buckets) vs brute force's
    O(Q × N). With precomputed corpus buckets, skip this wrapper and
    feed ``cosine_topk_bucketed`` the probed query frame directly.
    """
    va = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col("id").alias(id_col), "bucket"
    )
    v = vectors.join(va, id_col)
    qp = ivf_assign_probes(
        queries, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias(id_col), "bucket")
    q = queries.join(qp, id_col)
    return cosine_topk_bucketed(
        v, q, k=k, id_col=id_col, vec_col=vec_col, bucket_col="bucket",
        engine=engine,
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    mode: str = "mean",
    weight_col: str | None = None,
    normalize: bool = False,
    out: str = "embedding",
) -> DataFrame:
    """Pool chunk-level embeddings into ONE vector per group — the
    bridge from ``chunk_documents`` → encoder → chunk vectors back up
    to document-level ANN/dedup (the pooled column drops straight into
    ``cosine_topk`` / ``semantic_dedup``).

    ``mode="mean"`` is element-wise average (optionally weighted by
    ``weight_col`` — weight by the chunk's token count so short tail
    chunks don't dominate); ``"max"`` is element-wise max. With
    ``normalize=True`` the pooled vector is L2-normalized (all-zero
    vectors stay zero). NULL vectors are ignored; a group with only
    NULLs drops out.

    Plan: posexplode → groupBy(group, pos) agg → rebuild ordered
    array — one shuffle of O(rows × dim), map-side combined; the same
    shape as ``compute_centroids`` (which is this function with
    unweighted mean, keyed by cluster label).
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode}")
    if weight_col is not None and mode != "mean":
        raise ValueError("weight_col only applies to mode='mean'")
    cols = [F.col(group_col).alias("__g"), F.posexplode(F.col(vec_col)).alias("pos", "val")]
    if weight_col is not None:
        cols.insert(1, F.col(weight_col).cast("double").alias("__w"))
    ex = df.filter(F.col(vec_col).isNotNull()).select(*cols)
    v = F.col("val").cast("double")
    if mode == "max":
        agg = F.max(v)
    elif weight_col is not None:
        agg = F.sum(v * F.col("__w")) / F.sum(F.col("__w"))
    else:
        agg = F.avg(v)
    m = ex.groupBy("__g", "pos").agg(agg.alias("v"))
    pooled = (
        m.groupBy("__g")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            F.col("__g").alias(group_col),
            F.transform("pv", lambda s: s["v"]).alias(out),
        )
    )
    if normalize:
        nrm = F.sqrt(_dot(F.col(out), F.col(out)))
        pooled = pooled.select(
            group_col,
            F.when(nrm > 0, F.transform(F.col(out), lambda x: x / nrm))
            .otherwise(F.col(out))
            .alias(out),
        )
    return pooled


def compute_centroids(
    vectors: DataFrame,
    bucket_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build step: per-bucket centroid = element-wise mean.

    posexplode → groupBy(bucket, pos) avg → rebuild ordered arrays.
    Shuffle volume O(N × dim) once at build time; centroid table is
    tiny (buckets × dim) and broadcastable ever after.
    """
    ex = vectors.select(
        F.col(bucket_col).alias("bucket"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    m = ex.groupBy("bucket", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("v")
    )
    return (
        m.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("bucket", F.transform("pv", lambda s: s["v"]).alias("centroid"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment: nearest centroid (L2) per vector →
    (id, bucket, distance).

    Centroid table broadcast; per-vector work is #buckets distance
    evaluations; ``min_by`` picks the argmin without a window sort.
    NULL vectors get no assignment (no distance to rank on) — the
    contract shared by every assignment strategy in this module.
    """
    v = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    c = centroids.select("bucket", "centroid")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("v"),
                F.col("centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "id", "bucket", dist.alias("distance")
    )
    return scored.groupBy("id").agg(
        F.min_by(F.col("bucket"), F.col("distance")).alias("bucket"),
        F.round(F.min("distance"), 4).alias("distance"),
    )


LITERAL_CENTROID_MAX = 256  # auto flips to the join strategy above this


def ivf_assign_probes(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
) -> DataFrame:
    """Multi-probe IVF assignment: the ``nprobe`` nearest centroids
    (L2) per vector → (id, bucket, probe, distance), ``probe`` = 0 for
    the nearest. Both strategies produce IDENTICAL output (distances
    rounded to 4, ties broken by bucket).

    ``strategy="literal"``: centroids are collected (bounded: k × dim
    doubles — the same driver-size contract as ``kmeans_fit``) and
    embedded as literal expressions; the top-``nprobe`` selection is
    ONE projection (k distance expressions + ``array_sort`` +
    ``slice`` + explode) — no shuffle. The literal expression tree
    grows as k × dim: fine at hundreds of centroids, pathological at
    tens of thousands (codegen and analysis blow up).

    ``strategy="join"``: the centroid table is aggregated into ONE row
    holding ``array<struct<bucket, centroid>>`` and broadcast; each
    vector computes all k distances via ``transform`` over that array
    — the centroids ride as DATA, so the expression tree is constant
    size regardless of k. Still no shuffle on the corpus (the
    single-row side broadcasts; the tiny centroid agg is the only
    exchange). This is the 100 TB path for k in the tens of thousands
    (k ≈ √N): per-vector cost is k distance evals either way, but the
    plan compiles in O(1).

    ``strategy="blas"``: centroids are collected (the same driver-size
    contract), shipped once per executor as a broadcast NumPy matrix,
    and each Arrow batch computes ALL k distances as one blocked
    ``V @ C.T`` matmul with a vectorized exact top-``nprobe``
    selection (ties by bucket ascending, like the other strategies).
    Same output modulo the documented float64 half-even vs half-up
    ±1-ulp rounding boundary at the 4th decimal (the contract every
    BLAS kernel in this module carries). This is the THROUGHPUT path
    at large k: the expression strategies evaluate ~tens of millions
    of interpreted distance terms per second, the matmul hundreds of
    times that.

    ``strategy="auto"`` (default) counts the (tiny) centroid table and
    picks ``literal`` at ≤ ``LITERAL_CENTROID_MAX`` centroids, else
    ``join`` — callers like ``semantic_dedup`` / ``cosine_topk_ivf``
    scale across the k regimes without a knob. ``blas`` is opt-in
    (decimal-exact expression engines stay the oracle default, as
    everywhere in this module).
    """
    if strategy not in ("auto", "literal", "join", "blas"):
        raise ValueError(
            "strategy must be 'auto', 'literal', 'join' or 'blas', "
            f"got {strategy}"
        )
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if strategy == "auto":
        n_cents = centroids.count()  # tiny: bounded by centroid contract
        strategy = "literal" if n_cents <= LITERAL_CENTROID_MAX else "join"
        if nprobe > n_cents:
            raise ValueError(
                f"nprobe={nprobe} exceeds the number of centroids ({n_cents})"
            )
    if strategy == "join":
        return _ivf_assign_probes_join(
            vectors, centroids, nprobe, id_col, vec_col
        )
    if strategy == "blas":
        return _ivf_assign_probes_blas(
            vectors, centroids, nprobe, id_col, vec_col
        )
    cents = centroids.collect()  # bounded by the centroid contract
    if nprobe > len(cents):
        raise ValueError(
            f"nprobe={nprobe} exceeds the number of centroids ({len(cents)})"
        )
    v = F.col(vec_col)

    def _d2(c):
        arr = F.array(*[F.lit(float(x)) for x in c["centroid"]])
        return F.aggregate(
            F.zip_with(
                v, arr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.round(F.sqrt(_d2(c)), 4).alias("distance"),
                    F.lit(c["bucket"]).alias("bucket"),
                )
                for c in cents
            ]
        )
    )
    probes = F.slice(scored, 1, nprobe)
    return (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"), F.posexplode(probes).alias("probe", "s")
        )
        .select("id", F.col("s.bucket").alias("bucket"), "probe",
                F.col("s.distance").alias("distance"))
    )


def _ivf_assign_probes_join(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The large-k multi-probe strategy: centroids as broadcast DATA.

    ``collect_list(struct(bucket, centroid))`` packs the centroid table
    into one row; a broadcast nested-loop join (1 row × corpus) hands
    every vector the array, and one projection does
    ``transform`` (k distance structs) → ``array_sort`` →
    ``slice(nprobe)`` → ``posexplode``. No literal tree, no corpus
    shuffle, no window. Validation (nprobe ≤ k) costs one count on the
    tiny centroid frame."""
    n_cents = centroids.count()
    if nprobe > n_cents:
        raise ValueError(
            f"nprobe={nprobe} exceeds the number of centroids ({n_cents})"
        )
    packed = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(
                    F.col("bucket"),
                    F.col("centroid").cast("array<double>").alias("centroid"),
                )
            ).alias("__cents")
        )
    )
    v = F.col(vec_col)

    def _score(c):
        d2 = F.aggregate(
            F.zip_with(
                v,
                c["centroid"],
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.struct(
            F.round(F.sqrt(d2), 4).alias("distance"),
            c["bucket"].alias("bucket"),
        )

    probes = F.slice(
        F.array_sort(F.transform(F.col("__cents"), _score)), 1, nprobe
    )
    return (
        vectors.filter(F.col(vec_col).isNotNull())
        .crossJoin(packed)
        .select(
            F.col(id_col).alias("id"), F.posexplode(probes).alias("probe", "s")
        )
        .select(
            "id",
            F.col("s.bucket").alias("bucket"),
            "probe",
            F.col("s.distance").alias("distance"),
        )
    )


def _ivf_assign_probes_blas(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-k multi-probe assignment as a broadcast matmul.

    The centroid table is collected once (k × dim doubles — the
    driver-size contract shared with ``kmeans_fit``) and shipped via a
    torrent broadcast; each Arrow batch computes
    ``d² = |v|² + |c|² − 2·V@Cᵀ`` in ``_BLAS_BLOCK``-row blocks (so
    memory is O(block × k), never batch × k), rounds to 4, and takes
    the exact nprobe smallest per row with ties resolved bucket-
    ascending — the same threshold-plus-cumulative-tie-rank selection
    as the top-k search kernel, on a bucket-sorted centroid axis.
    Map-only: no shuffle, no window. NULL vectors get no assignment —
    the contract shared by every assignment strategy in this module.
    """
    import numpy as np
    import pandas as pd

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    bucket_ddl = centroids.schema["bucket"].dataType.simpleString()
    rows = sorted(centroids.collect(), key=lambda r: r["bucket"])
    n_cents = len(rows)
    if nprobe > n_cents:
        raise ValueError(
            f"nprobe={nprobe} exceeds the number of centroids ({n_cents})"
        )
    buckets = np.array([r["bucket"] for r in rows], dtype=np.int64)
    C = np.array(
        [[float(x) for x in r["centroid"]] for r in rows], dtype=np.float64
    )
    bc = vectors.sparkSession.sparkContext.broadcast((buckets, C))

    def kern(batches):
        bks, Cm = bc.value
        cn2 = (Cm * Cm).sum(axis=1)
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            ids = ids.astype("U") if id_is_str else ids.astype(np.int64)
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            for s in range(0, len(ids), _BLAS_BLOCK):
                Vb = V[s : s + _BLAS_BLOCK]
                vn2 = (Vb * Vb).sum(axis=1)
                d2 = vn2[:, None] + cn2[None, :] - 2.0 * (Vb @ Cm.T)
                d = np.round(np.sqrt(np.maximum(d2, 0.0)), 4)
                # exact nprobe smallest, ties bucket-asc: threshold =
                # nprobe-th smallest; strictly-below rows are in, tied
                # slots fill in bucket order (columns are bucket-sorted)
                thr = np.partition(d, nprobe - 1, axis=1)[:, nprobe - 1]
                lt = d < thr[:, None]
                eq = d == thr[:, None]
                need = nprobe - lt.sum(axis=1)
                eq_rank = np.cumsum(eq, axis=1, dtype=np.int64) - 1
                final = lt | (eq & (eq_rank < need[:, None]))
                ri, ci = np.nonzero(final)
                dist = d[ri, ci]
                # probe index = rank within the row's selection by
                # (distance, bucket): stable row-major nonzero gives
                # bucket-asc within rows; argsort by distance per row
                order = np.lexsort((ci, dist, ri))
                ri, ci, dist = ri[order], ci[order], dist[order]
                probe = np.arange(len(ri)) - np.searchsorted(
                    ri, ri, side="left"
                )
                yield pd.DataFrame(
                    {
                        "id": ids[s + ri],
                        "bucket": bks[ci],
                        "probe": probe,
                        "distance": dist,
                    }
                )

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kern,
        f"id {id_ddl}, bucket {bucket_ddl}, probe int, distance double",
    )


def _kmeans_parallel_init(
    vectors: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    seed: int,
    rounds: int = 5,
    oversample: int | None = None,
) -> dict[int, list[float]]:
    """k-means|| seeding (Bahmani et al., VLDB'12 — the init Spark
    MLlib uses): ``rounds`` passes each draw ~``oversample`` candidates
    with probability ∝ d²(x, C) (weighted WOR via Efraimidis-Spirakis
    keys on a deterministic ``xxhash64(id, seed, round)`` uniform —
    every draw is a bounded ``TakeOrderedAndProject``, layout-invariant
    and append-stable), then the ≤ rounds×oversample+1 candidates are
    weighted by how many points they serve (one broadcast argmin pass)
    and reduced to k centers driver-side with weighted k-means++.

    Cost: 2 scans per round + 1 weighting scan, all with broadcast
    candidate sets — no corpus shuffle anywhere. Driver state is
    O(rounds × oversample × dim)."""
    import numpy as np

    l = oversample if oversample is not None else 2 * k
    base = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    first = (
        base.orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kmeans init: no non-NULL vectors to seed from")
    cand = [[float(x) for x in first[0]["v"]]]

    def _cand_df(spark):
        return F.broadcast(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(cand)],
                "bucket int, centroid array<double>",
            )
        )

    spark = vectors.sparkSession
    for r in range(rounds):
        assigned = ivf_assign(base, _cand_df(spark), id_col="id", vec_col="v")
        # A-ES weighted-WOR keys with w = d²: the l smallest keys are
        # an exactly-weighted without-replacement draw (the
        # weighted_hash_sample argument), deterministic per (seed, r)
        u = (
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(seed), F.lit(r)),
                F.lit(1_000_003),
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(1_000_003.0)
        w = F.col("distance") * F.col("distance")
        drawn = (
            assigned.filter(w > 0)
            .join(base, "id")
            .withColumn("__key", -F.log(u) / w)
            .orderBy("__key")
            .limit(l)
            .select("v")
            .collect()
        )
        if not drawn:
            break  # every point sits on a candidate already
        cand.extend([float(x) for x in row["v"]] for row in drawn)
        # dedupe exact repeats so the driver step sees distinct centers
        seen, uniq = set(), []
        for c in cand:
            t = tuple(c)
            if t not in seen:
                seen.add(t)
                uniq.append(c)
        cand = uniq
    # weight candidates by the population they serve, then reduce to k
    assigned = ivf_assign(base, _cand_df(spark), id_col="id", vec_col="v")
    wrows = assigned.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    weights = np.zeros(len(cand))
    for row in wrows:
        weights[row["bucket"]] = float(row["n"])
    pts = np.array(cand)
    if len(pts) <= k:
        return {i: [float(x) for x in p] for i, p in enumerate(pts)}

    # driver-side reduce: weighted k-means++ with restarts, each
    # refined by weighted Lloyd on the candidate set, best potential
    # wins (the MLlib recipe) — one probabilistic draw can still
    # double-pick a dense region; ten draws on ~2k·rounds points cost
    # microseconds and make that practically impossible
    def _potential(C):
        d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        return float((weights * d2).sum())

    best, best_pot = None, None
    for trial in range(10):
        rng = np.random.default_rng((seed, trial))
        centers = [int(rng.choice(len(pts), p=weights / weights.sum()))]
        d2 = ((pts - pts[centers[0]]) ** 2).sum(axis=1)
        for _ in range(k - 1):
            probs = weights * d2
            if probs.sum() <= 0:
                break
            nxt = int(rng.choice(len(pts), p=probs / probs.sum()))
            centers.append(nxt)
            d2 = np.minimum(d2, ((pts - pts[nxt]) ** 2).sum(axis=1))
        C = pts[centers].astype(float)
        for _ in range(20):  # weighted Lloyd on the candidates
            a = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(
                axis=1
            )
            newC = C.copy()
            for j in range(len(C)):
                wj = weights[a == j]
                if wj.sum() > 0:
                    newC[j] = (
                        pts[a == j] * wj[:, None]
                    ).sum(axis=0) / wj.sum()
            if np.allclose(newC, C):
                break
            C = newC
        pot = _potential(C)
        if best_pot is None or pot < best_pot:
            best, best_pot = C, pot
    return {i: [float(x) for x in c] for i, c in enumerate(best)}


def kmeans_fit(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
    init: str = "hash",
) -> tuple[DataFrame, dict]:
    """Lloyd k-means over an embedding column — the IVF BUILD step
    (``compute_centroids`` + ``ivf_assign`` refine a labeling; this
    creates one from scratch). Returns ``(centroids, info)`` where
    ``centroids`` is the ``(bucket, centroid)`` frame ``ivf_assign``
    consumes and ``info = {"iterations", "converged", "movement"}``.

    Init (``init=``): ``"hash"`` (default) seeds with the corpus's k
    smallest ``xxhash64(id, seed)`` values — deterministic across
    runs, partitionings, and appends-with-new-ids, and a uniform draw
    (the same argument as ``sampling.hash_sample``) — but uniform
    seeding falls into split/merge local optima on clustered data
    (measured: ~half of seeds miscluster 3 well-separated blobs);
    ``"parallel"`` runs k-means|| seeding (:func:`_kmeans_parallel_init`
    — d²-weighted candidate rounds + driver-side weighted k-means++),
    which recovers the blobs on every seed in the same sweep, at the
    cost of ~2 extra scans per seeding round. Each iteration is one
    assign (broadcast centroids, ``min_by`` argmin — no window) and one
    centroid rebuild (posexplode + map-side-combined avg): two shuffles
    of O(N × dim) per round, the canonical distributed-Lloyd shape
    (Spark MLlib's KMeans does the same reduce-collect per step).
    Driver state is k × dim doubles — broadcast-sized by construction.

    Empty clusters keep their previous centroid (documented standard
    fallback; reseeding would break determinism). Convergence = max
    centroid L2 movement ≤ ``tol``. Iterative fixpoint → no SQL oracle
    (same class as ``dedup_clusters``); correctness is pinned by
    recovering planted separable clusters in tests.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if init not in ("hash", "parallel"):
        raise ValueError(f"init must be 'hash' or 'parallel', got {init!r}")
    spark = vectors.sparkSession
    if init == "parallel":
        cents = _kmeans_parallel_init(
            vectors, k, id_col=id_col, vec_col=vec_col, seed=seed
        )
    else:
        seeds = (
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
            .limit(k)  # TakeOrderedAndProject: no global sort materialized
            .collect()
        )
        cents = {
            i: [float(x) for x in r["v"]] for i, r in enumerate(seeds)
        }
    info = {"iterations": 0, "converged": False, "movement": None}

    def _cent_df():
        return F.broadcast(
            spark.createDataFrame(
                [(b, c) for b, c in cents.items()],
                "bucket int, centroid array<double>",
            )
        )

    for it in range(max_iter):
        assigned = ivf_assign(vectors, _cent_df(), id_col=id_col, vec_col=vec_col)
        labeled = vectors.join(
            assigned, vectors[id_col] == assigned["id"]
        ).select(assigned["bucket"].alias("label"), vectors[vec_col])
        new_rows = compute_centroids(
            labeled, bucket_col="label", vec_col=vec_col
        ).collect()  # bounded: k rows x dim doubles
        movement = 0.0
        for r in new_rows:
            old = cents[r["bucket"]]
            new = [float(x) for x in r["centroid"]]
            movement = max(
                movement,
                sum((a - b) ** 2 for a, b in zip(old, new)) ** 0.5,
            )
            cents[r["bucket"]] = new
        info["iterations"] = it + 1
        info["movement"] = movement
        if movement <= tol:
            info["converged"] = True
            break
    return _cent_df(), info


def random_hyperplane_buckets(
    vectors: DataFrame,
    planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Sign-LSH (signed random projections): bucket id = the bit-string
    of ``sign(v · h_i)`` over ``planes`` seeded Gaussian hyperplanes —
    the embedding-space analog of SimHash. Two vectors at cosine angle
    θ agree on each bit with probability 1 − θ/π, so cosine-near
    vectors collide; use the result as ``bucket_col`` for
    ``embedding_near_duplicates`` (or a pre-filter for
    ``cosine_topk_bucketed``) when no trained IVF assignment exists —
    unlike IVF it needs NO build pass over the corpus.

    Plan: ``planes`` dot products per row, all JVM expressions inside
    one projection — no shuffle, no Python. The hyperplanes are
    driver-generated literals (seeded → deterministic across runs and
    engines). Recall knob: fewer planes → bigger buckets → higher
    recall and cost; 2^planes buckets at 16 planes. Near-dups straddling
    a boundary land in different buckets (multi-probe or a second seed
    recovers them) — same trade-off documented for IVF nprobe=1.
    """
    if not 1 <= planes <= 62:
        # bucket bits live in one signed 64-bit long
        raise ValueError(f"planes must be in [1, 62], got {planes}")
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for i, coeffs in enumerate(srp_planes(planes, dim, seed)):
        h = F.array(*[F.lit(c) for c in coeffs])
        bucket = bucket + F.when(_dot(v, h) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return vectors.withColumn(out, bucket)


def srp_planes(planes: int, dim: int, seed: int) -> list[list[float]]:
    """The seeded Gaussian hyperplanes behind the SRP bucketing —
    shared by :func:`random_hyperplane_buckets` and
    :func:`random_hyperplane_probes` so their bit assignments agree,
    and public so callers (and tests) can reproduce bucket membership
    off-cluster."""
    import random as _random

    rnd = _random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def random_hyperplane_probes(
    vectors: DataFrame,
    planes: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
    out: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe sign-LSH: each vector is emitted once for its base
    SRP bucket AND once per bucket obtained by flipping each of its
    ``nprobe - 1`` lowest-|margin| bits — the bits most likely to
    disagree for a true near-neighbor (multi-probe LSH, Lv et al.
    2007). Feed the exploded frame to ``embedding_near_duplicates``
    (then ``distinct()``) to recover boundary pairs that single-bucket
    SRP misses, at ~``nprobe``× candidate cost instead of the
    ``2**planes``-fold cost of re-hashing with more seeds.

    Output: input columns + ``out`` (long bucket id), one row per
    probed bucket. Plan: still a single projection + explode — the
    margin ranking is ``array_sort`` over (|dot|, bit) structs, all
    JVM expressions, no shuffle. ``nprobe=1`` reduces to exactly
    ``random_hyperplane_buckets``'s assignment (same planes, same
    seed).
    """
    if not 1 <= planes <= 62:
        raise ValueError(f"planes must be in [1, 62], got {planes}")
    if not 1 <= nprobe <= planes + 1:
        raise ValueError(f"nprobe must be in [1, planes+1], got {nprobe}")
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    v = F.col(vec_col)
    dots = [
        _dot(v, F.array(*[F.lit(c) for c in coeffs]))
        for coeffs in srp_planes(planes, dim, seed)
    ]
    base = F.lit(0).cast("long")
    for i, d in enumerate(dots):
        base = base + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast(
            "long"
        )
    margins = F.array(
        *[
            F.struct(
                F.abs(d).alias("m"), F.lit(1 << i).cast("long").alias("bit")
            )
            for i, d in enumerate(dots)
        ]
    )
    flips = F.slice(F.array_sort(margins), 1, nprobe - 1)
    buckets = F.array_union(
        F.array(base),
        F.transform(flips, lambda s: base.bitwiseXOR(s["bit"])),
    )
    return vectors.withColumn(out, F.explode(buckets))


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    max_bucket: int | None = None,
    salt_buckets: int | None = None,
    engine: str = "expr",
) -> DataFrame:
    """All pairs with cosine ≥ threshold → (id_a, id_b, cosine).

    With ``bucket_col`` the pair join is bucket-local (near-dups almost
    always share a cluster); without it, all-pairs — correctness
    baseline only.

    Per-pair work is ONE dot product: norms are projected once per
    ROW before the join instead of twice per pair (measured 3.8× on
    an 8M-pair bucket vs the inline cosine; an element_at-unrolled
    dot was also tried and rejected — see the module note).

    ``max_bucket`` guards the quadratic term: buckets with more than
    ``max_bucket`` members are DROPPED from the pair search (their
    member count makes them useless as similarity evidence — a
    degenerate k-means fit or an over-coarse LSH; the same cap
    contract as LSH ``max_bucket``). Off by default: bucket-local
    pairs are the documented cost model.

    ``salt_buckets=S`` splits each bucket's pair work across S tasks:
    the left side is sliced by a row hash, the right side replicated
    into every slice, and the join key becomes (bucket, slice). Each
    pair is produced EXACTLY once (a row owns one slice), so results
    are identical — this is purely a parallelism knob for big
    clusters, whose pair evaluation otherwise runs in one task per
    bucket under a sort-merge join. Cost: the right side shuffles S×.
    At real scale prefer AQE skew-join splitting when partitions are
    large enough to trigger it; the salt works at any size.

    ``engine="blas"`` (bucketed input only) replaces the join + one
    expression per pair with an Arrow-batched ``applyInPandas`` per
    bucket: normalize once, then a BLOCKED ``Vn[s:s+B] @ Vn.T``
    matmul (NumPy → BLAS, SIMD) and a vectorized threshold. Identical
    pair set; measured 13× over the expression join on a 100M-pair
    bucket-local search (SCALE.md). Memory per task is
    O(block × bucket) floats, bounded by the 2048-row block. Cosines
    round half-even in float64 vs the expression engine's half-up
    decimal — a ±1-ulp boundary case at the 4th decimal; keep
    ``"expr"`` where decimal-exact oracle comparison matters (the
    default, and what the pinned queries use).
    """
    if engine not in ("expr", "blas"):
        raise ValueError(f"engine must be 'expr' or 'blas', got {engine}")
    if engine == "blas" and not bucket_col:
        raise ValueError("engine='blas' needs a bucket_col (bucketed search)")
    if bucket_col and max_bucket is not None:
        sizes = vectors.groupBy(F.col(bucket_col)).agg(
            F.count(F.lit(1)).alias("__bn")
        )
        keep = F.broadcast(
            sizes.filter(F.col("__bn") <= max_bucket).select(bucket_col)
        )
        vectors = vectors.join(keep, bucket_col)
    if engine == "blas":
        return _near_dup_pairs_blas(
            vectors, threshold, id_col, vec_col, bucket_col
        )
    # zero-norm vectors (corrupt payloads embed to zeros upstream) have
    # no direction to match on — excluded BEFORE the join, which also
    # keeps the per-pair division ANSI-safe
    prenormed = vectors.withColumn(
        "__nrm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    ).filter(F.col("__nrm") > 0)
    a = prenormed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("__nrm").alias("na"),
        *([F.col(bucket_col).alias("ba")] if bucket_col else []),
    )
    b = prenormed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("__nrm").alias("nb"),
        *([F.col(bucket_col).alias("bb")] if bucket_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if bucket_col:
        if salt_buckets is not None and salt_buckets > 1:
            spark = vectors.sparkSession
            slices = F.broadcast(
                spark.range(salt_buckets).select(F.col("id").alias("__sl"))
            )
            a = a.withColumn(
                "__sl", F.pmod(F.xxhash64(F.col("id_a")), F.lit(salt_buckets))
            )
            b = b.crossJoin(slices)
            joined = a.join(
                b,
                (F.col("ba") == F.col("bb"))
                & (a["__sl"] == b["__sl"])
                & cond,
            )
        else:
            joined = a.join(b, (F.col("ba") == F.col("bb")) & cond)
    else:
        joined = a.crossJoin(b).filter(cond)
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
    )
    return joined.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


_BLAS_BLOCK = 2048  # rows of the left operand per matmul step


def _near_dup_pairs_blas(
    vectors: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    bucket_col: str,
) -> DataFrame:
    """Bucket-local pair search as a blocked BLAS matmul per bucket.

    One Arrow group per bucket: vectors are unit-normalized once, then
    ``Vn[s:s+B] @ Vn.T`` produces the cosine block and a vectorized
    comparison extracts the surviving pairs. Group memory is
    O(bucket × dim) for the matrix plus O(B × bucket) for one cosine
    block — never the full n² — so a capped bucket fits comfortably.
    NULL vectors are dropped and zero vectors never match (norm 0 →
    excluded), matching the expression engine's exclusion semantics;
    the id output type follows the INPUT schema (integral or string),
    matching the expr engine's type preservation.
    """
    import numpy as np
    import pandas as pd

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    id_dtype = "object" if id_is_str else "int64"

    def _bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf[pdf[vec_col].notna()]
        if pdf.empty:
            ids = np.array([], dtype="U1" if id_is_str else np.int64)
        else:
            ids = pdf[id_col].to_numpy()
            ids = ids.astype("U") if id_is_str else ids.astype(np.int64)
        n = len(ids)
        if n >= 2:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(V, axis=1)
            ok = nrm > 0
            ids, V, nrm = ids[ok], V[ok], nrm[ok]
            n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=id_dtype),
                    "id_b": pd.Series([], dtype=id_dtype),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        Vn = V / nrm[:, None]
        out_a, out_b, out_c = [], [], []
        for s in range(0, n, _BLAS_BLOCK):
            block = Vn[s : s + _BLAS_BLOCK] @ Vn.T  # B×n cosine block
        # round to 4 like the expression engine (float64 half-even —
        # the documented ±1-ulp boundary difference)
            blk = np.round(block, 4)
            ia, ib = np.nonzero(blk >= threshold)
            ia = ia + s
            keep = ids[ia] < ids[ib]
            out_a.append(ids[ia][keep])
            out_b.append(ids[ib][keep])
            out_c.append(blk[ia - s, ib][keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return (
        vectors.select(F.col(id_col), F.col(vec_col), F.col(bucket_col))
        .groupBy(bucket_col)
        .applyInPandas(
            lambda pdf: _bucket_pairs(pdf),
            f"id_a {id_ddl}, id_b {id_ddl}, cosine double",
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str | None = None,
    kmeans_iter: int = 10,
    seed: int = 42,
    nprobe: int = 1,
    max_bucket: int | None = None,
    salt_buckets: int | None = None,
    engine: str = "expr",
) -> tuple[DataFrame, dict]:
    """SemDeDup (Abbas et al. 2023): drop semantic near-duplicates —
    documents whose EMBEDDINGS nearly coincide even when their text
    differs (paraphrases, re-renderings, templated rewrites that every
    lexical dedup misses).

    Composition of the module's scale-safe pieces:

    1. :func:`kmeans_fit` partitions the embedding space
       (``n_clusters`` buckets — at 100 TB use √N-ish);
    2. :func:`ivf_assign` labels every vector (broadcast centroids,
       no shuffle);
    3. :func:`embedding_near_duplicates` finds cosine-≥-threshold
       pairs BUCKET-LOCALLY — the SemDeDup trick: pair search never
       crosses cluster boundaries, so the quadratic term is bounded by
       the largest cluster, not the corpus;
    4. ``dedup.dedup_clusters`` merges pairs into groups (min-id
       label);
    5. survivors: the min-id member of each group, or the
       highest-``score_col`` member (quality-aware) when given —
       ``dedup.select_cluster_representatives``.

    Returns ``(survivors, report)``: survivors has the input's columns,
    one row per semantic group plus every singleton; ``report`` carries
    ``kmeans`` (iterations/convergence), and the lazy ``pairs`` /
    ``clusters`` frames for inspection or persistence.

    Recall caveat (inherent to SemDeDup, documented not hidden): at
    ``nprobe=1`` a near-dup pair split across two k-means clusters is
    missed. Published SemDeDup accepts this (duplicates cluster
    together by construction). ``nprobe=2`` recovers boundary pairs —
    each vector joins the pair search in its top-2 clusters (the
    standard IVF nprobe trade-off); the nprobe=1 plan is untouched at
    the default, and duplicate candidate pairs from shared probes
    collapse with one ``distinct``. Cost caveat (measured, not
    guessed — stress_bench `semantic_*`): with FEW well-separated
    clusters the second choices CONCENTRATE on the most central
    centroid, so candidate work can grow well beyond 2× (a 16k-vector
    / 8-cluster corpus grew ~6×, piling 12.5k vectors into one probe
    bucket). At SemDeDup's intended √N-ish cluster counts second
    choices spread out; either way ``engine="blas"`` absorbs the
    density and ``max_bucket`` bounds the worst case.

    ``max_bucket`` (off by default) is the degenerate-fit guard: a
    k-means run that collapses most of the corpus into one cluster
    turns the bucket-local pair search into a single-task all-pairs.
    With the cap, clusters above ``max_bucket`` members are dropped
    from the pair search (their pairs are lost — re-fit with more
    clusters or another seed; the honest trade is a bounded job over
    a silently quadratic one, the same contract as LSH ``max_bucket``).
    ``salt_buckets`` is the parallelism knob for big (legitimate)
    clusters — see ``embedding_near_duplicates``.
    """
    from sparvi_core_spark.operators.dedup import (
        dedup_clusters,
        select_cluster_representatives,
    )

    centroids, kinfo = kmeans_fit(
        vectors,
        k=n_clusters,
        id_col=id_col,
        vec_col=vec_col,
        max_iter=kmeans_iter,
        seed=seed,
    )
    if nprobe == 1:
        assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
        probe_cols = assigned.select(
            F.col("id").alias(id_col), F.col("bucket").alias("__sem_bucket")
        )
    else:
        assigned = ivf_assign_probes(
            vectors, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col
        )
        probe_cols = assigned.select(
            F.col("id").alias(id_col), F.col("bucket").alias("__sem_bucket")
        )
    # nprobe > 1: each vector appears once per probed cluster, so the
    # bucket-local pair join sees boundary pairs in their shared
    # second-choice cluster; shared probes produce duplicate candidate
    # pairs, collapsed below
    labeled = vectors.join(probe_cols, id_col)
    pairs = embedding_near_duplicates(
        labeled,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col="__sem_bucket",
        max_bucket=max_bucket,
        salt_buckets=salt_buckets,
        engine=engine,
    )
    if nprobe > 1:
        pairs = pairs.distinct()
    clusters = dedup_clusters(pairs)
    if score_col is not None:
        survivors = select_cluster_representatives(
            vectors, clusters, score_col=score_col, id_col=id_col
        )
    else:
        losers = clusters.filter(F.col("id") != F.col("cluster")).select(
            F.col("id").alias(id_col)
        )
        survivors = vectors.join(losers, id_col, "left_anti")
    report = {"kmeans": kinfo, "pairs": pairs, "clusters": clusters}
    return survivors, report
