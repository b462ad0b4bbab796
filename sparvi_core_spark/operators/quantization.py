"""Product quantization for embedding columns: 10-100x vector
compression with sub-percent search-quality loss — the storage path
that makes a 100 TB embedding corpus searchable.

At scale the embeddings themselves become the storage problem: 1e9
documents x dim-768 float32 is 3 TB of raw vectors, and every ANN
candidate evaluation streams them. Product quantization (Jegou,
Douze, Schmid — "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011) splits each vector into ``m`` contiguous subspaces,
k-means-quantizes each subspace independently to ``ks`` centroids,
and stores only the ``m`` code bytes per vector (ks <= 256): dim-768
float32 -> 3072 bytes becomes m=16 -> 16 bytes, a 192x reduction.
Search runs directly ON the codes via asymmetric distance computation
(ADC): one ``m x ks`` lookup table per query, then each candidate
distance is ``m`` table gathers — no decode, no float vectors in the
scan.

Spark-first shapes (the reference engine has no quantization surface;
everything here is the paper re-expressed as DataFrame ops):

- ``pq_train`` runs Lloyd over ALL ``m`` subspaces in one distributed
  job per iteration (subspace id is just another grouping key), not
  ``m`` sequential k-means fits. Codebook state is ``m x ks x
  (dim/m)`` doubles — broadcast-sized by construction, same contract
  as ``similarity.kmeans_fit``.
- ``pq_encode`` is the oracle path: explode to subvectors, broadcast
  codebook join, ``min_by`` argmin — decimal-exact, DuckDB-twinnable.
  ``engine="blas"`` computes all ``ks`` distances per subspace as one
  blocked matmul (the throughput path; identical codes asserted).
- ``pq_search`` is ADC as an Arrow-batched scan over the codes: LUTs
  built per partition from the broadcast (codebook, queries), exact
  per-partition top-k candidates, then a global window over the tiny
  candidate set — the same local-then-global ranking shape as the
  BLAS search kernels in ``operators.similarity``.

Ranking/tie contract (shared with ``operators.similarity``):
distances round to 4 decimals, ties break by smallest code (encode)
or neighbor id (search), NULL vectors get no codes. ADC obeys the
identity ``adc_dist(q, codes(x)) == l2(q, decode(codes(x)))`` by
construction — tests pin it, so search correctness reduces to
encode correctness plus the (tested) ranking machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BLAS_BLOCK = 2048  # rows per matmul step (shared with similarity.py)


def _l2(a: F.Column, b: F.Column) -> F.Column:
    """Expression L2 distance — sequential double accumulation, so
    results are bit-deterministic and oracle-comparable (the same
    argument as ``similarity._dot``)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _probe_dim(vectors: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from one non-null row (bounded: LIMIT 1)."""
    row = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if row is None:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    return int(row["d"])


def _subvectors(
    vectors: DataFrame, m: int, dsub: int, id_col: str, vec_col: str
) -> DataFrame:
    """Explode each vector into its ``m`` contiguous subvectors:
    ``(id, subspace, sv: array<double>)``. NULL vectors are dropped —
    no subvector to quantize — the contract shared with the
    assignment strategies in ``operators.similarity``."""
    v = F.col(vec_col)
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.transform(
                    F.slice(v, s * dsub + 1, dsub), lambda x: x.cast("double")
                ).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return (
        vectors.filter(v.isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(parts).alias("p"))
        .select("id", "p.subspace", "p.sv")
    )


def _codebook_shape(codebook: DataFrame) -> tuple[int, int]:
    """(m, dsub) from a codebook frame — one bounded agg over the
    (tiny, broadcast-sized by contract) codebook."""
    row = codebook.agg(
        (F.max("subspace") + 1).alias("m"),
        F.max(F.size("centroid")).alias("dsub"),
    ).first()
    return int(row["m"]), int(row["dsub"])


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
    init_codebook: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Train a PQ codebook: ``(codebook, info)`` where ``codebook`` is
    ``(subspace int, code int, centroid array<double>)`` and ``info =
    {"iterations", "converged", "movement", "m", "ks", "dim"}``.

    One distributed Lloyd over all subspaces jointly: each iteration
    is one assignment pass (broadcast codebook join on the subspace
    key, ``min_by`` argmin — no window) and one centroid rebuild
    (posexplode + map-side-combined avg grouped by (subspace, code)),
    exactly the ``kmeans_fit`` shape with subspace as an extra key —
    cost per iteration is O(N x dim x ks / 1) scan work and two
    shuffles of O(N x m) rows, NOT ``m`` sequential k-means jobs.

    Init: a candidate pool of ``max(4*ks, 64)`` corpus rows is drawn
    by smallest ``xxhash64(id, seed)`` (deterministic across runs,
    partitionings, and appends-with-new-ids — the ``kmeans_fit``
    argument), then each subspace picks its ``ks`` seeds by
    farthest-first traversal over the pool's subvectors (Gonzalez
    k-center, driver-side NumPy on the bounded pool — the
    oversample-then-reduce shape of k-means||, Bahmani et al.
    VLDB'12). Farthest-first provably covers well-separated clusters,
    which plain hash sampling misses with constant probability — the
    classic Lloyd empty-corner local optimum. A corpus with fewer
    than ``ks`` distinct vectors trains the smaller effective
    codebook. Empty codes keep their previous centroid; convergence =
    max centroid L2 movement <= ``tol`` across all subspaces.
    Iterative fixpoint -> no SQL oracle (same class as
    ``kmeans_fit``); correctness is pinned by planted-structure
    recovery plus the ADC identity tests.

    ``init_codebook`` warm-starts Lloyd from an existing codebook
    frame instead of seeding (OPQ's alternation and incremental
    re-trains use this; shape must match ``m``/``dim``).

    PRACTICE NOTE (Jegou et al. sec V): codebooks are conventionally
    trained on a ~100k-1M sample, not the full corpus — compose with
    ``sampling.hash_sample`` upstream; encode then runs on everything.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if not 1 <= ks <= 256:
        raise ValueError(f"ks must be in [1, 256] (one code byte), got {ks}")
    dim = _probe_dim(vectors, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m}")
    dsub = dim // m
    spark = vectors.sparkSession

    import numpy as np

    cents: dict[tuple[int, int], list[float]] = {}
    if init_codebook is not None:
        # warm start (``opq_train``'s alternation needs it: a fresh
        # farthest-first re-seed each outer iteration would bounce the
        # objective) — bounded collect: m x ks rows
        for r in init_codebook.collect():
            cents[(r["subspace"], r["code"])] = [
                float(x) for x in r["centroid"]
            ]
        eff_ks = max(c for _, c in cents) + 1
    else:
        pool_rows = (
            vectors.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
            .limit(max(4 * ks, 64))  # TakeOrderedAndProject; bounded pool
            .collect()
        )
        pool = np.array(
            [[float(x) for x in r["v"]] for r in pool_rows], dtype=np.float64
        )
        eff_ks = min(ks, len(pool))
        # cents[(subspace, code)] = centroid; seeds per subspace by
        # farthest-first traversal over the pool's subvectors
        for s in range(m):
            X = pool[:, s * dsub : (s + 1) * dsub]
            chosen = [0]
            dmin = np.linalg.norm(X - X[0], axis=1)
            while len(chosen) < eff_ks:
                nxt = int(np.argmax(dmin))  # ties -> first index: determinism
                chosen.append(nxt)
                dmin = np.minimum(dmin, np.linalg.norm(X - X[nxt], axis=1))
            for c, idx in enumerate(chosen):
                cents[(s, c)] = X[idx].tolist()
    info = {
        "iterations": 0,
        "converged": False,
        "movement": None,
        "m": m,
        "ks": eff_ks,
        "dim": dim,
    }

    def _cb_df():
        return F.broadcast(
            spark.createDataFrame(
                [(s, c, v) for (s, c), v in cents.items()],
                "subspace int, code int, centroid array<double>",
            )
        )

    sub = _subvectors(vectors, m, dsub, id_col, vec_col)
    for it in range(max_iter):
        joined = sub.join(_cb_df(), "subspace")
        d = F.round(_l2(F.col("sv"), F.col("centroid")), 4)
        assigned = joined.groupBy("id", "subspace").agg(
            F.min_by(
                "code", F.struct(d.alias("d"), F.col("code").alias("c"))
            ).alias("code"),
            F.any_value("sv").alias("sv"),  # constant within the group
        )
        new_rows = (
            assigned.select("subspace", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("subspace", "code", "pos")
            .agg(F.avg("val").alias("v"))
            .groupBy("subspace", "code")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "v"))
                    ),
                    lambda p: p["v"],
                ).alias("centroid")
            )
            .collect()  # bounded: m x ks rows x dsub doubles
        )
        movement = 0.0
        for r in new_rows:
            key = (r["subspace"], r["code"])
            new = [float(x) for x in r["centroid"]]
            movement = max(
                movement,
                sum((a - b) ** 2 for a, b in zip(cents[key], new)) ** 0.5,
            )
            cents[key] = new
        info["iterations"] = it + 1
        info["movement"] = movement
        if movement <= tol:
            info["converged"] = True
            break
    return _cb_df(), info


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "expr",
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id, codes array<int>)`` with
    ``codes[s]`` = nearest subspace-``s`` centroid (rounded-L2, ties
    to the smallest code — the module ranking contract).

    ``engine="expr"`` (default): explode-to-subvectors + broadcast
    codebook join + ``min_by`` argmin + ordered ``collect_list``
    reassembly — decimal-exact, the DuckDB-oracle path. The distance
    work streams map-side through the broadcast join; two map-side-
    combined shuffles follow (N x m argmin rows, then N reassembly
    rows). The blas engine does the whole encode map-only — zero
    shuffles — which is why it is the 100 TB path.

    ``engine="blas"``: the codebook is collected (broadcast-sized by
    contract) and shipped as per-subspace NumPy matrices; each Arrow
    batch computes all ``ks`` distances per subspace as one blocked
    matmul; ``np.argmin`` returns the FIRST minimum, which on the
    code-sorted centroid axis IS the smallest-code tie-break.
    Map-only: no shuffle at all. Same output modulo the documented
    float64 half-even vs half-up +-1-ulp rounding boundary at the 4th
    decimal (the contract every BLAS kernel carries).
    """
    if engine not in ("expr", "blas"):
        raise ValueError(f"engine must be 'expr' or 'blas', got {engine}")
    m, dsub = _codebook_shape(codebook)
    if engine == "blas":
        return _pq_encode_blas(vectors, codebook, m, dsub, id_col, vec_col)
    sub = _subvectors(vectors, m, dsub, id_col, vec_col)
    joined = sub.join(F.broadcast(codebook), "subspace")
    d = F.round(_l2(F.col("sv"), F.col("centroid")), 4)
    per = joined.groupBy("id", "subspace").agg(
        F.min_by(
            "code", F.struct(d.alias("d"), F.col("code").alias("c"))
        ).alias("code")
    )
    return per.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda p: p["code"],
        ).alias("codes")
    )


def _collect_codebook(codebook: DataFrame, m: int, dsub: int):
    """Codebook as per-subspace matrices: ``[C_0, ..., C_{m-1}]``,
    ``C_s`` of shape (ks, dsub), rows code-sorted. Bounded by the
    broadcast-size contract. Subspaces must share one ks and codes
    must be dense 0..ks-1 (what ``pq_train`` emits) — raises
    otherwise, because positional gather indexing depends on it."""
    import numpy as np

    rows = codebook.collect()
    by_s: dict[int, list] = {}
    for r in rows:
        by_s.setdefault(r["subspace"], []).append(r)
    mats = []
    ks = None
    for s in range(m):
        got = sorted(by_s.get(s, []), key=lambda r: r["code"])
        if [r["code"] for r in got] != list(range(len(got))):
            raise ValueError(
                f"codebook subspace {s} codes are not dense 0..ks-1"
            )
        if ks is None:
            ks = len(got)
        elif len(got) != ks:
            raise ValueError(
                f"codebook subspace {s} has {len(got)} codes, expected {ks}"
            )
        mats.append(
            np.array(
                [[float(x) for x in r["centroid"]] for r in got],
                dtype=np.float64,
            )
        )
    if not ks:
        raise ValueError("empty codebook")
    return mats


def _pq_encode_blas(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int,
    dsub: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    from sparvi_core_spark.operators.similarity import _blas_id_ddl

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    mats = _collect_codebook(codebook, m, dsub)
    bc = vectors.sparkSession.sparkContext.broadcast(mats)

    def kern(batches):
        Cs = bc.value
        cn2 = [(C * C).sum(axis=1) for C in Cs]
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            ids = ids.astype("U") if id_is_str else ids.astype(np.int64)
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            for b in range(0, len(ids), _BLAS_BLOCK):
                Vb = V[b : b + _BLAS_BLOCK]
                codes = np.empty((len(Vb), len(Cs)), dtype=np.int32)
                for s, C in enumerate(Cs):
                    Sb = Vb[:, s * dsub : (s + 1) * dsub]
                    d2 = (
                        (Sb * Sb).sum(axis=1)[:, None]
                        + cn2[s][None, :]
                        - 2.0 * (Sb @ C.T)
                    )
                    d = np.round(np.sqrt(np.maximum(d2, 0.0)), 4)
                    codes[:, s] = np.argmin(d, axis=1)  # first min = low code
                yield pd.DataFrame(
                    {"id": ids[b : b + _BLAS_BLOCK], "codes": list(codes)}
                )

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kern, f"id {id_ddl}, codes array<int>"
    )


def pq_decode(
    codes: DataFrame,
    codebook: DataFrame,
    id_col: str = "id",
    code_col: str = "codes",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct approximate vectors from codes: ``(id, embedding)``
    with ``embedding`` = the concatenated subspace centroids. The
    reconstruction error IS the quantization error ADC search sees
    (the ADC identity) — use for error audits and for handing coded
    corpora back to float-vector consumers. Broadcast join + ordered
    flatten; one shuffle of O(N x m) rows."""
    exploded = codes.select(
        F.col(id_col).alias("id"),
        F.posexplode(code_col).alias("subspace", "code"),
    )
    joined = exploded.join(F.broadcast(codebook), ["subspace", "code"])
    return joined.groupBy("id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "centroid"))),
                lambda p: p["centroid"],
            )
        ).alias(out_col)
    )


def pq_search(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    metric: str = "l2",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_id_col: str = "id",
    code_col: str = "codes",
) -> DataFrame:
    """ADC top-k over PQ codes: ``(query_id, neighbor_id, distance,
    rank)`` (``metric="l2"``, ascending) or ``(query_id, neighbor_id,
    score, rank)`` (``metric="ip"`` inner product, descending; for
    cosine, L2-normalize upstream). Ties break by neighbor id — the
    search contract shared with ``cosine_topk``.

    The float query vectors never meet the corpus: queries and the
    codebook are collected (bounded by the search-side contract — the
    same Q x dim the ``cosine_topk`` broadcast join holds in memory
    anyway) and shipped once per executor; each partition builds the
    ``m x ks`` lookup table per query, then every candidate distance
    is ``m`` table gathers over the code matrix — no decode, no float
    corpus I/O. Exact per-partition top-k candidates (threshold +
    id-ordered tie fill, the vectorized selection contract from the
    BLAS search kernels) feed a global window over O(partitions x Q x
    k) rows. Distances are exact ADC values (= L2 to the
    reconstruction — the identity tests pin it), rounded to 4 for the
    ranking like every search surface here.
    """
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import numpy as np
    import pandas as pd

    from sparvi_core_spark.operators.similarity import _blas_id_ddl

    m, dsub = _codebook_shape(codebook)
    mats = _collect_codebook(codebook, m, dsub)
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )  # bounded: the search-side contract
    if not qrows:
        raise ValueError("query side is empty (or all-NULL vectors)")
    qids = [r["qid"] for r in qrows]
    Q = np.array([[float(x) for x in r["qv"]] for r in qrows], dtype=np.float64)
    if Q.shape[1] != m * dsub:
        raise ValueError(
            f"query dim {Q.shape[1]} != codebook dim {m * dsub}"
        )
    # LUTs are query state, built ONCE driver-side (Q x m x ks doubles,
    # same order of size as the query matrix itself) and broadcast
    luts = np.empty((len(qids), m, mats[0].shape[0]), dtype=np.float64)
    for s, C in enumerate(mats):
        Sq = Q[:, s * dsub : (s + 1) * dsub]
        if metric == "l2":
            luts[:, s, :] = (
                (Sq * Sq).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2.0 * (Sq @ C.T)
            )
        else:
            luts[:, s, :] = Sq @ C.T
    sc = codes.sparkSession.sparkContext
    bc = sc.broadcast(luts)
    nid_ddl, nid_is_str = _blas_id_ddl(codes, code_id_col)
    qid_ddl, qid_is_str = _blas_id_ddl(queries, id_col)
    asc = metric == "l2"
    val_name = "distance" if asc else "score"

    def kern(batches):
        L = bc.value
        sub_idx = np.arange(m)
        for pdf in batches:
            pdf = pdf[pdf[code_col].notna()]
            if pdf.empty:
                continue
            ids = pdf[code_id_col].to_numpy()
            ids = ids.astype("U") if nid_is_str else ids.astype(np.int64)
            order = np.argsort(ids, kind="stable")  # id-asc: tie fill order
            ids = ids[order]
            Cm = np.stack(pdf[code_col].to_numpy()[order]).astype(np.int64)
            n = len(ids)
            kk = min(k, n)
            for qi in range(L.shape[0]):
                # candidate value per row: m gathers, summed
                val = L[qi][sub_idx[:, None], Cm.T].sum(axis=0)
                if metric == "l2":
                    d = np.round(np.sqrt(np.maximum(val, 0.0)), 4)
                else:
                    d = -np.round(val, 4)  # negate: select smallest
                thr = np.partition(d, kk - 1)[kk - 1]
                lt = d < thr
                need = kk - int(lt.sum())
                sel = np.nonzero(d == thr)[0][:need]
                take = np.concatenate([np.nonzero(lt)[0], sel])
                out_d = d[take] if asc else -d[take]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            np.array([qids[qi]]), len(take)
                        ),
                        "neighbor_id": ids[take],
                        val_name: out_d,
                    }
                )

    cand = codes.select(F.col(code_id_col), F.col(code_col)).mapInPandas(
        kern,
        f"query_id {qid_ddl}, neighbor_id {nid_ddl}, {val_name} double",
    )
    order_col = F.asc(val_name) if asc else F.desc(val_name)
    w = Window.partitionBy("query_id").orderBy(order_col, F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# --- Scalar (int8) quantization: the cheap tier ---------------------------
# The compression ladder's first rung: per-dimension affine uint8
# codes — 4x over float32 with near-exact search quality (max
# per-dimension reconstruction error is (hi-lo)/510 by construction,
# PROVEN in tests, not tuned). Fully SQL-expressible, so unlike PQ the
# entire train+encode is DuckDB-oracled in the driver pin (sq_codes).
# Use when 4x is enough and exactness audits matter; drop to PQ for
# the 32-192x regime.


def sq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension bounds for scalar quantization: ``(pos, lo, hi)``
    (pos 0-based) from one map-side-combined min/max aggregation —
    exact, deterministic, and identical to any SQL engine's MIN/MAX
    (no float summation anywhere), which is what makes the downstream
    encode oracle-able. Output is dim rows — broadcast-sized by
    construction."""
    ex = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(vec_col).alias("pos", "val")
    )
    return ex.groupBy("pos").agg(
        F.min(F.col("val").cast("double")).alias("lo"),
        F.max(F.col("val").cast("double")).alias("hi"),
    )


def _sq_bounds_arrays(bounds: DataFrame) -> tuple[list[float], list[float]]:
    rows = sorted(bounds.collect(), key=lambda r: r["pos"])  # dim rows
    if [r["pos"] for r in rows] != list(range(len(rows))):
        raise ValueError("bounds positions are not dense 0..dim-1")
    if not rows:
        raise ValueError("empty bounds frame")
    return (
        [float(r["lo"]) for r in rows],
        [float(r["hi"]) for r in rows],
    )


def sq_encode(
    vectors: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Affine-quantize to uint8 codes: ``(id, codes array<int>)`` with
    ``codes[i] = floor((clip(x, lo, hi) - lo) / (hi - lo) * 255 +
    0.5)`` per dimension (constant dimensions code to 0). MAP-ONLY:
    the (dim-sized) bounds ride as literal arrays inside one
    ``transform`` expression — no join, no shuffle, whole plan is a
    scan + project. ``floor(x + 0.5)`` instead of ``round`` because
    banker's-vs-half-up rounding differs across engines and this
    expression must match its SQL oracle exactly. Codes fit one byte
    each (pack to ``binary`` at the sink if storage is the point);
    NULL vectors get no row."""
    lo, hi = _sq_bounds_arrays(bounds)
    lo_arr = F.array(*[F.lit(x) for x in lo])
    hi_arr = F.array(*[F.lit(x) for x in hi])

    def _code(x, i):
        lo_i = F.element_at(lo_arr, i + 1)
        hi_i = F.element_at(hi_arr, i + 1)
        rng = hi_i - lo_i
        clipped = F.least(F.greatest(x.cast("double"), lo_i), hi_i)
        return (
            F.when(rng > 0, F.floor((clipped - lo_i) / rng * 255 + 0.5))
            .otherwise(0)
            .cast("int")
        )

    return vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), _code).alias("codes"),
    )


def sq_decode(
    codes: DataFrame,
    bounds: DataFrame,
    id_col: str = "id",
    code_col: str = "codes",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct: ``x_hat[i] = lo + codes[i] / 255 * (hi - lo)`` —
    map-only like the encode. By construction ``|x_hat - clip(x)| <=
    (hi - lo) / 510`` per dimension (the tests pin the bound), so
    search over reconstructions via ``similarity.cosine_topk`` (or
    any float-vector consumer) degrades by at most that error."""
    lo, hi = _sq_bounds_arrays(bounds)
    lo_arr = F.array(*[F.lit(x) for x in lo])
    hi_arr = F.array(*[F.lit(x) for x in hi])

    def _val(c, i):
        lo_i = F.element_at(lo_arr, i + 1)
        hi_i = F.element_at(hi_arr, i + 1)
        return lo_i + c.cast("double") / 255 * (hi_i - lo_i)

    return codes.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(code_col), _val).alias(out_col),
    )


# --- IVF-PQ (IVFADC): coarse quantizer + residual PQ -----------------------
# The composition Jegou et al. sec VI call IVFADC and FAISS ships as
# IndexIVFPQ — the de-facto billion-scale ANN layout: a coarse
# centroid assigns each vector to a cell, PQ encodes the RESIDUAL
# v - c(v) (residuals are tighter than raw vectors, so the same code
# budget quantizes finer), and search probes only nprobe cells,
# running ADC inside each with a per-(query, cell) lookup table built
# from q - c. Everything composes from this module + the IVF surface
# in ``operators.similarity``.


def ivf_residuals(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-assign + residual: ``(id, bucket, residual)`` with
    ``residual = v - centroid(bucket)``. One broadcast-centroid
    assignment (``ivf_assign`` — ``min_by`` argmin, no window) and one
    broadcast join back for the subtraction; NULL vectors get no row
    (the assignment contract)."""
    from sparvi_core_spark.operators.similarity import ivf_assign

    a = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    joined = v.join(a.select("id", "bucket"), "id").join(
        F.broadcast(centroids.select("bucket", "centroid")), "bucket"
    )
    residual = F.zip_with(
        "v", "centroid", lambda x, y: x.cast("double") - y.cast("double")
    )
    return joined.select("id", "bucket", residual.alias("residual"))


def ivfpq_encode(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "expr",
) -> DataFrame:
    """Build the IVF-PQ coded corpus: ``(id, bucket, codes)``. Train
    the codebook on residuals (``pq_train(ivf_residuals(...),
    id_col="id", vec_col="residual")``) — encoding raw vectors against
    a residual codebook quantizes coarsely for no reason. At 100 TB
    the coded frame is what you persist: ``m`` bytes + a bucket id per
    vector; the float corpus never needs to be read again for search.
    """
    res = ivf_residuals(vectors, centroids, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        res, codebook, id_col="id", vec_col="residual", engine=engine
    )
    return codes.join(res.select("id", "bucket"), "id")


def ivfpq_search(
    queries: DataFrame,
    coded: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_id_col: str = "id",
    bucket_col: str = "bucket",
    code_col: str = "codes",
) -> DataFrame:
    """IVFADC top-k: ``(query_id, neighbor_id, distance, rank)`` —
    L2, ascending, neighbor-id ties (the search contract).

    Each query probes its ``nprobe`` nearest cells
    (``ivf_assign_probes`` on the broadcast-sized centroid table),
    then a cogrouped per-cell kernel builds the per-(query, cell) ADC
    lookup table from the residual ``q - c`` and scores that cell's
    codes with ``m`` gathers per candidate — the float corpus is
    never touched, and cells outside the probe set are never read
    (partition pruning on the bucket key). Local exact top-k per cell
    (threshold + id-ordered tie fill) feeds the global window over
    O(Q x nprobe x k) candidate rows, which merges across probed
    cells — a neighbor lives in exactly one cell, so no dedup.

    Distances obey the IVFADC identity: reported value ==
    ``round(l2(q, centroid(bucket) + decode(codes)), 4)`` — the tests
    pin it, reducing search correctness to encode correctness plus
    the ranking machinery. Recall is the IVF trade-off: neighbors
    outside the probed cells are missed; raise ``nprobe``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import numpy as np
    import pandas as pd

    from sparvi_core_spark.operators.similarity import (
        _blas_id_ddl,
        ivf_assign_probes,
    )

    m, dsub = _codebook_shape(codebook)
    mats = _collect_codebook(codebook, m, dsub)
    cent_rows = centroids.select("bucket", "centroid").collect()  # bounded
    cent = {
        r["bucket"]: np.array([float(x) for x in r["centroid"]])
        for r in cent_rows
    }
    sc = coded.sparkSession.sparkContext
    bc = sc.broadcast((mats, cent))
    nid_ddl, nid_is_str = _blas_id_ddl(coded, code_id_col)
    qid_ddl, qid_is_str = _blas_id_ddl(queries, id_col)

    probes = ivf_assign_probes(
        queries, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias("__qid"), F.col("bucket").alias("__qbk"))
    qv = queries.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    probed = probes.join(qv, "__qid")

    corp = coded.select(
        F.col(code_id_col).alias("__nid"),
        F.col(code_col).alias("__codes"),
        F.col(bucket_col).alias("__bk"),
    )

    def _empty():
        return pd.DataFrame(
            {
                "query_id": pd.Series(
                    [], dtype="object" if qid_is_str else "int64"
                ),
                "neighbor_id": pd.Series(
                    [], dtype="object" if nid_is_str else "int64"
                ),
                "distance": pd.Series([], dtype="float64"),
            }
        )

    def _cell_topk(corp_pdf: pd.DataFrame, qs_pdf: pd.DataFrame) -> pd.DataFrame:
        mats_, cent_ = bc.value
        corp_pdf = corp_pdf[corp_pdf["__codes"].notna()]
        qs_pdf = qs_pdf[qs_pdf["__qv"].notna()]
        if corp_pdf.empty or qs_pdf.empty:
            return _empty()
        bucket = corp_pdf["__bk"].iloc[0]
        c_b = cent_.get(bucket)
        if c_b is None:
            return _empty()
        nid = corp_pdf["__nid"].to_numpy()
        nid = nid.astype("U") if nid_is_str else nid.astype(np.int64)
        order = np.argsort(nid, kind="stable")  # id-asc: tie fill order
        nid = nid[order]
        Cm = np.stack(corp_pdf["__codes"].to_numpy()[order]).astype(np.int64)
        n = len(nid)
        kk = min(k, n)
        sub_idx = np.arange(m)
        out_q, out_n, out_d = [], [], []
        for _, qrow in qs_pdf.iterrows():
            rv = np.asarray(qrow["__qv"], dtype=np.float64) - c_b
            lut = np.empty((m, mats_[0].shape[0]))
            for s, C in enumerate(mats_):
                Sq = rv[s * dsub : (s + 1) * dsub]
                lut[s] = (Sq @ Sq) + (C * C).sum(axis=1) - 2.0 * (C @ Sq)
            d = np.round(
                np.sqrt(np.maximum(lut[sub_idx[:, None], Cm.T].sum(axis=0), 0.0)),
                4,
            )
            thr = np.partition(d, kk - 1)[kk - 1]
            lt = d < thr
            need = kk - int(lt.sum())
            sel = np.nonzero(d == thr)[0][:need]
            take = np.concatenate([np.nonzero(lt)[0], sel])
            out_q.append(np.repeat(np.array([qrow["__qid"]]), len(take)))
            out_n.append(nid[take])
            out_d.append(d[take])
        if not out_q:
            return _empty()
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "distance": np.concatenate(out_d),
            }
        )

    cand = (
        corp.groupBy("__bk")
        .cogroup(probed.groupBy("__qbk"))
        .applyInPandas(
            _cell_topk,
            f"query_id {qid_ddl}, neighbor_id {nid_ddl}, distance double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ------------------------------------------------------------------ OPQ


def rotate_vectors(
    vectors: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only orthogonal rotation: (id, embedding) → (id, embedding
    = x·R). The rotation is a plain dim × dim Python matrix shipped in
    the Arrow kernel's closure (dim ≤ ~2k → a few MB, broadcast-sized);
    one blocked matmul per batch, zero shuffles, NULL vectors pass
    through as NULL (the shared dirty-input contract).
    """
    import numpy as np

    from sparvi_core_spark.operators.similarity import _blas_id_ddl

    id_ddl, id_is_str = _blas_id_ddl(vectors, id_col)
    R = np.asarray(rotation, dtype=np.float64)

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
                V = np.stack(pdf.loc[mask, vec_col].to_numpy()).astype(
                    np.float64
                )
                rotated = V @ R
                out[np.flatnonzero(mask.to_numpy())] = list(rotated)
            yield pd.DataFrame({"id": ids, "vec": out})

    return (
        vectors.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(kern, f"id {id_ddl}, vec array<double>")
        .select(F.col("id").alias(id_col), F.col("vec").alias(vec_col))
    )


def _cross_covariance(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    dim: int,
) -> "object":
    """Distributed XᵀY over two id-aligned vector frames → a dim × dim
    NumPy matrix. Each Arrow batch contributes ONE dim × dim partial
    (a blocked ``Xbᵀ @ Yb``); the driver sums the partials — collect
    volume is partials × dim², never row-scale.
    """
    import numpy as np

    joined = (
        a.select(F.col(id_col).alias("id"), F.col(a_col).alias("x"))
        .join(
            b.select(F.col(id_col).alias("id"), F.col(b_col).alias("y")),
            "id",
        )
        .select("x", "y")
    )

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["x"].notna() & pdf["y"].notna()]
            if pdf.empty:
                continue
            X = np.stack(pdf["x"].to_numpy()).astype(np.float64)
            Y = np.stack(pdf["y"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"part": [list((X.T @ Y).ravel())]})

    parts = joined.mapInPandas(kern, "part array<double>").collect()
    M = np.zeros((dim, dim), dtype=np.float64)
    for r in parts:
        M += np.asarray(r["part"], dtype=np.float64).reshape(dim, dim)
    return M


def _eigen_allocation_rotation(
    vectors: DataFrame, dim: int, m: int, id_col: str, vec_col: str
):
    """OPQ's PARAMETRIC init (Ge et al. §4, "eigenvalue allocation"):
    eigendecompose the data covariance, then deal the principal
    directions into the ``m`` subspaces so the PER-SUBSPACE variance
    products balance (greedy on log-eigenvalues, largest first) —
    each subspace gets an equal share of the signal instead of one
    hoarding it. Covariance is one distributed XᵀX (dim² partials per
    Arrow batch) + one mean pass; eigh runs on the driver's d × d.
    """
    import numpy as np

    n = vectors.count()
    M = _cross_covariance(vectors, vectors, id_col, vec_col, vec_col, dim)
    mu_rows = (
        vectors.select(F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg(F.col("val").cast("double")).alias("v"))
        .collect()
    )
    mu = np.zeros(dim)
    for r in mu_rows:
        mu[r["pos"]] = r["v"]
    C = M / n - np.outer(mu, mu)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    dsub = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda i: logs[i])
        buckets[b].append(int(idx))
        logs[b] += float(np.log(max(w[idx], 1e-12)))
    perm = [i for b in buckets for i in b]
    return V[:, perm]


def opq_train(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    opq_iters: int = 4,
    pq_max_iter: int = 4,
    tol: float = 1e-4,
    seed: int = 42,
    init: str = "eigen",
) -> tuple[DataFrame, list[list[float]], dict]:
    """Optimized Product Quantization (Ge, He, Ke, Sun — "Optimized
    Product Quantization", CVPR 2013, the non-parametric solution):
    learn an ORTHOGONAL rotation R jointly with the PQ codebook so the
    subspace split stops fighting the data's correlation structure.
    Plain PQ quantizes fixed contiguous subvectors — when variance is
    concentrated or correlated across that split (PCA-rotated, whitened
    or learned embeddings usually are), whole codebooks are wasted; OPQ
    recovers most of that loss for one extra d × d matmul per
    encode/query.

    Returns ``(codebook, rotation, info)``: the codebook lives in the
    ROTATED space; use :func:`opq_encode` / :func:`opq_search` (or
    ``rotate_vectors`` + the plain PQ surface, which they wrap).

    The alternation, each step distributed, driver state = R + the
    codebook (both broadcast-sized):

    1. rotate: ``Y = X·R`` (map-only Arrow matmul),
    2. PQ step: Lloyd on Y **warm-started** from the previous
       codebook (``pq_train(init_codebook=...)`` — fresh re-seeding
       each outer iteration would bounce the objective),
    3. Procrustes step: ``M = XᵀŶ`` (distributed partial outer
       products, dim² per Arrow batch), SVD(M) = U·S·Vᵀ on the driver
       (d × d — microseconds), ``R ← U·Vᵀ``.

    ``init`` picks R₀ — and it decides almost everything, because
    R₀ = I is a NEAR-FIXPOINT of the alternation (with a decent
    reconstruction M = XᵀŶ is nearly symmetric PSD, so UVᵀ ≈ I and
    the rotation never escapes; measured on the 4×4-grid fixture:
    identity init parks at PQ's 17.94 MSE while ``"eigen"`` reaches
    0.086). ``"eigen"`` (default) is the paper's parametric solution
    — eigenvalue allocation balancing per-subspace variance, then NP
    refinement; ``"random"`` is a seeded random orthogonal (the NP
    paper's init — escapes, but slowly); ``"identity"`` is exposed for
    the already-aligned case.

    ``info["mse_trace"]`` records the quantization MSE after every
    outer iteration (one more pass each — the train-time audit that
    proves the rotation helps; drop to ``opq_iters`` passes you trust
    blind if that cost matters). Orthogonality of R is exact by
    construction (product of SVD/eigh factors); tests pin RᵀR = I and
    MSE(OPQ) ≪ MSE(PQ) on anisotropic data.
    """
    import numpy as np

    if opq_iters < 1:
        raise ValueError(f"opq_iters must be >= 1, got {opq_iters}")
    dim = _probe_dim(vectors, vec_col)
    clean = vectors.filter(F.col(vec_col).isNotNull())
    if init == "eigen":
        R = _eigen_allocation_rotation(clean, dim, m, id_col, vec_col)
    elif init == "random":
        rng = np.random.default_rng(seed)
        R = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    elif init == "identity":
        R = np.eye(dim)
    else:
        raise ValueError(
            f"init must be 'eigen', 'random' or 'identity', got {init!r}"
        )
    codebook = None
    info: dict = {"m": m, "dim": dim, "init": init, "mse_trace": []}
    for it in range(opq_iters):
        rotated = rotate_vectors(clean, R.tolist(), id_col, vec_col)
        # cut lineage: every downstream consumer (Lloyd iterations,
        # encode, covariance) would otherwise re-run the rotation chain
        rotated = rotated.localCheckpoint()
        codebook, pq_info = pq_train(
            rotated,
            m=m,
            ks=ks,
            id_col=id_col,
            vec_col=vec_col,
            max_iter=pq_max_iter,
            tol=tol,
            seed=seed,
            init_codebook=codebook,
        )
        codes = pq_encode(rotated, codebook, id_col=id_col, vec_col=vec_col)
        recon = pq_decode(codes, codebook, id_col="id", out_col="yq")
        recon = recon.select(F.col("id").alias(id_col), "yq").localCheckpoint()
        # train-time audit: mean ||Y − Ŷ||² (ONE scalar agg)
        err = (
            rotated.select(F.col(id_col).alias("id"), F.col(vec_col).alias("y"))
            .join(recon.select(F.col(id_col).alias("id"), "yq"), "id")
            .select(
                F.aggregate(
                    F.zip_with(
                        "y", "yq", lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            )
            .agg(F.avg("e"))
            .first()[0]
        )
        info["mse_trace"].append(round(float(err), 8))
        info["ks"] = pq_info["ks"]
        if it == opq_iters - 1:
            break  # final codebook pairs with the CURRENT R
        M = _cross_covariance(clean, recon, id_col, vec_col, "yq", dim)
        U, _, Vt = np.linalg.svd(M)
        R = U @ Vt
    info["iterations"] = opq_iters
    return codebook, R.tolist(), info


def opq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "expr",
) -> DataFrame:
    """rotate → ``pq_encode``: (id, codes). One extra map-only matmul
    over plain PQ; everything downstream (ADC, decode, storage) is the
    unchanged PQ surface."""
    rotated = rotate_vectors(vectors, rotation, id_col, vec_col)
    return pq_encode(
        rotated, codebook, id_col=id_col, vec_col=vec_col, engine=engine
    )


def opq_search(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    rotation: list[list[float]],
    k: int = 10,
    metric: str = "l2",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_id_col: str = "id",
    code_col: str = "codes",
) -> DataFrame:
    """rotate queries → ``pq_search`` ADC over unmodified codes. The
    corpus codes already live in the rotated space (``opq_encode``);
    only the (small) query batch pays the matmul at search time."""
    rotated = rotate_vectors(queries, rotation, id_col, vec_col)
    return pq_search(
        rotated,
        codes,
        codebook,
        k=k,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        code_id_col=code_id_col,
        code_col=code_col,
    )
