"""Sequence packing: arranging documents into fixed token-budget packs
(context windows) for LLM training.

No analog in the reference engine (its surface stops at profiling /
validation; see SURVEY.md §2.8) — this is part of the
training-data-pipeline extension surface.

Two packing disciplines, matching the two ways trainers consume packs:

- :func:`pack_chunked` — GPT-style concat-then-chunk: documents are
  concatenated in a deterministic order and the token stream is cut
  every ``budget`` tokens, so a document may span packs. Fully
  expression-based (one window cumulative sum + one ``sequence``
  explode, zero Python on executors) and SQL-oracle-checkable.
- :func:`pack_greedy` — documents are atomic (never split): greedy
  next-fit in a deterministic order, opening a new pack whenever the
  next document would overflow the budget. A cumulative sum that RESETS
  at a threshold is inherently a sequential scan (each reset depends on
  every prior one — not prefix-summable), so this is a documented
  Arrow-batched ``applyInPandas`` seam, O(n) per group.

Scale design (the part that matters at 100 TB):

- **One shuffle** in either mode — the hash-group exchange. Group id
  and intra-group order are pure functions of ``(id, salt)``
  (``xxhash64``), so the packing is deterministic across re-runs,
  repartitions, and cluster layouts, and ``num_groups`` decouples
  parallelism from corpus size (each group's sequential scan is
  ~corpus/num_groups docs).
- **Only (id, tokens) ride the shuffle** in the greedy path — the
  assignment frame is tiny; callers join text back by id afterwards
  instead of pushing document bodies through the Python workers.
- Oversized documents (> budget tokens) never silently corrupt packs:
  ``oversize="own_pack"`` (default) isolates each in a dedicated
  overflowing pack for the trainer to truncate, ``"drop"`` removes
  them, ``"error"`` fails the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

_ORDERINGS = ("ffd", "stable", "id")
_OVERSIZE = ("own_pack", "drop", "error")


def _with_group_order(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    num_groups: int,
    salt: str,
    order: str,
) -> DataFrame:
    """Attach deterministic pack-group and intra-group sort key."""
    if order not in _ORDERINGS:
        raise ValueError(f"order must be one of {_ORDERINGS}, got {order!r}")
    grp = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(num_groups))
    if order == "ffd":
        # big docs first: next-fit-decreasing packs tighter because the
        # tail of each group is small docs that top packs off
        key = -F.col(tokens_col).cast("long")
    elif order == "stable":
        # pseudo-random but reproducible document order
        key = F.xxhash64(F.col(id_col), F.lit(salt + "|ord"))
    else:  # "id": the corpus's own order (curriculum / pre-sorted data)
        key = F.col(id_col)
    return df.withColumn("pack_group", grp.cast("int")).withColumn("__ord", key)


def pack_chunked(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
    salt: str = "pack",
    sep_tokens: int = 0,
    order: str = "stable",
) -> DataFrame:
    """Concat-then-chunk packing: within each group, documents are laid
    end-to-end (plus ``sep_tokens`` separator tokens each, e.g. one
    EOS) and the stream is cut every ``budget`` tokens.

    Returns one row per (document, pack) intersection:
    ``(id, tokens, pack_group, pack_id, begin_token, end_token,
    tokens_in_pack)`` where begin/end are the document's offsets into
    its group's token stream and ``pack_id`` is the budget-sized window
    index (a document spanning a cut appears once per pack it touches).
    Zero-token documents occupy no stream space and are omitted.

    Every pack in a group except its last holds exactly ``budget``
    tokens — the fill-rate guarantee that makes this the default
    pretraining layout.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    eff = (F.col(tokens_col) + F.lit(sep_tokens)).cast("long")
    g = (
        _with_group_order(df, id_col, tokens_col, num_groups, salt, order)
        .select(
            F.col(id_col).alias("id"),
            eff.alias("__eff"),
            "pack_group",
            "__ord",
        )
        .filter(F.col("__eff") > 0)
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("__ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = g.select(
        "id",
        "pack_group",
        (F.sum("__eff").over(w) - F.col("__eff")).alias("begin_token"),
        F.sum("__eff").over(w).alias("end_token"),
    )
    b = F.lit(int(budget)).cast("long")
    packs = F.sequence(
        (F.col("begin_token") / b).cast("long"),
        ((F.col("end_token") - 1) / b).cast("long"),
    )
    exploded = spans.select(
        "id",
        "pack_group",
        "begin_token",
        "end_token",
        F.explode(packs).alias("pack_id"),
    )
    return exploded.select(
        "id",
        (F.col("end_token") - F.col("begin_token")).alias("tokens"),
        "pack_group",
        "pack_id",
        "begin_token",
        "end_token",
        (
            F.least(F.col("end_token"), (F.col("pack_id") + 1) * b)
            - F.greatest(F.col("begin_token"), F.col("pack_id") * b)
        ).alias("tokens_in_pack"),
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
    salt: str = "pack",
    sep_tokens: int = 0,
    order: str = "ffd",
    oversize: str = "own_pack",
) -> DataFrame:
    """Atomic greedy packing: documents are never split; within each
    group (deterministic order — ``"ffd"`` tokens-descending,
    ``"stable"`` hash-shuffled, or ``"id"`` the corpus's own order) a
    new pack opens whenever the next document would push the current
    pack past ``budget``.

    Returns ``(id, tokens, pack_group, pack_id)`` — tokens includes
    ``sep_tokens``. Join text back by id; only the id/token pair rides
    the shuffle and the Arrow channel (see module docstring).

    ``oversize`` governs documents whose token count alone exceeds the
    budget: ``"own_pack"`` (default) gives each its own overflowing
    pack, ``"drop"`` removes them, ``"error"`` raises at execution.
    Next-fit (not first-fit) is deliberate: O(1) state per scan step,
    and with FFD ordering the fill gap vs first-fit is small while
    staying one linear pass.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if oversize not in _OVERSIZE:
        raise ValueError(f"oversize must be one of {_OVERSIZE}, got {oversize!r}")
    eff = (F.col(tokens_col) + F.lit(sep_tokens)).cast("long")
    g = (
        _with_group_order(df, id_col, tokens_col, num_groups, salt, order)
        .select(
            F.col(id_col).alias("id"),
            eff.alias("tokens"),
            "pack_group",
            "__ord",
        )
        .filter(F.col("tokens") > 0)
    )
    if oversize == "drop":
        g = g.filter(F.col("tokens") <= F.lit(int(budget)))

    out_schema = T.StructType(
        [
            g.schema["id"],
            T.StructField("tokens", T.LongType()),
            T.StructField("pack_group", T.IntegerType()),
            T.StructField("pack_id", T.LongType()),
        ]
    )
    budget_ = int(budget)
    oversize_ = oversize

    def assign(pdf):
        pdf = pdf.sort_values(["__ord", "id"], kind="mergesort")
        toks = pdf["tokens"].to_numpy()
        if oversize_ == "error" and len(toks) and toks.max() > budget_:
            bad = pdf.loc[pdf["tokens"] > budget_, "id"].iloc[0]
            raise ValueError(
                f"document {bad!r} has more than budget={budget_} tokens "
                "(oversize='error')"
            )
        pack_ids = [0] * len(toks)
        pack, fill = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if fill > 0 and fill + t > budget_:
                pack += 1
                fill = 0
            pack_ids[i] = pack
            fill += t
            if fill >= budget_:  # full (or oversized own_pack): close it
                pack += 1
                fill = 0
        out = pdf[["id", "tokens", "pack_group"]].copy()
        out["pack_id"] = pack_ids
        return out

    return g.groupBy("pack_group").applyInPandas(assign, schema=out_schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row fill report over a :func:`pack_greedy` /
    :func:`pack_chunked` result: pack and doc counts, mean/min fill
    fraction, and how many packs overflow the budget (only oversized
    own-pack documents can)."""
    per_pack = packed.groupBy("pack_group", "pack_id").agg(
        F.sum(
            F.col("tokens_in_pack")
            if "tokens_in_pack" in packed.columns
            else F.col("tokens")
        ).alias("__fill"),
        F.count(F.lit(1)).alias("__docs"),
    )
    b = F.lit(int(budget)).cast("double")
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("__docs").alias("n_doc_slots"),
        F.round(F.avg(F.col("__fill") / b), 6).alias("mean_fill_frac"),
        F.round(F.min(F.col("__fill") / b), 6).alias("min_fill_frac"),
        F.sum((F.col("__fill") > F.lit(int(budget))).cast("long")).alias(
            "overflow_packs"
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style chunking: split each document into overlapping
    whitespace-token windows → ``(id, chunk_id, chunk_text,
    n_tokens)``.

    Windows start every ``stride = chunk_tokens - overlap_tokens``
    tokens; the final window may be shorter but every token is covered
    and consecutive chunks share exactly ``overlap_tokens`` tokens
    (except before a short tail). Empty/whitespace-only documents
    produce no chunks.

    Scale shape: MAP-ONLY — split + ``sequence`` + ``posexplode`` +
    ``slice``/``concat_ws``, all inside whole-stage codegen, no
    shuffle at all; fan-out per document is ``~n/stride`` rows. This
    is the embedding-pipeline front end: chunk → embed (vectorized
    UDF) → index (`operators.similarity`), and the chunker is never
    the bottleneck.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(text_col), r"\s+")
    n = F.size(toks)
    # chunks needed to cover n tokens with the final window possibly
    # short: 1 + ceil(max(0, n - chunk) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(chunk_tokens), F.lit(0))
            / F.lit(stride)
        ).cast("int")
    )
    with_toks = df.filter(F.trim(text_col) != "").select(
        F.col(id_col).alias("id"), toks.alias("__toks"), n_chunks.alias("__nc")
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        with_toks.select(
            "id",
            "__toks",
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "id",
            "chunk_id",
            F.concat_ws(" ", piece).alias("chunk_text"),
            F.size(piece).alias("n_tokens"),
        )
    )
