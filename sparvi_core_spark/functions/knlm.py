"""Interpolated Kneser-Ney trigram language model — the KenLM-style
perplexity filter CCNet actually deploys (Wenzek et al. 2020 score
pages with a 5-gram KN model; ``functions.lm``'s add-k bigram is the
cheap tier, this is the real smoothing). Train on a reference corpus,
score candidates, drop both tails.

No analog in the reference engine (SURVEY.md §2.8) — part of the
training-data-pipeline extension surface.

Model (Chen & Goodman 1999, interpolated KN with one discount per
order, BOS-padded trigrams ``(<s>, <s>, w1), (<s>, w1, w2), …``):

``p(w|u,v) = (max(c(uvw) − d₃, 0) + d₃·N₁₊(uv·)·p(w|v)) / c(uv·)``
``p(w|v)   = (max(N₁₊(·vw) − d₂, 0) + d₂·N₁₊(v·)·p(w)) / N₁₊(·v·)``
``p(w)     = (max(N₁₊(·w) − d₁, 0) + d₁·V·p₀) / N₁₊(··)``

with continuation counts ``N₁₊(·vw) = |{u : c(uvw) > 0}|`` (how many
DISTINCT contexts a bigram continues — the insight that makes
"francisco" rare as a continuation despite being frequent), uniform
base ``p₀ = 1/(V+1)`` (one reserved OOV slot, so unseen words get
positive mass), and Ney discounts ``d = n₁/(n₁ + 2n₂)`` estimated per
order from the count-of-count statistics. Unseen CONTEXT backs off one
order exactly (the interpolation weight is 1 when the higher-order
numerator is empty); by construction Σ_w p(w|·) = 1 over vocab ∪ {OOV}
at every order — pinned by a property test.

Scale design (the part that matters at 100 TB):

- **Training** is one trigram explode + one (u,v,w) groupBy — map-side
  combined, output bounded by trigram TYPES, not corpus tokens. Every
  other table (context totals, continuation counts, count-of-counts,
  discounts) derives from that counts frame via tiny groupBys — ONE
  corpus pass total.
- **Scoring** explodes candidate trigrams (linear) and left-joins the
  five model tables (``broadcast_model=True`` → map-only scoring);
  per-doc reduction is one map-side-combined groupBy. Honest sizing:
  the backoff tables are vocabulary-bounded, but the TOP-order table
  is trigram-TYPE-bounded — at web scale that only broadcasts after
  ``min_count`` pruning (exactly why KenLM ships pruned models; CCNet
  scores with a pruned 5-gram). Unpruned + huge → set
  ``broadcast_model=False`` and let AQE pick the join.
- Everything is built-in expressions; no Python on the executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.operators.ranking import search_tokens

BOS = "<s>"


def _trigrams(text_col: str) -> F.Column:
    """array<struct<u,v,w>> of BOS-padded trigrams, one per token.

    ``zip_with`` over shifted slices (the shingle pattern — indexed
    ``transform`` re-inlines the split per element and goes quadratic
    in document length). Empty docs yield an empty array.
    """
    toks = search_tokens(text_col)
    n = F.size(toks)
    padded = F.concat(F.array(F.lit(BOS), F.lit(BOS)), toks)
    u = F.slice(padded, 1, n)
    v = F.slice(padded, 2, n)
    return F.zip_with(
        F.zip_with(u, v, lambda a, b: F.struct(a.alias("u"), b.alias("v"))),
        toks,
        lambda uv, w: F.struct(
            uv["u"].alias("u"), uv["v"].alias("v"), w.alias("w")
        ),
    )


def _discount(counts: DataFrame, count_col: str) -> F.Column:
    """One-row aggregate → the Ney discount n₁/(n₁ + 2n₂) for an
    order, clamped to [0.01, 0.99] so degenerate count-of-count shapes
    (no singletons, or nothing but singletons — tiny corpora) can
    neither zero the backoff mass nor erase every observed count.
    """
    n1 = F.sum((F.col(count_col) == 1).cast("long"))
    n2 = F.sum((F.col(count_col) == 2).cast("long"))
    raw = F.when(
        (n1 + 2 * n2) > 0, n1.cast("double") / (n1 + 2 * n2).cast("double")
    ).otherwise(F.lit(0.75))
    return F.least(F.greatest(raw, F.lit(0.01)), F.lit(0.99))


@dataclass
class KNTrigramLM:
    """A trained model — five vocabulary-bounded tables plus a one-row
    constants frame, all lazy until scored (persist when scoring many
    batches).

    ``tri``: (u, v, w, c3); ``tri_ctx``: (u, v, ctx_total, followers);
    ``mid``: (v, w, cont); ``mid_ctx``: (v, cont_total, followers);
    ``uni``: (w, cont_w); ``consts``: (d3, d2, d1, bigram_types, vocab_size).
    """

    tri: DataFrame
    tri_ctx: DataFrame
    mid: DataFrame
    mid_ctx: DataFrame
    uni: DataFrame
    consts: DataFrame


def train_kn_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> KNTrigramLM:
    """Count BOS-padded trigrams over the training corpus →
    :class:`KNTrigramLM` — one corpus pass; everything else derives
    from the trigram-counts frame.

    ``min_count`` prunes rare TRIGRAMS from the top-order table only
    (the standard size/quality trade — pruned trigrams back off to the
    bigram order). Discounts and the lower-order (continuation) tables
    are estimated from the UNPRUNED counts; the top-order context
    totals are recomputed from the SURVIVING trigrams, so the model is
    exactly the interpolated-KN model of the pruned counts frame and
    Σ_w p(w|u,v) = 1 still holds on every context — pinned by the
    pruned-model property test. (Totals kept pre-prune would leak the
    pruned mass: numerators drop it, the denominator keeps it.)
    """
    tri = (
        docs.select(F.explode(_trigrams(text_col)).alias("t"))
        .select("t.u", "t.v", "t.w")
        .groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    return kn_from_trigram_counts(tri, min_count=min_count)


def kn_from_trigram_counts(
    tri: DataFrame, min_count: int = 1
) -> KNTrigramLM:
    """Derive the full model from a ``(u, v, w, c3)`` trigram-counts
    frame. The counts ARE the model's sufficient statistic — which
    makes KN models MERGEABLE: sum two corpora's trigram counts and
    re-derive, and you get EXACTLY the model a joint retrain would
    produce (:func:`merge_kn_lms`; the profile-once-never-rescan
    property, here for language models)."""
    # materialize the counts frame on first use: every derived table
    # (mid/mid_ctx/uni/consts/tri_ctx) and every scoring join hangs
    # off it, and leaving it fully lazy re-runs the corpus trigram
    # explode+groupBy per consumer (policy + measured comparison in
    # plans.modelframe). The frame is trigram-type-bounded — the same
    # mass the scoring broadcast ships — and spills to disk under
    # pressure.
    from sparvi_core_spark.plans.modelframe import materialize_model_frame

    tri = materialize_model_frame(tri)
    # continuation counts: N₁₊(·vw) = distinct u preceding (v, w)
    mid = tri.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cont"))
    mid_ctx = mid.groupBy("v").agg(
        F.sum("cont").alias("cont_total"),
        F.count(F.lit(1)).alias("followers"),
    )
    # unigram continuation: N₁₊(·w) = distinct v preceding w
    uni = mid.groupBy("w").agg(F.count(F.lit(1)).alias("cont_w"))
    # scalars: per-order Ney discounts + bigram-type and vocab totals
    # (BOS never appears as a scored word, so vocab = distinct w)
    consts = (
        tri.agg(_discount(tri, "c3").alias("d3"))
        .crossJoin(mid.agg(_discount(mid, "cont").alias("d2")))
        .crossJoin(uni.agg(_discount(uni, "cont_w").alias("d1")))
        # N₁₊(··) = # distinct (v, w) bigram types = Σ_w N₁₊(·w) —
        # the mid-table ROW count (its `cont` sum would be trigram types)
        .crossJoin(
            mid.agg(F.count(F.lit(1)).alias("bigram_types"))
        )
        .crossJoin(uni.agg(F.count(F.lit(1)).alias("vocab_size")))
    )
    if min_count > 1:
        # Prune the top order, then recompute ITS context totals from
        # the survivors: the result is exactly the KN model of the
        # pruned counts, so Σ_w p(w|u,v) = 1 still holds per context
        # (totals kept pre-prune leak the pruned mass — numerators
        # drop it, the denominator keeps it). A context losing every
        # trigram drops out of tri_ctx and backs off with weight 1.
        # Discounts + lower orders stay estimated pre-prune (standard:
        # pruning to broadcast size must not distort the count-of-
        # count statistics or the continuation vocabulary).
        tri = tri.filter(F.col("c3") >= min_count)
    # trigram-context totals and distinct-follower counts over the
    # (possibly pruned) top order: c(uv·), N₁₊(uv·)
    tri_ctx = tri.groupBy("u", "v").agg(
        F.sum("c3").alias("ctx_total"),
        F.count(F.lit(1)).alias("followers"),
    )
    return KNTrigramLM(
        tri=tri, tri_ctx=tri_ctx, mid=mid, mid_ctx=mid_ctx, uni=uni,
        consts=consts,
    )


def kn_lm_size(lm: KNTrigramLM, avg_token_bytes: int = 8) -> dict:
    """Broadcast-size gauge for a trained model — the check to run
    BEFORE scoring with ``broadcast_model=True`` at corpus scale. One
    count per table (each a tiny agg over an already-derived frame) →
    ``{"tri_rows", "mid_rows", "uni_rows", "tri_ctx_rows",
    "mid_ctx_rows", "est_broadcast_mb", "broadcast_sane"}``.

    ``est_broadcast_mb`` is a deliberately rough upper-bound estimate
    (rows × per-row bytes: 3 tokens + a long for ``tri``, scaled
    per-table), good for an order-of-magnitude go/no-go — the
    top-order table dominates, which is exactly what ``min_count``
    pruning shrinks. ``broadcast_sane`` compares against Spark's 8 GB
    hard broadcast limit with 4× headroom; when it is False, either
    raise ``min_count`` (re-derive via :func:`kn_from_trigram_counts`
    on the counts you kept) or score with ``broadcast_model=False``.
    The result is also emitted as a log line so long pipelines record
    the model size they shipped."""
    import logging

    rows = {
        "tri_rows": lm.tri.count(),
        "tri_ctx_rows": lm.tri_ctx.count(),
        "mid_rows": lm.mid.count(),
        "mid_ctx_rows": lm.mid_ctx.count(),
        "uni_rows": lm.uni.count(),
    }
    per_row = {
        "tri_rows": 3 * avg_token_bytes + 8,
        "tri_ctx_rows": 2 * avg_token_bytes + 16,
        "mid_rows": 2 * avg_token_bytes + 8,
        "mid_ctx_rows": avg_token_bytes + 16,
        "uni_rows": avg_token_bytes + 8,
    }
    est = sum(rows[k] * per_row[k] for k in rows)
    out = dict(rows)
    out["est_broadcast_mb"] = round(est / 1e6, 2)
    out["broadcast_sane"] = est < 2e9  # 8 GB Spark limit, 4x headroom
    logging.getLogger(__name__).info(
        "KN-LM broadcast size: %.2f MB est (tri=%d mid=%d uni=%d) "
        "broadcast_sane=%s",
        out["est_broadcast_mb"],
        rows["tri_rows"],
        rows["mid_rows"],
        rows["uni_rows"],
        out["broadcast_sane"],
    )
    return out


def merge_kn_lms(
    a: KNTrigramLM, b: KNTrigramLM, min_count: int = 1
) -> KNTrigramLM:
    """Merge two models trained with ``min_count=1`` into EXACTLY the
    model a joint retrain over both corpora would produce — trigram
    counts are sufficient statistics, so the merge is one
    vocabulary-bounded groupBy-sum over the two ``tri`` frames (no
    corpus re-scan; the incremental daily-ingest path: keep yesterday's
    counts, count only today's shard, merge).

    Models trained with ``min_count > 1`` lost counts below the floor —
    merging them would NOT equal a joint retrain; apply pruning at
    merge time instead (the ``min_count`` here).
    """
    tri = (
        a.tri.unionByName(b.tri)
        .groupBy("u", "v", "w")
        .agg(F.sum("c3").alias("c3"))
    )
    return kn_from_trigram_counts(tri, min_count=min_count)


def _kn_prob() -> F.Column:
    """The nested interpolated-KN probability over the joined columns
    (NULLs from the left joins mean "unseen" and coalesce to 0; a
    missing CONTEXT makes the whole higher order vanish — weight 1 on
    the backoff — which is exactly interpolated KN's behavior).
    """
    d3, d2, d1 = F.col("d3"), F.col("d2"), F.col("d1")
    vocab = F.col("vocab_size").cast("double")
    p0 = F.lit(1.0) / (vocab + 1.0)
    cont_w = F.coalesce(F.col("cont_w"), F.lit(0)).cast("double")
    p1 = (
        F.greatest(cont_w - d1, F.lit(0.0))
        + d1 * vocab * p0
    ) / F.col("bigram_types").cast("double")
    cont = F.coalesce(F.col("cont"), F.lit(0)).cast("double")
    cont_total = F.col("cont_total").cast("double")
    p2 = F.when(
        F.col("cont_total").isNull(),
        p1,
    ).otherwise(
        (
            F.greatest(cont - d2, F.lit(0.0))
            + d2 * F.col("followers_v").cast("double") * p1
        )
        / cont_total
    )
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    p3 = F.when(
        F.col("ctx_total").isNull(),
        p2,
    ).otherwise(
        (
            F.greatest(c3 - d3, F.lit(0.0))
            + d3 * F.col("followers_uv").cast("double") * p2
        )
        / F.col("ctx_total").cast("double")
    )
    return p3


def _join_model(
    grams: DataFrame, lm: KNTrigramLM, broadcast_model: bool
) -> DataFrame:
    """Left-join the five model tables (+ constants) onto (u, v, w)
    rows — five broadcast hash joins when ``broadcast_model``.
    """
    b = F.broadcast if broadcast_model else (lambda df: df)
    return (
        grams.join(b(lm.tri), ["u", "v", "w"], "left")
        .join(
            b(
                lm.tri_ctx.withColumnRenamed("followers", "followers_uv")
            ),
            ["u", "v"],
            "left",
        )
        .join(b(lm.mid), ["v", "w"], "left")
        .join(
            b(lm.mid_ctx.withColumnRenamed("followers", "followers_v")),
            ["v"],
            "left",
        )
        .join(b(lm.uni), ["w"], "left")
        .crossJoin(F.broadcast(lm.consts))
    )


def kn_prob_table(
    lm: KNTrigramLM,
    contexts: DataFrame,
    words: DataFrame,
    broadcast_model: bool = True,
) -> DataFrame:
    """p(w | u, v) for every (context × word) pair → (u, v, w, p).

    Diagnostic/validation surface: ``contexts`` is (u, v), ``words``
    is (w). The property test sums this over the vocabulary to assert
    Σ p = 1 − p(OOV|u,v) exactly as the math requires.
    """
    grid = contexts.select("u", "v").crossJoin(words.select("w"))
    return _join_model(grid, lm, broadcast_model).select(
        "u", "v", "w", _kn_prob().alias("p")
    )


def score_perplexity_kn(
    docs: DataFrame,
    lm: KNTrigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-document perplexity under ``lm`` →
    (id, n_tokens, avg_neg_logp, perplexity).

    ``perplexity = exp(−Σ ln p(wᵢ|wᵢ₋₂,wᵢ₋₁) / n_tokens)`` — every
    token is scored (BOS padding covers positions 1–2); OOV tokens get
    the reserved uniform slot, so disjoint corpora are well-defined.
    Zero-token documents drop out (nothing to score).
    """
    from sparvi_core_spark.plans.fanout import fan_out_compact

    docs = fan_out_compact(docs)
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(_trigrams(text_col)).alias("t")
    ).select("id", "t.u", "t.v", "t.w")
    scored = _join_model(grams, lm, broadcast_model).select(
        "id", F.log(_kn_prob()).alias("logp")
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("logp")).alias("nll"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round(F.col("nll"), round_to).alias("avg_neg_logp"),
        F.round(F.exp(F.col("nll")), round_to).alias("perplexity"),
    )
