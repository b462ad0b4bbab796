"""N-gram language-model perplexity scoring — the CCNet-style quality
filter: train token-bigram counts on a reference corpus, score every
candidate document by its perplexity under that model, and drop the
tails (high perplexity ≈ gibberish / boilerplate soup; suspiciously low
≈ template spam).

No analog in the reference engine (its surface stops at profiling /
validation; SURVEY.md §2.8) — part of the training-data-pipeline
extension surface, alongside ``functions.text`` (heuristic quality)
and ``operators.ranking`` (relevance).

Model: bigram add-k smoothing over the lowercase-alnum tokenizer shared
with ``operators.ranking``:

``p(w | c) = (count(c, w) + k) / (count(c) + k·V)``

with a ``<s>`` BOS context so the first real token is scored too, and V
= training vocabulary size (distinct context tokens including BOS).
Unseen (context, word) pairs fall back through the same formula
(count 0), so scoring a corpus disjoint from training is well-defined.

Scale design (the part that matters at 100 TB):

- **Training** is one explode + one groupBy on the (w1, w2) pair —
  map-side combined, output bounded by the observed-bigram vocabulary,
  not the corpus. Context totals and V derive from the counts frame
  (tiny groupBys), never from a second corpus pass.
- **Scoring** explodes candidate bigrams (linear in corpus tokens) and
  equi-joins the model. A trained model is vocabulary-sized — a few
  hundred MB for web-scale vocabularies after ``min_count`` pruning —
  so ``broadcast_model=True`` turns scoring into a map-only pass with
  ZERO corpus-side shuffle beyond the per-doc aggregate; left unset,
  AQE picks the join. Per-doc reduction is one map-side-combined
  groupBy on the id.
- Everything is built-in expressions; no Python on the executors.

DuckDB oracle parity: tokenizer and BOS construction are expressible
identically with ``regexp_split_to_array`` / list slicing; outputs are
rounded so summation-order ULP drift cannot flip the comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.operators.ranking import search_tokens

BOS = "<s>"


def _bigrams(text_col: str) -> F.Column:
    """array<struct<w1,w2>> of (context, word) pairs with a BOS context.

    ``zip_with`` over shifted ``slice``s (the shingle pattern from
    ``operators.dedup`` — indexed ``transform`` re-inlines the split
    per element and goes quadratic in document length).
    """
    toks = search_tokens(text_col)
    n = F.size(toks)
    # slice the BOS-prepended array to exactly n elements: for an empty
    # doc both sides are empty arrays (zip_with would otherwise PAD the
    # shorter side with nulls and emit a phantom bigram)
    ctx = F.slice(F.concat(F.array(F.lit(BOS)), toks), 1, n)
    return F.zip_with(
        ctx, toks, lambda c, w: F.struct(c.alias("w1"), w.alias("w2"))
    )


@dataclass
class BigramLM:
    """A trained model: bigram counts, context totals, vocab size.

    ``counts``: (w1, w2, n); ``contexts``: (w1, c_total);
    ``vocab``: single row (v) — all lazy DataFrames, so a model is a
    plan until scored (persist ``counts`` when scoring many batches).
    """

    counts: DataFrame
    contexts: DataFrame
    vocab: DataFrame


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> BigramLM:
    """Count bigrams over the training corpus → :class:`BigramLM`.

    ``min_count`` prunes rare bigrams from the model (the standard
    size/quality trade — pruned pairs score as unseen). Context totals
    are computed BEFORE pruning so probabilities stay ≤ 1 and sum
    correctly over the full event space.
    """
    pairs = docs.select(F.explode(_bigrams(text_col)).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    # materialize on first use: contexts, vocab and every scoring join
    # derive from this one aggregate — leaving it fully lazy re-runs
    # the corpus bigram explode+groupBy per consumer (the policy and
    # the measured none/lazy/eager comparison live in
    # plans.modelframe). The model is vocabulary-bounded
    # (broadcastable by design), so pinning it retains nothing
    # corpus-sized.
    from sparvi_core_spark.plans.modelframe import materialize_model_frame

    counts = materialize_model_frame(counts)
    contexts = counts.groupBy("w1").agg(F.sum("n").alias("c_total"))
    # V = distinct context tokens (every trained token appears as a
    # context for its successor; BOS included) — derived from the
    # already-reduced counts frame, no extra corpus pass
    vocab = contexts.agg(F.count(F.lit(1)).alias("v"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return BigramLM(counts=counts, contexts=contexts, vocab=vocab)


def score_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    broadcast_model: bool = False,
    round_to: int = 6,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document perplexity under ``lm`` →
    (id, [carry_cols], n_bigrams, avg_neg_logp, perplexity).

    ``perplexity = exp(−Σ ln p(w|c) / n_bigrams)`` with add-k smoothed
    probabilities. Documents with zero tokens drop out (no bigrams —
    nothing to score; screen empties with ``quality_features``).

    ``broadcast_model=True`` broadcasts counts AND context totals —
    scoring becomes a map-only pass over the corpus (use when the
    pruned model fits executor memory; the 100 TB default).

    ``carry_cols`` (doc-level columns, e.g. the language) ride through
    the per-doc aggregate as ``first()`` — free relative to a second
    corpus join to re-attach them afterwards (the partial aggregation
    shrinks rows BEFORE the shuffle either way).
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    # the bigram explode + model join run before this plan's first
    # shuffle — fan a compact corpus out so they parallelize (no-op at
    # scale; measured sf0.1: 1.9 s → 1.5 s)
    from sparvi_core_spark.plans.fanout import fan_out_compact

    docs = fan_out_compact(docs)
    carry = list(carry_cols or [])
    bgs = docs.select(
        F.col(id_col).alias("id"), *carry,
        F.explode(_bigrams(text_col)).alias("bg"),
    ).select("id", *carry, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    counts, contexts = lm.counts, lm.contexts
    if broadcast_model:
        counts, contexts = F.broadcast(counts), F.broadcast(contexts)
    joined = (
        bgs.join(counts, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .crossJoin(F.broadcast(lm.vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("n"), F.lit(0)).cast("double") + add_k)
        / (
            F.coalesce(F.col("c_total"), F.lit(0)).cast("double")
            + add_k * F.col("v").cast("double")
        )
    )
    per_doc = joined.groupBy("id").agg(
        *[F.first(c).alias(c) for c in carry],
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(logp)).alias("nll"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        *carry,
        "n_bigrams",
        F.round(F.col("nll"), round_to).alias("avg_neg_logp"),
        F.round(F.exp(F.col("nll")), round_to).alias("perplexity"),
    )


def perplexity_buckets(
    docs: DataFrame,
    lm: BigramLM,
    cutoffs: tuple[float, float] = (1 / 3, 2 / 3),
    by: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    broadcast_model: bool = True,
    exact: bool = False,
) -> DataFrame:
    """CCNet's deployed split (Wenzek et al. 2020 §4.3): tag every
    document ``head`` / ``middle`` / ``tail`` by where its perplexity
    falls in the corpus distribution — per ``by`` group (CCNet
    computes the terciles PER LANGUAGE, so pass the language column)
    or corpus-wide when ``by`` is None. ``head`` = ppl ≤ the
    ``cutoffs[0]`` quantile, ``middle`` ≤ ``cutoffs[1]``, else
    ``tail``; CCNet trains on head+middle. Returns
    ``(id, [by], n_bigrams, perplexity, bucket)`` — filter on
    ``bucket`` to deploy (absolute thresholds live in
    :func:`perplexity_filter`).

    Scale shape: one scoring pass (broadcast model, map-only + the
    per-doc aggregate), ONE tiny per-group quantile aggregate
    (``percentile_approx`` by default — single-pass sketch;
    ``exact=True`` flips to exact interpolated percentiles, the
    oracle-comparable mode), then a broadcast threshold join — the
    corpus never shuffles on anything but the per-doc score reduce.
    Docs with zero tokens produce no score rows
    (:func:`score_perplexity`'s contract) and are therefore absent
    here — CCNet drops them too.
    """
    lo, hi = cutoffs
    if not 0 < lo < hi < 1:
        raise ValueError(
            f"cutoffs must be ascending in (0, 1), got {cutoffs}"
        )
    group = [by] if by else []
    scored = score_perplexity(
        docs,
        lm,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_model=broadcast_model,
        carry_cols=group,  # rides the score aggregate — no second join
    ).select(id_col, *group, "n_bigrams", "perplexity")
    # materialize the docs-grain scores once (lazy local checkpoint):
    # the quantile collect below and the returned tag join BOTH consume
    # them, and leaving the frame lazy runs the whole scoring pipeline
    # (token-grain explode + model join) twice per downstream action.
    # The pinned frame is docs × 4 scalar columns — the corpus-mass
    # token rows are reduced before it — and spills to disk under
    # memory pressure.
    scored = scored.localCheckpoint(eager=False)
    pctl = F.percentile if exact else F.percentile_approx
    thr = scored.groupBy(*group).agg(
        pctl("perplexity", F.lit(lo)).alias("__t_lo"),
        pctl("perplexity", F.lit(hi)).alias("__t_hi"),
    )
    # collect the (groups × 2 doubles) threshold table EAGERLY and
    # rebuild it locally: leaving it lazy would inline the whole
    # scoring pipeline TWICE into the returned plan (once under the
    # quantile agg, once under the tag join), doubling the corpus
    # scans of every downstream action — the search_ivf_index
    # probe-collect lesson. One scoring job runs here, at call time.
    thr_local = scored.sparkSession.createDataFrame(
        thr.collect(), schema=thr.schema
    )
    joined = (
        scored.join(F.broadcast(thr_local), group)
        if group
        else scored.crossJoin(F.broadcast(thr_local))
    )
    bucket = (
        F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
        .when(F.col("perplexity") <= F.col("__t_lo"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("__t_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        id_col, *group, "n_bigrams", "perplexity", bucket.alias("bucket")
    )


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_perplexity: float,
    min_perplexity: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Keep documents whose perplexity lies in
    ``[min_perplexity, max_perplexity]`` — both tails are suspect
    (CCNet keeps the head/middle of the distribution; template spam
    scores unnaturally LOW). Returns the input columns + ``perplexity``.
    """
    scored = score_perplexity(
        docs,
        lm,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_model=broadcast_model,
    ).select(id_col, "perplexity")
    return docs.join(scored, id_col).filter(
        F.col("perplexity").between(min_perplexity, max_perplexity)
    )
