"""Corpus diversity metrics — the lexical-health report a training-data
curator reads before (and after) every filtering round: type/token
ratio, distinct-bigram ratio, token entropy, head concentration, and
the Zipf slope. Aggressive dedup/filtering that accidentally collapses
diversity shows up here before it shows up in a trained model.

No analog in the reference engine (SURVEY.md §2.8) — part of the
training-data-pipeline extension surface, alongside
``functions.text`` (per-document quality) and ``operators.mixing``
(domain balance). The metrics are the standard generation-diversity /
corpus-statistics set: distinct-n (Li et al. 2016), Shannon token
entropy, and the Zipf rank-frequency slope (a healthy natural-language
corpus fits ≈ −1; template/boilerplate floods flatten the head and
steepen the tail).

Scale design (the part that matters at 100 TB):

- ONE corpus pass builds the unigram frequency table (explode +
  map-side-combined groupBy, output bounded by VOCABULARY) and one
  builds the bigram-distinct count. Every scalar then derives from the
  vocab-bounded frequency table: entropy and totals are one more tiny
  agg, and the Zipf fit ranks only the ``zipf_top`` head (default 10k)
  via ``TakeOrderedAndProject`` — never a corpus-scale or full-vocab
  global sort.
- Everything is built-in expressions; no Python on the executors.

DuckDB oracle parity: the whole report is plain SQL (regexp split +
GROUP BY + ln); outputs are rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from sparvi_core_spark.operators.ranking import search_tokens


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """One-row distribution-shift report between two corpora's unigram
    distributions — the "did this crawl/filter move the token
    distribution" audit run before swapping a corpus version in →
    (tokens_a, tokens_b, vocab_a, vocab_b, vocab_jaccard,
    js_divergence, kl_ab, kl_ba, tvd).

    - ``js_divergence``: Jensen–Shannon divergence (nats) of the RAW
      distributions — defined even on disjoint supports (0·ln 0 = 0),
      symmetric, bounded by ln 2.
    - ``kl_ab`` / ``kl_ba``: KL divergences with additive-``alpha``
      smoothing over the UNION vocabulary (raw KL is infinite the
      moment one side misses a type, so the smoothed form is the
      usable directional signal).
    - ``tvd``: total variation distance, ½ Σ|p−q| — the "what fraction
      of token mass moved" number.
    - ``vocab_jaccard``: type-level overlap, |Va∩Vb| / |Va∪Vb|.

    Either corpus empty → NULL divergences (not zeros). The divergence
    sums are rounded to 4 (float accumulation order differs across
    engines at vocab scale); ratios to 6.

    Scale: one tokenize+groupBy pass per corpus (vocab-bounded
    outputs), one full-outer join of the two frequency tables
    (vocab-scale, never corpus-scale), totals folded back as a 1-row
    broadcast, one final agg. No Python, no corpus-corpus join.
    """
    fa = (
        a.select(F.explode(search_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    fb = (
        b.select(F.explode(search_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    j = fa.join(fb, "tok", "full_outer").select(
        F.coalesce(F.col("na"), F.lit(0)).cast("double").alias("na"),
        F.coalesce(F.col("nb"), F.lit(0)).cast("double").alias("nb"),
    )
    totals = j.agg(
        F.coalesce(F.sum("na"), F.lit(0.0)).alias("ta"),
        F.coalesce(F.sum("nb"), F.lit(0.0)).alias("tb"),
        F.count(F.lit(1)).alias("v_union"),
        F.count_if(F.col("na") > 0).alias("va"),
        F.count_if(F.col("nb") > 0).alias("vb"),
        F.count_if((F.col("na") > 0) & (F.col("nb") > 0)).alias("v_both"),
    )
    t = j.crossJoin(F.broadcast(totals))
    # try_divide: an empty side has ta/tb = 0 and ANSI mode would turn
    # the division into a job abort; NULL terms fold to NULL sums,
    # which the ok-guard below reports as NULL divergences
    p = F.try_divide(F.col("na"), F.col("ta"))
    q = F.try_divide(F.col("nb"), F.col("tb"))
    m = (p + q) / 2
    al = F.lit(float(alpha))
    ps = F.try_divide(
        F.col("na") + al, F.col("ta") + al * F.col("v_union")
    )
    qs = F.try_divide(
        F.col("nb") + al, F.col("tb") + al * F.col("v_union")
    )
    sums = t.agg(
        F.max("ta").alias("ta"),
        F.max("tb").alias("tb"),
        F.max("va").alias("va"),
        F.max("vb").alias("vb"),
        F.max("v_both").alias("v_both"),
        F.max("v_union").alias("v_union"),
        F.sum(
            F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0))
            + F.when(q > 0, 0.5 * q * F.log(q / m)).otherwise(F.lit(0.0))
        ).alias("js"),
        F.sum(ps * F.log(ps / qs)).alias("kl_ab"),
        F.sum(qs * F.log(qs / ps)).alias("kl_ba"),
        F.sum(F.abs(p - q) / 2).alias("tvd"),
    )
    ok = (F.col("ta") > 0) & (F.col("tb") > 0)
    return sums.select(
        F.coalesce(F.col("ta"), F.lit(0.0)).cast("bigint").alias("tokens_a"),
        F.coalesce(F.col("tb"), F.lit(0.0)).cast("bigint").alias("tokens_b"),
        F.coalesce(F.col("va"), F.lit(0)).cast("bigint").alias("vocab_a"),
        F.coalesce(F.col("vb"), F.lit(0)).cast("bigint").alias("vocab_b"),
        F.round(
            F.when(
                F.col("v_union") > 0,
                F.col("v_both") / F.col("v_union").cast("double"),
            ),
            6,
        ).alias("vocab_jaccard"),
        F.round(F.when(ok, F.col("js")), round_to).alias("js_divergence"),
        F.round(F.when(ok, F.col("kl_ab")), round_to).alias("kl_ab"),
        F.round(F.when(ok, F.col("kl_ba")), round_to).alias("kl_ba"),
        F.round(F.when(ok, F.col("tvd")), round_to).alias("tvd"),
    )


def corpus_diversity(
    docs: DataFrame,
    text_col: str = "text",
    zipf_top: int = 10_000,
    round_to: int = 6,
    cache_freq: bool = False,
) -> DataFrame:
    """One-row corpus report →
    (n_docs, n_tokens, vocab_size, type_token_ratio, distinct_2,
    token_entropy, top_token_frac, zipf_slope).

    - ``type_token_ratio``: vocab / tokens (collapses toward 0 on
      template floods).
    - ``distinct_2``: distinct bigrams / total bigrams — repetition
      shows here even when unigram stats look healthy.
    - ``token_entropy``: Shannon entropy of the unigram distribution
      in nats.
    - ``top_token_frac``: mass of the single most frequent token (head
      concentration; natural English ≈ 0.05 for "the").
    - ``zipf_slope``: OLS slope of ln(freq) on ln(rank) over the
      ``zipf_top`` most frequent types (rank 1 = most frequent; ties
      broken by token so the fit is deterministic). Empty corpora
      return a single all-NULL/zero row rather than erroring.

    The unigram frequency table feeds two consumers (totals and the
    Zipf head) and Catalyst does not share subplans, so the lazy plan
    tokenizes the corpus twice (plus once for bigrams).
    ``cache_freq=True`` persists the vocab-bounded frequency frame so
    the corpus is tokenized once per n-gram order — use it at scale and
    ``unpersist()`` the returned report's lineage when done (or just
    accept the extra pass; the frame is MEMORY_AND_DISK so the second
    consumer reads the cache even before the first action finishes it).
    """
    toks = docs.select(F.explode(search_tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    if cache_freq:
        freq = freq.persist()

    n_docs = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
    )
    # vocab-bounded scalar pass: totals + entropy + head mass
    totals = freq.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.max("n").alias("top_n"),
        # Σ n·ln n — entropy folds out of this and the grand total:
        # H = ln N − (Σ n·ln n)/N, one pass, no per-row p division
        F.sum(F.col("n").cast("double") * F.log(F.col("n").cast("double"))).alias(
            "sum_nlogn"
        ),
    )
    # Zipf head: top-N by (freq desc, token asc) — TakeOrderedAndProject
    # at head size, never a full-vocab sort; the unpartitioned
    # row_number window then runs over AT MOST zipf_top rows
    head = freq.orderBy(F.desc("n"), F.asc("tok")).limit(zipf_top)
    ranked = head.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("tok")))
            .cast("double")
        ).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    zipf = ranked.agg(
        F.when(
            F.var_pop("x") > 0, F.covar_pop("x", "y") / F.var_pop("x")
        ).alias("zipf_slope")
    )

    # bigram-distinct ratio: one more linear pass, reduced to two scalars
    t = search_tokens(text_col)
    m = F.greatest(F.size(t) - 1, F.lit(0))
    bi = docs.select(
        F.explode(
            F.zip_with(
                F.slice(t, 1, m),
                F.slice(t, 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    bi_stats = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("n")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_bigrams"),
        F.count(F.lit(1)).alias("distinct_bigrams"),
    )

    row = (
        n_docs.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(zipf))
        .crossJoin(F.broadcast(bi_stats))
    )
    nt = F.col("n_tokens").cast("double")
    return row.select(
        "n_docs",
        "n_tokens",
        "vocab_size",
        F.round(
            F.when(nt > 0, F.col("vocab_size") / nt), round_to
        ).alias("type_token_ratio"),
        F.round(
            F.when(
                F.col("n_bigrams") > 0,
                F.col("distinct_bigrams") / F.col("n_bigrams").cast("double"),
            ),
            round_to,
        ).alias("distinct_2"),
        F.round(
            F.when(nt > 0, F.log(nt) - F.col("sum_nlogn") / nt), round_to
        ).alias("token_entropy"),
        F.round(F.when(nt > 0, F.col("top_n") / nt), round_to).alias(
            "top_token_frac"
        ),
        F.round(F.col("zipf_slope"), round_to).alias("zipf_slope"),
    )
