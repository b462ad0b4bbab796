"""Multinomial Naive Bayes text classification — the fastText-style
linear classifier tier of a training-data pipeline: train a
quality/domain/language classifier on a labeled seed set, score every
candidate document map-side, keep the wanted classes (the CCNet /
LLaMA "is this page Wikipedia-like?" filter, the RedPajama domain
router, language-ID with a trained prior instead of heuristics).

No analog in the reference engine (its surface stops at profiling /
validation; SURVEY.md §2.8) — part of the training-data-pipeline
extension surface, alongside ``functions.lm`` (perplexity filtering)
and ``functions.text`` (heuristic quality).

Model: multinomial NB with add-k smoothing over the lowercase-alnum
tokenizer shared with ``operators.ranking``:

``score(d, c) = ln p(c) + Σ_t tf(t, d) · ln p(t | c)``
``p(t | c) = (count(c, t) + k) / (total(c) + k·D)``

where D is the feature-space size: the distinct trained vocabulary by
default, or ``num_features`` under the hashing trick. Unseen tokens
fall through the same formula with count 0, so scoring a corpus
disjoint from training is well-defined.

Scale design (the part that matters at 100 TB):

- **Training** is one explode + one groupBy on (label, feature) —
  map-side combined, output bounded by labels × vocabulary, never by
  corpus size. Class totals, priors, and D derive from the counts
  frame and a doc-count agg (tiny), never a second corpus pass.
- **The hashing trick** (``num_features=2**18``-ish) bounds the model
  at labels × num_features rows regardless of corpus vocabulary — the
  standard fastText move, and what keeps the model broadcastable when
  the training set is web-scale.
- **Scoring** is one corpus pass with ZERO corpus-corpus joins: token
  rows fan out by the (small) class count, the model left-joins on as
  a broadcast (``broadcast_model=True`` — the 100 TB default), and the
  single shuffle is the map-side-combined (doc, class) aggregate whose
  output is docs × L scalar rows. Unseen tokens need no case split —
  they ride the same ``ln(count + k)`` expression with count 0.
- Everything is built-in expressions; no Python on the executors.

DuckDB oracle parity: with default token features the whole pipeline
is expressible in SQL (``regexp_split_to_array`` + joins + ``ln``);
scores are rounded so summation-order ULP drift cannot flip the
comparison, and argmax ties break on label ascending in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.operators.ranking import search_tokens


def _char_gram_array(norm: F.Column, n: int) -> F.Column:
    """Overlapping character n-grams of a (normalized) string column as
    an array — zip_with over shifted slices of the char array, the
    linear-time construction (an indexed ``transform(sequence, i ->
    substr(t, i, n))`` re-inlines the normalization per element; see
    ``operators.dedup.shingles`` for the measured quadratic blowup).
    Shorter-than-n strings yield an empty array."""
    chars = F.filter(F.split(norm, ""), lambda c: c != "")
    if n == 1:
        return chars
    m = F.greatest(F.size(chars) - (n - 1), F.lit(0))
    acc = F.slice(chars, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(chars, j, m), lambda a, b: F.concat(a, b))
    return acc


def _features(
    text_col: str,
    num_features: int | None,
    analyzer: str = "word",
    char_n: int | tuple[int, ...] = 3,
) -> F.Column:
    """array<string> of per-occurrence features for one document.

    ``analyzer="word"``: the lowercase-alnum tokens shared with
    ``operators.ranking``. ``analyzer="char"``: overlapping character
    n-grams (``char_n`` an int or a tuple of sizes, concatenated) over
    the lowercased text with whitespace runs collapsed to one space —
    the fastText-style featurization that sees UNSEGMENTED scripts
    (Chinese/Japanese text has no spaces, so word features are blind
    to it; character features are not).

    Exact mode keeps the feature string; hashing mode buckets it with
    ``pmod(xxhash64(feature), num_features)`` — non-negative, stable
    across sessions, and cast to string so both modes share one model
    schema.
    """
    if analyzer == "word":
        toks = search_tokens(text_col)
    elif analyzer == "char":
        ns = tuple(char_n) if isinstance(char_n, (tuple, list)) else (char_n,)
        if not ns or any(int(n) < 1 for n in ns):
            raise ValueError(f"char_n must be positive sizes, got {char_n!r}")
        norm = F.trim(
            F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
        )
        grams = [_char_gram_array(norm, int(n)) for n in ns]
        toks = grams[0] if len(grams) == 1 else F.concat(*grams)
    else:
        raise ValueError(f"analyzer must be 'word' or 'char', got {analyzer!r}")
    if num_features is None:
        return toks
    return F.transform(
        toks,
        lambda t: F.pmod(F.xxhash64(t), F.lit(num_features)).cast("string"),
    )


@dataclass
class NBModel:
    """A trained classifier: feature counts, class stats, feature-space
    size — all lazy DataFrames / plain ints, so a model is a plan until
    scored (persist ``counts`` when scoring many batches).

    ``counts``: (label, feature, n); ``classes``: (label, total,
    n_docs); ``dims``: single row (d, n_docs_all).
    """

    counts: DataFrame
    classes: DataFrame
    dims: DataFrame
    num_features: int | None
    analyzer: str = "word"
    char_n: int | tuple[int, ...] = 3


def train_nb(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int | None = None,
    min_count: int = 1,
    analyzer: str = "word",
    char_n: int | tuple[int, ...] = 3,
) -> NBModel:
    """Count (label, feature) occurrences over a labeled corpus →
    :class:`NBModel`.

    ``min_count`` prunes rare features from the model (the standard
    size/quality trade — pruned features score as unseen). Class
    totals are computed BEFORE pruning so probabilities stay ≤ 1 and
    sum correctly over the full event space. Rows with a NULL label
    are dropped (unlabeled seeds train nothing).
    """
    labeled = docs.filter(F.col(label_col).isNotNull())
    pairs = labeled.select(
        F.col(label_col).cast("string").alias("label"),
        F.explode(
            _features(text_col, num_features, analyzer, char_n)
        ).alias("feature"),
    )
    counts = pairs.groupBy("label", "feature").agg(
        F.count(F.lit(1)).alias("n")
    )
    # Materialize the counts ON FIRST USE (lazy local checkpoint): the
    # model's classes/dims frames and every scoring join all derive
    # from this one aggregate, and leaving it lazy re-runs the full
    # training-corpus explode+groupBy for EACH of them (measured: three
    # corpus passes per classify_nb call). The model is labels ×
    # vocabulary — broadcastable by design — so pinning it is safe by
    # construction; nothing corpus-sized is retained.
    counts = counts.localCheckpoint(eager=False)
    totals = counts.groupBy("label").agg(F.sum("n").alias("total"))
    n_docs = labeled.groupBy(F.col(label_col).cast("string").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # both sides are class-count-sized; broadcast so the model plan
    # never sort-merges (AQE would get there too, but only at runtime)
    classes = totals.join(F.broadcast(n_docs), "label")
    if num_features is None:
        dims = counts.select("feature").distinct().agg(
            F.count(F.lit(1)).alias("d")
        )
    else:
        dims = counts.sparkSession.range(1).select(
            F.lit(num_features).cast("long").alias("d")
        )
    dims = dims.crossJoin(
        labeled.agg(F.count(F.lit(1)).alias("n_docs_all"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return NBModel(
        counts=counts, classes=classes, dims=dims,
        num_features=num_features, analyzer=analyzer, char_n=char_n,
    )


def score_nb(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
    broadcast_model: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-(document, class) log score under ``model`` →
    (id, label, n_tokens, score).

    Every document gets a row per class — including empty documents,
    which score on the class prior alone (``n_tokens`` 0). ``score``
    is the joint log-likelihood ``ln p(c) + Σ tf·ln p(t|c)``; compare
    WITHIN a document (argmax / margins), not across documents of
    different lengths.

    ``broadcast_model=True`` broadcasts counts AND class stats —
    scoring becomes a map-only pass over the corpus beyond the two
    per-document aggregates (use when the pruned model fits executor
    memory; the 100 TB default).
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    from sparvi_core_spark.plans.fanout import fan_out_compact

    docs = fan_out_compact(docs)
    # Label-WIDE evaluation (round 11): the previous shape cross-joined
    # every exploded feature occurrence with the label set before the
    # model join — the per-row work (join probe + ln() + hash-agg
    # update) ran L times per feature occurrence, which at char-n-gram
    # feature densities (~3 features per char) made scoring O(L·chars).
    # Here the label axis lives in COLUMNS instead of rows: the model
    # is pivoted to one row per feature carrying all L counts (the same
    # broadcastable labels × vocab mass, reorganized), each feature
    # occurrence is joined ONCE, and the per-doc aggregate sums L
    # parallel columns map-side. The joined row count drops L-fold; the
    # single shuffle carries docs-grain rows either way (partial
    # aggregation reduced it to that before the exchange in both
    # shapes). Scores are identical: the same ln(count + k) terms are
    # summed per (doc, label) — in a different order, which the
    # documented rounding contract (round_to absorbs summation-order
    # ULP drift) already covers — and the prior/denominator constants
    # go through the same JVM ln on the same values (constant-folded
    # literals here, per-row column math before). The class-stats /
    # dims frames are label-count-sized; collecting them here (tiny
    # jobs at plan-construction time) is the price of turning the
    # label axis into columns.
    cls_rows = sorted(model.classes.collect(), key=lambda r: r["label"])
    dims_row = model.dims.first()
    labels = [r["label"] for r in cls_rows]
    wide = model.counts.groupBy("feature").agg(
        *[
            F.sum(F.when(F.col("label") == lbl, F.col("n"))).alias(f"__n_{i}")
            for i, lbl in enumerate(labels)
        ]
    )
    if broadcast_model:
        wide = F.broadcast(wide)
    # explode_outer keeps empty/NULL documents (one NULL-feature row) so
    # they still score on the prior; every real token contributes
    # ln(count + k) with an unseen count of 0 — no seen/unseen case
    # split, one left join, one map-side-combined groupBy, zero
    # corpus-corpus joins
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            _features(text_col, model.num_features, model.analyzer, model.char_n)
        ).alias("feature"),
    )
    joined = tok.join(wide, ["feature"], "left")

    def _contrib(i: int) -> F.Column:
        return F.when(F.col("feature").isNull(), F.lit(0.0)).otherwise(
            F.log(
                F.coalesce(F.col(f"__n_{i}"), F.lit(0)).cast("double")
                + F.lit(float(add_k))
            )
        )

    per = joined.groupBy("id").agg(
        *[F.sum(_contrib(i)).alias(f"__s_{i}") for i in range(len(labels))],
        F.sum(
            F.when(F.col("feature").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_tokens"),
    )
    d_val, n_docs_all = dims_row["d"], dims_row["n_docs_all"]
    scores = []
    for i, r in enumerate(cls_rows):
        denom = F.log(
            F.lit(r["total"]).cast("double")
            + F.lit(float(add_k)) * F.lit(d_val).cast("double")
        )
        score = (
            F.log(F.lit(r["n_docs"]).cast("double") / F.lit(n_docs_all))
            + F.col(f"__s_{i}")
            - F.col("n_tokens").cast("double") * denom
        )
        scores.append(
            F.struct(
                F.lit(r["label"]).alias("label"),
                F.round(score, round_to).alias("score"),
            )
        )
    # unpivot back to the (id, label, n_tokens, score) contract — the
    # explode is over an L-element literal-built array per DOC row
    pairs = (
        F.array(*scores)
        if scores
        else F.array().cast("array<struct<label:string,score:double>>")
    )
    return per.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.explode(pairs).alias("__ls"),
    ).select(
        id_col,
        F.col("__ls.label").alias("label"),
        "n_tokens",
        F.col("__ls.score").alias("score"),
    )


def classify_nb(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
    broadcast_model: bool = True,
    round_to: int = 6,
    with_tokens: bool = False,
) -> DataFrame:
    """Argmax prediction per document → (id, label, score, margin)
    [+ ``n_tokens`` when ``with_tokens`` — the per-doc feature count,
    0 for empty/NULL docs, which lets callers route "nothing to score"
    docs (e.g. language-ID's ``und``) without a second corpus pass].

    ``margin`` is the winning score minus the runner-up (0.0 for a
    single-class model) — threshold it for precision/recall control.
    Ties break on label ascending, deterministically, matching the SQL
    oracle's ``ORDER BY score DESC, label ASC``.
    """
    scored = score_nb(
        docs,
        model,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_model=broadcast_model,
        round_to=round_to,
    )
    # min_by over (-score, label) = max score, ties to the smallest
    # label — one map-side-combined aggregate, no window sort; the
    # collected score list is bounded by the class count, not the data
    key = F.struct((-F.col("score")).alias("neg"), F.col("label"))
    agg = scored.groupBy(id_col).agg(
        F.min_by("label", key).alias("label"),
        F.max("score").alias("score"),
        F.sort_array(F.collect_list("score"), asc=False).alias("_scores"),
        F.max("n_tokens").alias("n_tokens"),
    )
    extra = ["n_tokens"] if with_tokens else []
    return agg.select(
        id_col,
        "label",
        "score",
        F.round(
            F.when(
                F.size("_scores") > 1,
                F.col("score") - F.element_at("_scores", 2),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("margin"),
        *extra,
    )


def nb_filter(
    docs: DataFrame,
    model: NBModel,
    keep_labels: list[str] | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_margin: float = 0.0,
    add_k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Keep documents whose predicted class is in ``keep_labels`` with
    at least ``min_margin`` over the runner-up — the deployed shape of
    the quality filter. Returns the input columns + ``label`` +
    ``margin``.
    """
    if isinstance(keep_labels, str):
        keep_labels = [keep_labels]
    preds = classify_nb(
        docs,
        model,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_model=broadcast_model,
    ).select(id_col, "label", "margin")
    return docs.join(preds, id_col).filter(
        F.col("label").isin(keep_labels) & (F.col("margin") >= min_margin)
    )


def merge_nb_models(a: NBModel, b: NBModel, min_count: int = 1) -> NBModel:
    """Merge two models trained with ``min_count=1`` into EXACTLY the
    model a joint retrain over both seed sets would produce — the
    (label, feature) counts and per-class totals are sufficient
    statistics, so the merge is two class/vocab-bounded groupBy-sums
    (no corpus re-scan; the incremental path: keep yesterday's counts,
    train on today's labeled batch alone, merge).

    Feature spaces must match (same ``num_features``, or both exact).
    Models trained with ``min_count > 1`` lost sub-floor counts —
    merging them would NOT equal a joint retrain; prune at merge time
    via ``min_count`` here instead.
    """
    if a.num_features != b.num_features:
        raise ValueError(
            "cannot merge models with different feature spaces: "
            f"{a.num_features} vs {b.num_features}"
        )
    if (a.analyzer, a.char_n) != (b.analyzer, b.char_n):
        raise ValueError(
            "cannot merge models with different featurizers: "
            f"{(a.analyzer, a.char_n)} vs {(b.analyzer, b.char_n)}"
        )
    counts = (
        a.counts.unionByName(b.counts)
        .groupBy("label", "feature")
        .agg(F.sum("n").alias("n"))
    )
    totals = counts.groupBy("label").agg(F.sum("n").alias("total"))
    n_docs = (
        a.classes.select("label", "n_docs")
        .unionByName(b.classes.select("label", "n_docs"))
        .groupBy("label")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
    classes = totals.join(F.broadcast(n_docs), "label")
    if a.num_features is None:
        dims = counts.select("feature").distinct().agg(
            F.count(F.lit(1)).alias("d")
        )
    else:
        dims = counts.sparkSession.range(1).select(
            F.lit(a.num_features).cast("long").alias("d")
        )
    dims = dims.crossJoin(
        classes.agg(F.sum("n_docs").alias("n_docs_all"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return NBModel(
        counts=counts, classes=classes, dims=dims,
        num_features=a.num_features, analyzer=a.analyzer, char_n=a.char_n,
    )
