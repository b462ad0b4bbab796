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

# hashed-feature models score through the Arrow kernel only while the
# bucket→row lookup table stays task-memory-trivial (int32 per bucket)
_HASHED_KERNEL_MAX_D = 1 << 22


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


def _nb_featurizer(analyzer: str, char_n, num_features):
    """Python twin of :func:`_features` for the Arrow scoring kernel —
    returns ``text -> [feature, ...]`` reproducing the JVM featurizer
    exactly (verified char-for-char in tests: Java regex ``\\s`` and
    ``[^a-z0-9]`` are ASCII classes → ``re.ASCII``; ``F.lower`` and
    codepoint splitting match ``str.lower``/``list`` on every probed
    edge case incl. astral chars, final sigma, İ; ``F.trim`` strips
    ASCII spaces). Hashed features (``num_features``) have no Python
    twin here (xxhash64 unavailable) — callers keep the join path."""
    import re

    if num_features is not None:
        raise ValueError("hashed features have no Python featurizer")
    if analyzer == "word":
        split = re.compile("[^a-z0-9]+", re.ASCII).split

        def feats(t):
            if t is None:
                return []
            return [w for w in split(t.lower()) if w]

        return feats
    ns = tuple(char_n) if isinstance(char_n, (tuple, list)) else (char_n,)
    ns = tuple(int(n) for n in ns)
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"char_n must be positive sizes, got {char_n!r}")
    ws = re.compile(r"\s+", re.ASCII)

    def feats(t):
        if t is None:
            return []
        norm = ws.sub(" ", t.lower()).strip(" ")
        out = []
        for n in ns:
            if n == 1:
                out.extend(norm)
            else:
                for i in range(len(norm) - n + 1):
                    out.append(norm[i : i + n])
        return out

    return feats


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
    # Materialize the counts ON FIRST USE: the model's classes/dims
    # frames and every scoring join all derive from this one
    # aggregate, and leaving it fully lazy re-runs the full
    # training-corpus explode+groupBy for EACH of them (measured:
    # three corpus passes per classify_nb call; policy + the
    # none/lazy/eager comparison in plans.modelframe). The model is
    # labels × vocabulary — broadcastable by design — so pinning it
    # is safe by construction; nothing corpus-sized is retained.
    from sparvi_core_spark.plans.modelframe import materialize_model_frame

    counts = materialize_model_frame(counts)
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


def _score_nb_per_doc_arrow(
    docs: DataFrame,
    model: NBModel,
    id_col: str,
    text_col: str,
    add_k: float,
    labels: list[str],
) -> DataFrame:
    """The per-doc NB reduction as a ``mapInPandas`` kernel →
    ``(id, __s_0.., n_tokens)``, bit-identical to the explode ×
    broadcast-join × groupBy shape (see the call site for the
    equivalence argument). Only the (id, text) columns cross the
    Python boundary; only docs-grain rows come back."""
    import numpy as np

    spark = docs.sparkSession
    L = len(labels)
    label_ix = {lbl: i for i, lbl in enumerate(labels)}
    # every log the JVM path would take, computed BY the JVM (py4j
    # round-trips doubles bit-exactly): ln(count + k) per observed
    # count plus the unseen ln(0 + k)
    jlog = spark._jvm.java.lang.Math.log
    log_cache: dict[float, float] = {}

    def jvm_log(x: float) -> float:
        v = log_cache.get(x)
        if v is None:
            v = float(jlog(float(x)))
            log_cache[x] = v
        return v

    k = float(add_k)
    log_k = jvm_log(0.0 + k)
    counts_rows = model.counts.collect()  # labels × vocab — bounded
    vocab: dict[str, int] = {}
    mat: list = []
    for r in counts_rows:
        f = r["feature"]
        ix = vocab.get(f)
        if ix is None:
            ix = len(mat)
            vocab[f] = ix
            mat.append(np.full(L, log_k, dtype=np.float64))
        mat[ix][label_ix[r["label"]]] = jvm_log(float(r["n"]) + k)
    # sentinel row for unseen features (index -1 gathers the last row)
    mat.append(np.full(L, log_k, dtype=np.float64))
    M = np.vstack(mat)
    id_type = docs.schema[id_col].dataType.simpleString()
    s_fields = ", ".join(f"__s_{i} double" for i in range(L))
    schema = f"id {id_type}, {s_fields}, n_tokens bigint"

    # Hashed features (round 12): the trained vocabulary is bucket ids
    # from pmod(xxhash64(feature), D) — reproduced in NumPy
    # (functions.xxh64np, parity-pinned against F.xxhash64) over byte
    # SPANS of a canonical per-batch buffer (functions.spanfeats), so
    # no per-feature Python object exists: featurize → hash → pmod →
    # direct array lookup into M.
    batch_rows = None
    if model.num_features is not None:
        from sparvi_core_spark.functions.spanfeats import (
            char_ngram_spans,
            word_token_spans,
        )
        from sparvi_core_spark.functions.xxh64np import xxh64_spans

        D = np.int64(model.num_features)
        row_of_bucket = np.full(
            int(D), len(mat) - 1, dtype=np.int32
        )  # default: the unseen sentinel row
        for f, ix in vocab.items():
            row_of_bucket[int(f)] = ix
        if model.analyzer == "word":

            def batch_rows(texts):
                buf, starts, lens, doc = word_token_spans(texts)
                b = xxh64_spans(buf, starts, lens) % D  # == pmod
                return row_of_bucket[b], doc

        else:
            ns_h = (
                tuple(model.char_n)
                if isinstance(model.char_n, (tuple, list))
                else (model.char_n,)
            )
            ns_h = tuple(int(x) for x in ns_h)

            def batch_rows(texts):
                buf, starts, lens, doc, order = char_ngram_spans(
                    texts, ns_h
                )
                b = xxh64_spans(buf, starts, lens) % D
                return row_of_bucket[b][order], doc[order]

    # Exact char n-grams up to n=3 take a fully vectorized path:
    # codepoints via utf-32 (each < 2^21), an n-gram packed into one
    # int64 (3·21 = 63 bits), vocab lookups via searchsorted per gram
    # size — zero per-feature Python objects. Exact word features (and
    # n > 3) use the string featurizer twin.
    char_ns: tuple[int, ...] | None = None
    if batch_rows is None and model.analyzer == "char":
        ns = (
            tuple(model.char_n)
            if isinstance(model.char_n, (tuple, list))
            else (model.char_n,)
        )
        ns = tuple(int(x) for x in ns)
        if ns and all(1 <= x <= 3 for x in ns):
            char_ns = ns
    if char_ns is not None:
        import re

        ws = re.compile(r"\s+", re.ASCII)
        # per gram size: sorted packed keys + their row indices in M
        by_n: dict[int, tuple] = {}
        for f, ix in vocab.items():
            nn = len(f)
            cps = np.frombuffer(f.encode("utf-32-le"), dtype=np.uint32)
            key = 0
            for c in cps.astype(np.int64):
                key = (key << 21) | int(c)
            by_n.setdefault(nn, ([], []))
            by_n[nn][0].append(key)
            by_n[nn][1].append(ix)
        lookup: dict[int, tuple] = {}
        for nn, (keys, ixs) in by_n.items():
            ka = np.asarray(keys, dtype=np.int64)
            ia = np.asarray(ixs, dtype=np.int64)
            order = np.argsort(ka)
            lookup[nn] = (ka[order], ia[order])
        empty_keys = np.empty(0, dtype=np.int64)

        def doc_row_ixs(t):
            norm = ws.sub(" ", t.lower()).strip(" ")
            if not norm:
                return None
            cps = np.frombuffer(
                norm.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            parts = []
            for nn in char_ns:
                m = len(cps) - nn + 1
                if m <= 0:
                    parts.append(empty_keys)
                    continue
                q = cps[:m].copy()
                for j in range(1, nn):
                    q = (q << 21) | cps[j : j + m]
                ks, ir = lookup.get(nn, (empty_keys, empty_keys))
                pos = np.searchsorted(ks, q)
                pos[pos >= len(ks)] = 0
                hit = len(ks) > 0
                valid = (ks[pos] == q) if hit else np.zeros(m, dtype=bool)
                rows = np.where(valid, ir[pos] if hit else -1, -1)
                parts.append(rows)
            return np.concatenate(parts)

    elif batch_rows is None:
        featurize = _nb_featurizer(model.analyzer, model.char_n, None)

        def doc_row_ixs(t):
            feats = featurize(t)
            if not feats:
                return None
            return np.fromiter(
                (vocab.get(f, -1) for f in feats),
                dtype=np.int64,
                count=len(feats),
            )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            S = np.zeros((n, L), dtype=np.float64)
            T = np.zeros(n, dtype=np.int64)
            texts = pdf["__text"]
            if batch_rows is not None:
                # hashed path: one vectorized featurize+hash pass for
                # the whole batch; rows/doc are (doc, feature-order)
                # sorted, so each doc's slice is contiguous
                rows, doc = batch_rows(texts)
                ptr = np.searchsorted(doc, np.arange(n + 1))
                for j in range(n):
                    a, b = int(ptr[j]), int(ptr[j + 1])
                    if a == b:
                        continue
                    # cumsum: strictly sequential, the same order the
                    # JVM partial aggregate added these
                    S[j] = np.cumsum(M[rows[a:b]], axis=0)[-1]
                    T[j] = b - a
            else:
                for j in range(n):
                    t = texts.iloc[j]
                    ixs = None if t is None else doc_row_ixs(t)
                    if ixs is None or len(ixs) == 0:
                        continue
                    # cumsum is a strictly sequential accumulation — the
                    # same order the JVM partial aggregate added these
                    S[j] = np.cumsum(M[ixs], axis=0)[-1]
                    T[j] = len(ixs)
            out = {"id": pdf["__id"].to_numpy()}
            for i in range(L):
                out[f"__s_{i}"] = S[:, i]
            out["n_tokens"] = T
            yield pd.DataFrame(out)

    from sparvi_core_spark.plans.fanout import fan_out_compact

    narrow = fan_out_compact(
        docs.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
        )
    )
    return narrow.mapInPandas(kernel, schema)


def _score_nb_wide(
    docs: DataFrame,
    model: NBModel,
    id_col: str,
    text_col: str,
    add_k: float,
    broadcast_model: bool,
    round_to: int,
) -> tuple[DataFrame, list]:
    """Shared scoring core → ``(per, label_scores)``: ``per`` is the
    label-WIDE per-doc frame (id, __s_0.., n_tokens) and
    ``label_scores`` is ``[(label, rounded score Column), ...]`` over
    it — :func:`score_nb` explodes this to the public row contract,
    :func:`classify_nb` reduces it map-side."""
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
    labels = [r["label"] for r in cls_rows]
    if not labels:
        # zero-class model (trained on zero labeled rows): nothing can
        # score. Short-circuit BEFORE the wide pivot — its
        # groupBy().agg(*[]) over zero label columns would raise — and
        # before the dims job. The empty per-frame keeps the (id,
        # n_tokens) contract; score_nb's explode over the empty label
        # array and classify_nb's zero-class guard both yield the same
        # zero rows the old crossJoin-with-no-labels shape produced.
        per = docs.select(
            F.col(id_col).alias("id"),
            F.lit(0).cast("bigint").alias("n_tokens"),
        ).limit(0)
        return per, []
    dims_row = model.dims.first()
    # Arrow scoring kernel (round 11): with a broadcastable model and
    # exact (unhashed) features, the explode × broadcast-join ×
    # hash-agg pipeline materializes ~3 feature rows per char of the
    # corpus just to look each one up in the model and add a log — the
    # whole per-doc reduction fits guide §4.2's "hand batches to
    # native code" shape (the gopher_repetition precedent). The kernel
    # reproduces the JVM path bit-for-bit: the featurizer twin is
    # verified char-identical; every ln(count+k) is precomputed ON THE
    # JVM (py4j Math.log — same libm as the expression path) and the
    # per-doc sum accumulates in the same order the hash aggregate
    # did (one partial per doc, row order = feature order; cumsum is
    # strictly sequential). One caveat, documented: the kernel scores
    # each ROW; the groupBy shape merged duplicate ids into one
    # feature bag (itself merge-order-nondeterministic). Ids are
    # unique by the same caller contract as everywhere else.
    # Hashed-feature models take the kernel too (round 12): the
    # featurizer hashes byte spans with the NumPy xxhash64 twin
    # (functions.xxh64np, parity-pinned) and looks buckets up directly
    # — gated on the bucket table staying small (int32 per bucket; the
    # 4M default cap is 16 MB per task). Non-broadcast models, and
    # hashed models over the cap, keep the join shape.
    use_kernel = broadcast_model and (
        model.num_features is None
        or model.num_features <= _HASHED_KERNEL_MAX_D
    )
    if use_kernel:
        per = _score_nb_per_doc_arrow(
            docs, model, id_col, text_col, add_k, labels
        )
    else:
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
    label_scores = []
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
        label_scores.append((r["label"], F.round(score, round_to)))
    return per, label_scores


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
    per, label_scores = _score_nb_wide(
        docs, model, id_col, text_col, add_k, broadcast_model, round_to
    )
    # unpivot to the (id, label, n_tokens, score) contract — the
    # explode is over an L-element literal-built array per DOC row
    scores = [
        F.struct(F.lit(lbl).alias("label"), sc.alias("score"))
        for lbl, sc in label_scores
    ]
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
    per, label_scores = _score_nb_wide(
        docs, model, id_col, text_col, add_k, broadcast_model, round_to
    )
    spark = docs.sparkSession
    if not label_scores:
        # zero-class model: the exploded form had no rows to argmax
        schema = f"`{id_col}` {docs.schema[id_col].dataType.simpleString()}, " \
                 "label string, score double, margin double" + \
                 (", n_tokens bigint" if with_tokens else "")
        return spark.createDataFrame([], schema)
    # The label axis already lives in COLUMNS on `per` (round 11), so
    # the argmax is a per-ROW reduction — sort an L-element literal
    # array of (neg score, label, score) structs — instead of the old
    # explode-to-rows + second groupBy shuffle. Identical semantics:
    # struct ordering on (neg, label) IS min_by's key (max score, ties
    # to the smallest label), element 2's score is the runner-up value
    # the sorted collect_list produced, and the same rounded score
    # columns feed both. Zero exchanges after scoring.
    arr = F.sort_array(
        F.array(*[
            F.struct(
                (-sc).alias("neg"),
                F.lit(lbl).alias("label"),
                sc.alias("score"),
            )
            for lbl, sc in label_scores
        ])
    )
    extra = ["n_tokens"] if with_tokens else []
    return per.select(
        F.col("id").alias(id_col),
        F.col("n_tokens"),
        arr.alias("__a"),
    ).select(
        id_col,
        F.col("__a")[0]["label"].alias("label"),
        F.col("__a")[0]["score"].alias("score"),
        F.round(
            F.when(
                F.size("__a") > 1,
                F.col("__a")[0]["score"] - F.col("__a")[1]["score"],
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
