"""End-to-end training-corpus preparation: the engine's operators
composed into the standard LLM-data pipeline shape:

    quality-score → quality-filter → near-dup detection → survivor keep

One call produces the cleaned corpus plus a per-stage attrition report —
the numbers a data curator actually monitors.

Report accounting rides the passes that already run (``df.observe()``
metrics + one small agg over the checkpointed cluster labels) instead of
issuing its own corpus-scale count jobs; see ``prepare_corpus``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation, functions as F

from sparvi_core_spark.functions.text import quality_score_expr
from sparvi_core_spark.operators.dedup import dedup_clusters, minhash_dedup_pairs


class CorpusReport(dict):
    """Attrition report for :func:`prepare_corpus`.

    Behaves as a plain dict. ``input_docs``, ``low_quality_dropped`` and
    ``near_dup_clusters`` are present eagerly; ``output_docs`` and
    ``near_dup_dropped`` resolve lazily from an ``observe()`` metric
    attached to the returned ``clean`` frame, so they ride the CALLER's
    first action (typically the write) instead of costing a dedicated
    corpus-scale count. If they are read before any action ran, one
    ``count()`` is issued to fill the metric — never more.
    """

    _LAZY = ("output_docs", "near_dup_dropped")

    def __init__(self, eager: dict[str, Any], clean: DataFrame, obs: Observation, n_quality: int):
        super().__init__(eager)
        self._clean = clean
        self._obs: Observation | None = obs
        self._n_quality = n_quality

    def _resolve(self) -> None:
        if self._obs is None:
            return
        try:
            # non-blocking probe: filled iff the caller already ran an
            # action over the observed frame (throws/empty otherwise)
            filled = not self._obs._jo.getOrEmpty().isEmpty()
        except Exception:
            filled = False
        if not filled:
            self._clean.count()  # one action fills the metric
        n_output = int(self._obs.get["n_output"])
        dict.__setitem__(self, "output_docs", n_output)
        dict.__setitem__(self, "near_dup_dropped", self._n_quality - n_output)
        self._obs = None

    # every read surface resolves first, so the lazy keys are invisible
    # to callers — the report always looks complete
    def __getitem__(self, key):
        if key in self._LAZY:
            self._resolve()
        return dict.__getitem__(self, key)

    def get(self, key, default=None):
        # dict.get bypasses __getitem__ — route it through resolution
        # so report.get("output_docs") never silently returns default
        if key in self._LAZY:
            self._resolve()
        return dict.get(self, key, default)

    def __contains__(self, key):
        return dict.__contains__(self, key) or (
            key in self._LAZY and self._obs is not None
        )

    def __eq__(self, other):
        self._resolve()
        return dict.__eq__(self, other)

    __hash__ = None  # type: ignore[assignment]

    def __iter__(self):
        self._resolve()
        return dict.__iter__(self)

    def __len__(self):
        self._resolve()
        return dict.__len__(self)

    def keys(self):
        self._resolve()
        return dict.keys(self)

    def items(self):
        self._resolve()
        return dict.items(self)

    def values(self):
        self._resolve()
        return dict.values(self)

    def __repr__(self):
        self._resolve()
        return dict.__repr__(self)


def calibrate_quality_threshold(
    df: DataFrame,
    score_col: str = "quality_score",
    keep_frac: float = 0.5,
    approx: bool = True,
    accuracy: int = 10_000,
) -> tuple[float, DataFrame]:
    """Find the score cutoff that keeps ~``keep_frac`` of the rows and
    return ``(threshold, df.filter(score >= threshold))``.

    The reference hard-codes its quality thresholds; a real corpus run
    calibrates them against the score DISTRIBUTION ("keep the best 40%
    of documents by quality") because absolute scores drift with the
    domain mix. Threshold = the ``(1 - keep_frac)`` quantile of
    ``score_col`` — one tiny aggregate job, a single scalar collected.
    ``approx=True`` (default) uses ``percentile_approx`` (a
    Greenwald-Khanna sketch, one pass, no sort — the 100 TB path; the
    kept fraction is then accurate to ~1/``accuracy``); ``approx=False``
    uses exact interpolated ``percentile`` for small/oracle-checked
    runs. NULL scores are excluded by both the quantile and the filter.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    q = 1.0 - keep_frac
    c = F.col(score_col).cast("double")
    expr = (
        F.percentile_approx(c, F.lit(q), F.lit(int(accuracy)))
        if approx
        else F.percentile(c, F.lit(q))
    )
    row = df.agg(expr.alias("t")).first()
    threshold = float(row["t"]) if row["t"] is not None else float("-inf")
    return threshold, df.filter(F.col(score_col) >= F.lit(threshold))


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    dedup_threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    keep_cache: bool = False,
    broadcast_losers_max_bytes: int = 8 << 20,
    max_dup_line_frac: float | None = None,
    max_top_gram_char_frac: float | None = None,
    survivor: str = "min_id",
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (clean_df, report).

    clean_df: surviving rows of ``docs`` plus a ``quality_score``
    column (attached as a projection — no join). Near-dup clusters keep
    their minimum-id member by default (the deterministic survivor from
    ``dedup_clusters``); ``survivor="best_quality"`` keeps each
    cluster's highest-``quality_score`` member instead (ties → smallest
    id) — one extra join + argmax agg over the CLUSTER MEMBERS only
    (near-dup docs, not the corpus), so the attrition numbers are
    identical either way (same member count minus cluster count).

    report: {input_docs, low_quality_dropped, near_dup_dropped,
    output_docs, near_dup_clusters} — a :class:`CorpusReport`.
    Exactly TWO driver actions run inside this function, both needed
    anyway: the persist-materializing count of the quality-filtered
    frame (which also fills the ``input_docs`` observe() metric) and
    one small agg over the checkpointed cluster labels (cluster count +
    loser count for the broadcast gate). ``output_docs`` /
    ``near_dup_dropped`` ride the caller's first action on ``clean``
    via a second observe() metric.

    All heavy stages are the scale-hardened operators (LSH candidate
    join, CC label propagation). The survivor anti-join's broadcast is
    SIZE-GATED in BYTES, never assumed: ``losers`` is every near-dup
    non-survivor, which on a duplicate-heavy corpus is a large fraction
    of all documents — an unconditional broadcast hint would OOM the
    driver at scale. The loser count is measured (cheap: it derives
    from the checkpointed cluster labels), multiplied by a conservative
    16 bytes/id estimate, and hinted only when at most
    ``broadcast_losers_max_bytes`` (default 8 MiB — in line with
    Spark's 10 MB ``autoBroadcastJoinThreshold`` convention); above
    that the anti-join shuffles ids and AQE picks the strategy.

    ``max_dup_line_frac`` / ``max_top_gram_char_frac`` (both off by
    default) extend the quality gate with the published repetition
    filters (Gopher's rules drop docs whose duplicate-line fraction
    exceeds ~0.3 or whose top-2-gram character fraction exceeds ~0.2):
    :func:`~sparvi_core_spark.functions.text.repetition_stats` is
    joined on the doc id and the thresholds become part of the same
    filter pass, so ``low_quality_dropped`` counts the COMBINED
    quality+repetition attrition (one stage, no extra report action).
    When both are ``None`` the join is never built.

    ``keep_cache=True`` leaves the intermediate quality-filtered frame
    persisted so the caller's immediate write of ``clean`` is a cache
    scan; the handle is returned as ``report["cache"]`` — unpersist it
    (not ``spark.catalog.clearCache()``) when done. With the default
    ``False`` the cache is released before returning and the caller's
    first action recomputes the quality projection once.
    """
    obs_in = Observation()
    scored = docs.observe(
        obs_in, F.count(F.lit(1)).alias("n_input")
    ).withColumn("quality_score", quality_score_expr(text_col))
    kept_quality = scored.filter(
        F.coalesce(F.col("quality_score"), F.lit(0.0)) >= min_quality
    )
    if max_dup_line_frac is not None or max_top_gram_char_frac is not None:
        from sparvi_core_spark.functions.text import repetition_stats

        rep = repetition_stats(docs, id_col=id_col, text_col=text_col)
        cond = F.lit(True)
        if max_dup_line_frac is not None:
            cond &= F.col("dup_line_frac") <= max_dup_line_frac
        if max_top_gram_char_frac is not None:
            cond &= F.col("top_gram_char_frac") <= max_top_gram_char_frac
        keep_ids = rep.filter(cond).select(F.col("id").alias("__rep_ok_id"))
        kept_quality = kept_quality.join(
            keep_ids, kept_quality[id_col] == F.col("__rep_ok_id"), "left_semi"
        )
    # consumed by the MinHash+LSH stage and the final anti-join —
    # materialize ONCE instead of recomputing the quality projection
    # (persist, not localCheckpoint: spillable to disk and evictable,
    # which is what you want for a corpus-sized frame). This count also
    # fills the n_input metric — one pass, two report numbers.
    kept_quality = kept_quality.persist()
    n_quality = kept_quality.count()
    n_input = int(obs_in.get["n_input"])

    pairs = minhash_dedup_pairs(
        kept_quality,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=dedup_threshold,
    )
    if survivor not in ("min_id", "best_quality"):
        raise ValueError(
            f"survivor must be 'min_id' or 'best_quality', got {survivor!r}"
        )
    clusters = dedup_clusters(pairs)
    if survivor == "best_quality":
        member_scores = clusters.join(
            kept_quality.select(
                F.col(id_col).alias("__mid"), F.col("quality_score").alias("__q")
            ),
            clusters["id"] == F.col("__mid"),
        )
        winners = member_scores.groupBy("cluster").agg(
            F.min_by(
                "id",
                F.struct(
                    (-F.coalesce(F.col("__q"), F.lit(float("-inf")))).alias("nq"),
                    F.col("id").alias("i"),
                ),
            ).alias("__winner")
        )
        losers = (
            member_scores.join(winners, on="cluster")
            .filter(F.col("id") != F.col("__winner"))
            .select("id")
        )
    else:
        losers = clusters.filter(F.col("id") != F.col("cluster")).select("id")
    # one agg fills both label-derived numbers (cluster count + loser
    # count for the gate) — clusters is checkpointed, so this is cheap
    label_stats = clusters.agg(
        F.count_distinct("cluster").alias("n_clusters"),
        F.coalesce(
            F.sum((F.col("id") != F.col("cluster")).cast("long")), F.lit(0)
        ).alias("n_losers"),
    ).collect()[0]
    n_clusters, n_losers = int(label_stats["n_clusters"]), int(label_stats["n_losers"])

    # losers can be corpus-sized (20-50% of docs on a duplicate-heavy
    # corpus), so the broadcast hint is applied only under a measured
    # BYTE estimate (16 B/id covers a bigint plus row overhead);
    # otherwise the anti-join shuffles ids only — cheap — and AQE still
    # broadcasts at runtime if its own size estimate allows.
    losers_bytes = n_losers * 16
    right = (
        F.broadcast(losers) if losers_bytes <= broadcast_losers_max_bytes else losers
    )
    obs_out = Observation()
    clean = kept_quality.join(
        right,
        kept_quality[id_col] == losers["id"],
        "left_anti",
    ).observe(obs_out, F.count(F.lit(1)).alias("n_output"))

    report = CorpusReport(
        {
            "input_docs": n_input,
            "low_quality_dropped": n_input - n_quality,
            "near_dup_clusters": n_clusters,
        },
        clean,
        obs_out,
        n_quality,
    )
    if keep_cache:
        report["cache"] = kept_quality
    else:
        kept_quality.unpersist()
    return clean, report
