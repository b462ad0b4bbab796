"""Corpus mixture: select documents per domain/source to hit target
token shares — the domain-reweighting step of a pretraining data
pipeline (e.g. "40% web, 30% code, 20% books, 10% wiki" out of a
500B-token budget).

No analog in the reference engine (its surface stops at profiling /
validation; SURVEY.md §2.8) — part of the training-data-pipeline
extension surface, alongside ``operators.sampling`` (splits) and
``operators.packing`` (sequence packing).

Selection is deterministic: each document gets a priority that is a
pure function of the row (``order="hash"``: ``xxhash64(id, salt)`` — an
unbiased pseudo-random draw; ``order="id"``: the corpus's own order;
``order="quality"``: highest ``order_col`` score first — curation),
and each domain keeps its lowest-priority documents until the domain's
token budget is reached. Re-runs, repartitions, and appends cannot
reshuffle the selection (the same contamination-safety argument as
``sampling.hash_split``).

Scale design (the part that matters at 100 TB):

The naive plan — ``Window.partitionBy(domain).orderBy(priority)``
cumulative sum — sorts EVERY document of a domain in one task: with a
handful of domains over 100 TB that is a single-reducer bottleneck.
:func:`mix_corpora` therefore runs a two-phase threshold selection:

1. **Bucket pre-aggregation** (one map-side-combined groupBy):
   documents are bucketed by the top bits of their priority;
   ``(domain, bucket) → token sum`` is tiny (domains × ``n_buckets``
   rows) and collected to the driver, where per-domain running sums
   locate the CUTOFF bucket — the bucket in which the budget is
   crossed — and the residual budget entering it.
2. **Exact boundary pass**: buckets strictly below the cutoff are kept
   with a plain filter (codegen, no shuffle); only the cutoff bucket —
   ~1/``n_buckets`` of the domain — goes through the per-domain window
   cumsum to pick the final documents against the residual budget.

``exact=True`` bypasses phase 1 (single window over each full domain):
the semantics are identical — tests pin two-path equality — and the
plan is simpler for small corpora and for SQL-oracle checking.

Kept-set contract: a document is kept iff it STARTS within the
remaining budget (``running_total - own_tokens < budget``), so the last
kept document may overflow its domain budget by at most one document —
the variant that guarantees the budget is actually met whenever the
domain has enough supply. Domains absent from ``weights`` are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_ORDERINGS = ("hash", "id", "quality")
# hash priorities live in [0, 2^20): top bits give the phase-1 bucket,
# the full value orders documents within a domain (ties broken by id)
_PRIORITY_BITS = 20
# NULL quality scores rank last: max finite double as the sentinel
# (±inf would poison the phase-1 percentile sketch)
_WORST = 1.7976931348623157e308


def _priority(id_col: str, salt: str, order: str, order_col: str | None) -> F.Column:
    """Ascending selection priority: lowest priority is kept first."""
    if order == "hash":
        return F.pmod(
            F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(1 << _PRIORITY_BITS)
        )
    if order == "quality":
        # highest score first → priority = −score; NULL ranks last
        return -F.coalesce(F.col(order_col).cast("double"), F.lit(-_WORST))
    return F.col(id_col).cast("long")


def domain_budgets(
    weights: dict[str, float], total_tokens: int
) -> dict[str, int]:
    """Target token budget per domain: ``frac × total`` (floored).
    Fractions need not sum to 1 — they are shares of ``total_tokens``,
    and over-allocation is the caller's policy decision."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    bad = {d: f for d, f in weights.items() if f < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    return {d: int(f * total_tokens) for d, f in weights.items()}


def mix_corpora(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "mix",
    order: str = "hash",
    order_col: str | None = None,
    n_buckets: int = 1024,
    exact: bool = False,
) -> DataFrame:
    """Select documents so each domain contributes ~``weights[domain] ×
    total_tokens`` tokens. Returns the selected rows with the input's
    columns (plus nothing — join any dropped metadata back by id).

    ``order`` sets WHICH documents fill each budget: ``"hash"`` an
    unbiased pseudo-random draw, ``"id"`` the corpus's own order,
    ``"quality"`` highest-``order_col`` first (curation: keep each
    domain's best documents up to its budget; NULL scores rank last).

    See the module docstring for the selection contract and the
    two-phase scale plan (``exact=True`` forces the single-window
    plan; both produce identical rows). Hash priorities bucket by
    fixed ranges (free); id/quality priorities bucket by a per-domain
    ``percentile_approx`` sketch — one extra map-side-combined pass,
    still no full-domain sort. Skewed sketch splits only grow the
    boundary bucket (efficiency), never change the selection.
    """
    if order not in _ORDERINGS:
        raise ValueError(f"order must be one of {_ORDERINGS}, got {order!r}")
    if order == "quality" and order_col is None:
        raise ValueError("order='quality' requires order_col")
    if not (1 < n_buckets <= (1 << _PRIORITY_BITS)):
        raise ValueError(f"n_buckets must be in (1, 2^20], got {n_buckets}")
    budgets = domain_budgets(weights, total_tokens)
    spark = df.sparkSession
    in_cols = df.columns

    budget_df = F.broadcast(
        spark.createDataFrame(
            [(d, b) for d, b in budgets.items()],
            f"{domain_col} string, __budget long",
        )
    )
    pri = _priority(id_col, salt, order, order_col)
    g = df.join(budget_df, on=domain_col).withColumn("__pri", pri)

    w = (
        Window.partitionBy(domain_col)
        .orderBy("__pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(tokens_col).cast("long")

    if exact:
        cum = F.sum(tok).over(w)
        return (
            g.withColumn("__cum", cum)
            .filter(F.col("__cum") - tok < F.col("__budget"))
            .select(*in_cols)
        )

    # ---- phase 1: (domain, bucket) token sums -> driver-side cutoffs
    if order == "hash":
        shift = _PRIORITY_BITS - (n_buckets - 1).bit_length()
        g = g.withColumn("__bkt", F.shiftright(F.col("__pri"), shift))
    else:
        # unbounded priorities (ids, scores): bucket boundaries from a
        # per-domain quantile sketch. Bucket = #splits ≤ priority —
        # monotonic in priority, so keep-all/boundary/drop-all bucket
        # classes respect the exact ordering no matter where the
        # (approximate) splits land.
        qs = [i / n_buckets for i in range(1, n_buckets)]
        splits = g.groupBy(domain_col).agg(
            F.percentile_approx(
                F.col("__pri").cast("double"), F.lit(qs), F.lit(10_000)
            ).alias("__splits")
        )
        g = g.join(F.broadcast(splits), on=domain_col).withColumn(
            "__bkt",
            F.aggregate(
                "__splits",
                F.lit(0),
                lambda acc, s: acc
                + F.when(s <= F.col("__pri").cast("double"), 1).otherwise(0),
            ).cast("long"),
        )
    sums = (
        g.groupBy(domain_col, "__bkt")
        .agg(F.sum(tok).alias("__toks"))
        .collect()
    )  # bounded: ≤ len(weights) × n_buckets rows
    per_domain: dict[str, list[tuple[int, int]]] = {}
    for r in sums:
        per_domain.setdefault(r[domain_col], []).append((r["__bkt"], r["__toks"]))
    cutoffs = []  # (domain, cutoff_bucket, residual_budget)
    for d, pairs in per_domain.items():
        budget, run = budgets[d], 0
        cut, residual = None, 0
        for bkt, toks in sorted(pairs):
            if run + toks >= budget:
                cut, residual = bkt, budget - run
                break
            run += toks
        if cut is None:  # whole domain fits in budget
            cut, residual = 1 << _PRIORITY_BITS, 0
        cutoffs.append((d, cut, residual))
    cut_df = F.broadcast(
        spark.createDataFrame(
            cutoffs, f"{domain_col} string, __cut long, __res long"
        )
    )
    g = g.join(cut_df, on=domain_col)
    keep_full = g.filter(F.col("__bkt") < F.col("__cut")).select(*in_cols)
    boundary = g.filter(F.col("__bkt") == F.col("__cut"))
    cum_b = F.sum(tok).over(w)  # window over the boundary bucket only
    keep_boundary = (
        boundary.withColumn("__cum", cum_b)
        .filter(F.col("__cum") - tok < F.col("__res"))
        .select(*in_cols)
    )
    return keep_full.unionByName(keep_boundary)


def mixture_report(
    selected: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-domain achievement report over a :func:`mix_corpora` result:
    docs kept, tokens kept, target budget, achieved/target fraction and
    achieved share of the actual mixture. One aggregate job."""
    budgets = domain_budgets(weights, total_tokens)
    spark = selected.sparkSession
    budget_df = F.broadcast(
        spark.createDataFrame(
            [(d, b) for d, b in budgets.items()],
            f"{domain_col} string, target_tokens long",
        )
    )
    per = selected.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("kept_tokens"),
    )
    tot = F.sum("kept_tokens").over(Window.partitionBy())
    return (
        per.join(budget_df, on=domain_col, how="right")
        .select(
            domain_col,
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            "target_tokens",
        )
        .withColumn(
            "fill_frac",
            F.round(
                F.col("kept_tokens")
                / F.when(F.col("target_tokens") > 0, F.col("target_tokens")),
                6,
            ),
        )
        .withColumn("share", F.round(F.col("kept_tokens") / tot, 6))
    )


def temperature_weights(
    df: DataFrame,
    temperature: float,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
    total_tokens: int | None = None,
) -> dict[str, float]:
    """Temperature-scaled domain weights for :func:`mix_corpora`:
    ``p_d ∝ available_d^(1/T)`` — the standard multilingual/multi-domain
    rebalancing (T=1 keeps the natural distribution, T→∞ approaches
    uniform; 100 is effectively uniform), with UniMax-style capping:
    a domain never gets a budget above its supply, and a capped
    domain's surplus re-distributes across the uncapped rest (so the
    full ``total_tokens`` is spent whenever the corpus can cover it).

    One map-side-combined groupBy produces the per-domain token totals;
    everything after runs driver-side on that #domains-sized list (the
    same bounded-collect contract as ``mix_corpora``'s phase-1 bucket
    table). Without ``total_tokens`` the uncapped shares are returned
    directly (caller picks the budget later; capping needs a budget to
    cap against).

    Returns ``{domain: fraction_of_total}`` — feed straight into
    :func:`mix_corpora` with the same ``total_tokens``. Fractions sum
    to ≤ 1; < 1 exactly when supply cannot cover the budget.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    rows = (
        df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("a"))
        .collect()
    )
    avail = {r["d"]: int(r["a"]) for r in rows if r["a"] and r["a"] > 0}
    if not avail:
        return {}
    inv_t = 1.0 / temperature
    if total_tokens is None:
        s = sum(a**inv_t for a in avail.values())
        return {d: a**inv_t / s for d, a in avail.items()}
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    assigned: dict[str, float] = {}
    uncapped = set(avail)
    remaining = float(total_tokens)
    # each pass caps ≥1 domain or exits → ≤ #domains iterations
    while uncapped and remaining > 0:
        s = sum(avail[d] ** inv_t for d in uncapped)
        alloc = {d: remaining * (avail[d] ** inv_t) / s for d in uncapped}
        over = [d for d in uncapped if alloc[d] > avail[d]]
        if not over:
            assigned.update(alloc)
            break
        for d in over:
            assigned[d] = float(avail[d])
            remaining -= avail[d]
            uncapped.discard(d)
    return {d: v / total_tokens for d, v in assigned.items()}
