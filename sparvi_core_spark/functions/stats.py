"""Statistical helpers beyond the reference's stats block: histograms
and distribution drift.

Equal-width histograms as a single groupBy over a computed bin id —
the profiling extension most dashboards want next to min/max/quartiles
— plus the equi-height (quantile-bucketed) variant, which stays
readable on heavy-tailed columns where equal-width puts everything in
bin 0, and PSI drift between two snapshots (the distribution-level
companion to ``profiler.compare``'s stat-level anomaly detection —
reference anchor: sparvi-core's anomaly stub compares scalar stats
only, profile_engine.py drift section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bin, lo, hi, count) rows for an equal-width histogram.

    Bounds default to the column min/max (one extra lightweight agg).
    Values at the upper edge clamp into the last bin. Empty bins are
    not emitted (join against a bin spine if you need them).
    """
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        if row["lo"] is None or row["hi"] is None:
            # empty or all-null column: no bins — return an empty frame
            # with the output schema instead of raising
            return df.sparkSession.createDataFrame(
                [], "bin int, bin_lo double, bin_hi double, count bigint"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    bin_id = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(bins - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            "count",
        )
    )


def equi_height_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """(bin, bin_lo, bin_hi, count) for a quantile-bucketed histogram:
    bin boundaries at the i/bins quantiles, so counts are ~equal by
    construction and the histogram stays informative on heavy-tailed
    columns.

    Bin rule: value v falls in bin = |{boundary b : v > b}| — bins are
    right-closed, [min, q1], (q1, q2], …, (q_{bins-1}, max]. Duplicate
    boundaries (heavy ties in the data) legally produce empty bins.
    ``bin_lo`` is NULL for the first bin and ``bin_hi`` NULL for the
    last (they extend to the column min/max).

    Two jobs: one quantile pass for the boundaries (exact
    ``F.percentile`` by default; ``approx=True`` flips to the
    ``percentile_approx`` GK sketch — the 100 TB path, same switch the
    profiler's quartile block uses), then one groupBy on the computed
    bin id. The boundary comparison is a literal chain, so the second
    pass is a plain scan+agg — no join, no second shuffle beyond the
    ≤ ``bins``-row agg.
    """
    ps = [i / bins for i in range(1, bins)]
    agg = (
        F.percentile_approx(col, ps, accuracy) if approx else F.percentile(col, ps)
    )
    row = df.filter(F.col(col).isNotNull()).agg(agg.alias("qs")).first()
    if row is None or row["qs"] is None:
        return df.sparkSession.createDataFrame(
            [], "bin int, bin_lo double, bin_hi double, count bigint"
        )
    bounds = [float(b) for b in row["qs"]]
    bin_id = sum(
        ((F.col(col) > F.lit(b)).cast("int") for b in bounds), F.lit(0)
    ).alias("bin")
    lo_arr = F.array(*[F.lit(b) for b in bounds])
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id)
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            F.round(
                F.when(F.col("bin") > 0, F.element_at(lo_arr, F.col("bin"))), 6
            ).alias("bin_lo"),
            F.round(
                F.when(
                    F.col("bin") < F.lit(bins - 1),
                    F.element_at(lo_arr, F.col("bin") + 1),
                ),
                6,
            ).alias("bin_hi"),
            "count",
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one: one row ``(psi, n_ref, n_cur)``.

    Bins come from the REFERENCE quantiles (same right-closed rule as
    ``equi_height_histogram``), so each reference bin holds ~1/bins of
    the mass and the index is scale-free. Current-side values outside
    the reference range clamp into the edge bins. Empty-bin fractions
    floor at ``eps`` (the standard smoothing, keeps the log finite).

    PSI = Σ_i (c_i − r_i) · ln(c_i / r_i) over bin fractions.
    Conventional reading: < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted.

    Cost: one quantile pass over the reference, then one scan + tiny
    (≤ bins rows) agg per side — the same shape as the profiler's
    other two-snapshot comparisons, so it composes into scheduled
    drift checks at any scale. ``approx=True`` flips the boundary pass
    to the GK sketch for the 100 TB path.
    """
    ps = [i / bins for i in range(1, bins)]
    agg = (
        F.percentile_approx(col, ps, accuracy) if approx else F.percentile(col, ps)
    )
    row = ref.filter(F.col(col).isNotNull()).agg(agg.alias("qs")).first()
    if row is None or row["qs"] is None:
        return ref.sparkSession.createDataFrame(
            [], "psi double, n_ref bigint, n_cur bigint"
        )
    bounds = [float(b) for b in row["qs"]]

    def binned(df: DataFrame, side: str) -> DataFrame:
        bin_id = sum(
            ((F.col(col) > F.lit(b)).cast("int") for b in bounds), F.lit(0)
        ).alias("bin")
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(bin_id)
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    r, c = binned(ref, "ref"), binned(cur, "cur")
    per_bin = r.join(c, "bin", "full_outer").select(
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = per_bin.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    fr = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    fc = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(((fc - fr) * F.log(fc / fr)).alias("term"), "t_ref", "t_cur")
        .groupBy("t_ref", "t_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            "psi",
            F.col("t_ref").alias("n_ref"),
            F.col("t_cur").alias("n_cur"),
        )
    )


def psi_drift_report(
    ref: DataFrame,
    cur: DataFrame,
    columns: list[str] | None = None,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-column PSI drift for many columns at once: one row
    ``(column, psi, n_ref, n_cur)`` per numeric column.

    Identical math to ``psi_drift`` per column, but batched the way the
    profiler batches its stats: ONE boundary pass over the reference
    (all columns' quantiles in a single agg), then ONE scan per side —
    each row explodes into (column, bin) structs, so C columns cost two
    scans + one small shuffle, not 3·C jobs. A column whose value is
    NULL in a row contributes no struct for that row (the bin
    expression is NULL and filtered), preserving per-column null
    exclusion.
    """
    from pyspark.sql import types as T

    if columns is None:
        columns = [
            f.name
            for f in ref.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    if not columns:
        return ref.sparkSession.createDataFrame(
            [], "column string, psi double, n_ref bigint, n_cur bigint"
        )
    ps = [i / bins for i in range(1, bins)]

    def qexpr(c: str):
        e = (
            F.percentile_approx(c, ps, accuracy)
            if approx
            else F.percentile(c, ps)
        )
        return e.alias(c)

    brow = ref.agg(*[qexpr(c) for c in columns]).first()
    bounds = {c: brow[c] for c in columns if brow[c] is not None}
    if not bounds:
        return ref.sparkSession.createDataFrame(
            [], "column string, psi double, n_ref bigint, n_cur bigint"
        )

    def binned(df: DataFrame, side: str) -> DataFrame:
        structs = [
            F.struct(
                F.lit(c).alias("column"),
                sum(
                    ((F.col(c) > F.lit(float(b))).cast("int") for b in bs),
                    F.lit(0),
                ).alias("bin"),
            )
            for c, bs in bounds.items()
        ]
        return (
            df.select(F.explode(F.array(*structs)).alias("cb"))
            .filter(F.col("cb.bin").isNotNull())
            .groupBy(F.col("cb.column").alias("column"), F.col("cb.bin").alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    per_bin = (
        binned(ref, "ref")
        .join(binned(cur, "cur"), ["column", "bin"], "full_outer")
        .select(
            "column",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = per_bin.groupBy("column").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    fr = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    fc = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return (
        per_bin.join(tot, "column")
        .select(
            "column",
            ((fc - fr) * F.log(fc / fr)).alias("term"),
            "t_ref",
            "t_cur",
        )
        .groupBy("column", "t_ref", "t_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            "column",
            "psi",
            F.col("t_ref").alias("n_ref"),
            F.col("t_cur").alias("n_cur"),
        )
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 100,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov statistic: one row
    ``(ks, n_ref, n_cur)`` with ``ks`` = max |CDF_ref − CDF_cur|
    evaluated at the reference's ``bins``-quantile boundaries.

    Complements ``psi_drift``: KS reads the largest cumulative gap (a
    location shift that spreads thinly over many bins still
    accumulates), PSI reads per-bin reweighting. Binned KS is a LOWER
    bound of the exact statistic with error at most the largest bin
    probability (~1/bins on the reference side by construction) —
    ``bins=100`` bounds it at ~0.01, tight enough for drift alarms
    while keeping the plan two scans + a ≤ bins-row cumulative window
    (single tiny partition, never the data).
    """
    ps = [i / bins for i in range(1, bins)]
    agg = (
        F.percentile_approx(col, ps, accuracy) if approx else F.percentile(col, ps)
    )
    row = ref.filter(F.col(col).isNotNull()).agg(agg.alias("qs")).first()
    if row is None or row["qs"] is None:
        return ref.sparkSession.createDataFrame(
            [], "ks double, n_ref bigint, n_cur bigint"
        )
    bounds = [float(b) for b in row["qs"]]

    def binned(df: DataFrame, side: str) -> DataFrame:
        bin_id = sum(
            ((F.col(col) > F.lit(b)).cast("int") for b in bounds), F.lit(0)
        ).alias("bin")
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(bin_id)
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    from pyspark.sql import Window

    per_bin = (
        binned(ref, "ref")
        .join(binned(cur, "cur"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # ≤ bins rows from here on: the unpartitioned window is a
    # deliberate single-tiny-partition plan, not a data-scale sort
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bin.select(
        F.sum("n_ref").over(w).alias("c_ref"),
        F.sum("n_cur").over(w).alias("c_cur"),
    )
    return (
        cum.crossJoin(
            F.broadcast(
                per_bin.agg(
                    F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
                )
            )
        )
        .select(
            F.abs(
                F.col("c_ref") / F.col("t_ref") - F.col("c_cur") / F.col("t_cur")
            ).alias("gap"),
            "t_ref",
            "t_cur",
        )
        .groupBy("t_ref", "t_cur")
        .agg(F.round(F.max("gap"), 6).alias("ks"))
        .select(
            "ks", F.col("t_ref").alias("n_ref"), F.col("t_cur").alias("n_cur")
        )
    )


def mutual_information(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    the marginal entropies for normalization: one row
    ``(mi, h_x, h_y, n)``. Rows where either side is NULL are
    excluded. NMI variants are one division away
    (``mi / sqrt(h_x · h_y)`` or ``mi / min(h_x, h_y)``).

    The profiler's dependency-discovery companion to per-column
    entropy (Q ``column_entropy``): MI ≈ 0 reads "independent",
    MI ≈ min(H) reads "functionally determined" — the signal behind FK
    candidates and redundant-column detection, which the reference's
    scalar stats cannot see.

    Plan: ONE groupBy shuffle on (x, y); every other quantity —
    marginals via per-x / per-y window sums, total via a broadcast
    1-row agg, both entropies and the MI sum — is computed on the
    joint-DISTINCT frame, whose size is bounded by |X|·|Y| distinct
    pairs, not by the data. Intended for categorical columns (flags,
    codes, labels); identity-like columns make the joint frame as big
    as the data and the estimate meaningless (MI of unique ids is
    degenerate), same caveat every MI estimator carries.
    """
    from pyspark.sql import Window

    joint = (
        df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(
            F.col(col_x).cast("string").alias("x"),
            F.col(col_y).cast("string").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nx = F.sum("n").over(Window.partitionBy("x")).alias("nx")
    ny = F.sum("n").over(Window.partitionBy("y")).alias("ny")
    tot = joint.agg(F.sum("n").alias("grand_total"))
    with_m = joint.select("n", nx, ny).crossJoin(F.broadcast(tot))
    p = F.col("n") / F.col("grand_total")
    return (
        with_m.select(
            (p * F.log(F.col("n") * F.col("grand_total") / (F.col("nx") * F.col("ny"))))
            .alias("mi_term"),
            (-p * F.log(F.col("nx") / F.col("grand_total"))).alias("hx_term"),
            (-p * F.log(F.col("ny") / F.col("grand_total"))).alias("hy_term"),
            "grand_total",
        )
        .groupBy("grand_total")
        .agg(
            F.round(F.sum("mi_term"), 6).alias("mi"),
            F.round(F.sum("hx_term"), 6).alias("h_x"),
            F.round(F.sum("hy_term"), 6).alias("h_y"),
        )
        .select("mi", "h_x", "h_y", F.col("grand_total").alias("n"))
    )


def chi2_independence(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Pearson chi-squared statistic for independence of two
    categorical columns: one row ``(chi2, dof, n)`` with
    dof = (|X|−1)·(|Y|−1).

    The hypothesis-test companion to ``mutual_information`` (same ONE
    (x,y) groupBy; everything else on the joint-distinct frame):
    chi2 = Σ over the FULL |X|×|Y| grid of (observed − expected)² /
    expected with expected = nx·ny/N. Cells absent from the joint frame
    (observed = 0) still contribute expected = nx·ny/N each; their
    total Σ nx·ny/N over missing cells equals N − Σ_present nx·ny/N,
    which is how the implementation accounts for them without
    materializing the grid. Same categorical-columns caveat as MI.
    """
    from pyspark.sql import Window

    joint = (
        df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(
            F.col(col_x).cast("string").alias("x"),
            F.col(col_y).cast("string").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nx = F.sum("n").over(Window.partitionBy("x")).alias("nx")
    ny = F.sum("n").over(Window.partitionBy("y")).alias("ny")
    tot = joint.agg(
        F.sum("n").alias("grand_total"),
        F.countDistinct("x").alias("card_x"),
        F.countDistinct("y").alias("card_y"),
    )
    e = F.col("nx") * F.col("ny") / F.col("grand_total")
    return (
        joint.select("x", "y", "n", nx, ny)
        .crossJoin(F.broadcast(tot))
        .select(
            # present cells: (o-e)^2/e; the "+ e" term books each
            # present cell's expected mass so the missing-cell total
            # can be recovered as grand_total - sum(e_present)
            (((F.col("n") - e) * (F.col("n") - e)) / e).alias("present_term"),
            e.alias("e_present"),
            "grand_total",
            "card_x",
            "card_y",
        )
        .groupBy("grand_total", "card_x", "card_y")
        .agg(
            F.sum("present_term").alias("sum_present"),
            F.sum("e_present").alias("sum_e_present"),
        )
        .select(
            F.round(
                F.col("sum_present")
                + (F.col("grand_total") - F.col("sum_e_present")),
                6,
            ).alias("chi2"),
            ((F.col("card_x") - 1) * (F.col("card_y") - 1)).alias("dof"),
            F.col("grand_total").alias("n"),
        )
    )
