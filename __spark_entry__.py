"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()[name]`` is the Spark-first implementation of an
operator from SURVEY.md §2 (or a scale extension), and
``oracle_sql()[name]`` is the equivalent DuckDB SQL over the same
parquet views. Column names/aliases match pairwise; floating outputs
are rounded identically on both sides so the driver's value-hash
compare is deterministic.
"""

from __future__ import annotations

import os.path as _osp
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _views(spark: SparkSession, sf_dir: str):
    """Register the testdata views; defensive confs for driver-owned
    sessions (nanos parquet timestamps, UTC determinism)."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    from sparvi_core_spark.session import register_views

    return register_views(spark, sf_dir)


# --------------------------------------------------------------------------
# §2 core: profiling / validation query shapes
# --------------------------------------------------------------------------

LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
NUMERIC_MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]


def q_row_count(spark, sf_dir):
    """A1 (profile_engine.py:82,88)."""
    t = _views(spark, sf_dir)
    return t["lineitem"].agg(F.count(F.lit(1)).alias("row_count"))


def q_null_counts(spark, sf_dir):
    """A2/P2 — all columns, one pass (profile_engine.py:83)."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in LINEITEM_COLS
        ]
    )


def q_distinct_counts(spark, sf_dir):
    """A3 — all columns, one pass (profile_engine.py:84)."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    return df.agg(
        *[F.count_distinct(F.col(c)).alias(f"distinct_{c}") for c in LINEITEM_COLS]
    )


def q_duplicate_row_groups(spark, sf_dir):
    """A4 — duplicated full-row *groups* (profile_engine.py:100-123)."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    return (
        df.groupBy(*LINEITEM_COLS)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("duplicate_groups"))
    )


def q_numeric_summary(spark, sf_dir):
    """A5/A6/A7 — stats block per numeric measure (profile_engine.py:136-176).
    Exact percentile_cont interpolation; sample stddev.

    Plan shape (round 11): fusing the exact percentiles into the
    streaming agg turned the WHOLE aggregate into one object-hash
    aggregate (no codegen, one single-task final merge for every
    column). Split instead: one codegen'd streaming agg + one
    percentile agg PER COLUMN, cross-joined back to the same single
    row — the subtrees are independent, so the scheduler overlaps
    them and each percentile column gets its own final task.
    Identical output (same aggregates, same values, same column
    order); measured sf0.1 same-session A/B: 3.3 → 2.4 s."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    stream = []
    for c in NUMERIC_MEASURES:
        col = F.col(c)
        stream += [
            F.min(col).alias(f"min_{c}"),
            F.max(col).alias(f"max_{c}"),
            F.round(F.avg(col), 4).alias(f"avg_{c}"),
            F.round(F.sum(col), 2).alias(f"sum_{c}"),
            F.round(F.stddev_samp(col), 4).alias(f"stdev_{c}"),
        ]
    out = df.agg(*stream)
    for c in NUMERIC_MEASURES:
        q = F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75]))
        out = out.crossJoin(
            df.agg(
                F.round(q[0], 4).alias(f"q1_{c}"),
                F.round(q[1], 4).alias(f"median_{c}"),
                F.round(q[2], 4).alias(f"q3_{c}"),
            )
        )
    order = []
    for c in NUMERIC_MEASURES:
        order += [
            f"min_{c}", f"max_{c}", f"avg_{c}", f"sum_{c}",
            f"stdev_{c}", f"q1_{c}", f"median_{c}", f"q3_{c}",
        ]
    return out.select(*order)


def q_text_length_stats(spark, sf_dir):
    """A8 (profile_engine.py:178-204)."""
    t = _views(spark, sf_dir)
    df = t["part"]
    exprs = []
    for c in ["p_name", "p_brand", "p_type"]:
        ln = F.length(F.col(c))
        exprs += [
            F.min(ln).cast("bigint").alias(f"min_length_{c}"),
            F.max(ln).cast("bigint").alias(f"max_length_{c}"),
            F.round(F.avg(ln), 4).alias(f"avg_length_{c}"),
        ]
    return df.agg(*exprs)


def q_text_patterns(spark, sf_dir):
    """A9 — email/digits/date-like regex counts (profile_engine.py:206-238)."""
    from sparvi_core_spark.profiler.metrics import (
        DATE_PATTERN,
        EMAIL_PATTERN,
        NUMERIC_PATTERN,
    )

    t = _views(spark, sf_dir)
    df = t["part"]
    exprs = []
    for c in ["p_name", "p_type"]:
        for name, pat in (
            ("email", EMAIL_PATTERN),
            ("digits", NUMERIC_PATTERN),
            ("datelike", DATE_PATTERN),
        ):
            exprs.append(
                F.sum(F.col(c).rlike(pat).cast("long")).alias(f"{name}_{c}")
            )
    return df.agg(*exprs)


def q_date_stats(spark, sf_dir):
    """A10 — min/max/distinct/range (profile_engine.py:240-288); the
    reference's second DATEDIFF round-trip is fused into the same agg."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    mn = F.min("l_shipdate")
    mx = F.max("l_shipdate")
    return df.agg(
        F.date_format(mn.cast("date"), "yyyy-MM-dd").alias("min_shipdate"),
        F.date_format(mx.cast("date"), "yyyy-MM-dd").alias("max_shipdate"),
        F.count_distinct(F.col("l_shipdate")).alias("distinct_shipdates"),
        F.datediff(mx.cast("date"), mn.cast("date")).cast("bigint").alias("range_days"),
    )


def q_frequent_values(spark, sf_dir):
    """A11 — top-1 value per column, ALL columns in one pass via stack +
    window (vs one query per column, profile_engine.py:290-335).
    Deterministic tie-break: frequency desc, value asc."""
    t = _views(spark, sf_dir)
    df = t["orders"]
    cols = ["o_orderstatus", "o_orderpriority"]
    total = df.count()
    args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {args})").alias("col_name", "value")
    ).filter(F.col("value").isNotNull())
    counts = pairs.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("frequency")
    )
    w = Window.partitionBy("col_name").orderBy(F.desc("frequency"), F.asc("value"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "col_name",
            "value",
            "frequency",
            F.round(F.col("frequency") * 100.0 / total, 2).alias("percentage"),
        )
    )


def q_outlier_counts(spark, sf_dir):
    """A13 — 3σ outlier counts (default_validations.py:297-320): the
    1-row stats CTE becomes scalar literals after a first agg —
    equivalently a broadcast cross join (J1)."""
    t = _views(spark, sf_dir)
    out = []
    for table, c in (("lineitem", "l_extendedprice"), ("orders", "o_totalprice")):
        df = t[table]
        s = df.agg(
            F.avg(c).alias("a"), F.stddev_samp(c).alias("s")
        ).first()
        cnt = df.filter(
            (F.col(c) > s["a"] + 3 * s["s"]) | (F.col(c) < s["a"] - 3 * s["s"])
        ).count()
        out.append((c, cnt))
    return spark.createDataFrame(out, "col_name string, outlier_count bigint")


def q_outlier_values(spark, sf_dir):
    """A12 — outlier listing (2σ so the sf0.01 data yields rows),
    deterministic order + LIMIT 10 (profile_engine.py:337-385)."""
    t = _views(spark, sf_dir)
    df = t["orders"]
    s = df.agg(F.avg("o_totalprice").alias("a"), F.stddev_samp("o_totalprice").alias("s")).first()
    hi = s["a"] + 2 * s["s"]
    lo = s["a"] - 2 * s["s"]
    return (
        df.filter((F.col("o_totalprice") > hi) | (F.col("o_totalprice") < lo))
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_category_skew(spark, sf_dir):
    """A14 — categorical distribution checks (default_validations.py:356-383):
    #groups over 95% (skew guard) and over 20% (concentration)."""
    t = _views(spark, sf_dir)
    out = []
    for table, c, pct in (
        ("orders", "o_orderstatus", 95.0),
        ("customer", "c_mktsegment", 20.0),
    ):
        df = t[table]
        total = df.count()
        n = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * 100.0 / total > pct)
            .count()
        )
        out.append((c, float(pct), n))
    return spark.createDataFrame(
        out, "col_name string, pct_threshold double, groups_over bigint"
    )


def q_uniqueness_violations(spark, sf_dir):
    """A15 — duplicated-value groups per key column (default_validations.py:56-71,102-126)."""
    t = _views(spark, sf_dir)
    out = []
    for table, c in (("lineitem", "l_partkey"), ("customer", "c_custkey")):
        n = (
            t[table]
            .filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
            .count()
        )
        out.append((c, n))
    return spark.createDataFrame(out, "col_name string, dup_groups bigint")


def q_fk_cardinality_flag(spark, sf_dir):
    """A16 — FK references only one distinct value? (default_validations.py:385-398)."""
    t = _views(spark, sf_dir)
    df = t["orders"]
    return df.agg(
        F.when(F.count_distinct(F.col("o_custkey")) == 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("single_value_flag")
    )


def q_row_growth_flag(spark, sf_dir):
    """A17 — the reference's self-comparing row-growth CTE
    (default_validations.py:73-100), verbatim shape through Catalyst."""
    _views(spark, sf_dir)
    return spark.sql(
        """WITH current_count AS (SELECT COUNT(*) AS cnt FROM lineitem),
prev_count AS (SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE COUNT(*) END AS cnt FROM lineitem)
SELECT CAST(CASE WHEN prev_count.cnt IS NULL THEN 0
            WHEN ABS(current_count.cnt - prev_count.cnt) > prev_count.cnt * 0.2 THEN 1
            ELSE 0 END AS BIGINT) AS growth_flag
FROM current_count, prev_count"""
    )


def q_validation_results(spark, sf_dir):
    """§2.6 — the validator end-to-end: four rules through
    run_validations (spark.sql + comparators), results as a DataFrame."""
    from sparvi_core_spark import run_validations

    _views(spark, sf_dir)
    rules = [
        {"name": "orders_not_empty", "query": "SELECT COUNT(*) FROM orders",
         "operator": "greater_than", "expected_value": 0},
        {"name": "quantity_positive", "query":
         "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0",
         "operator": "equals", "expected_value": 0},
        {"name": "totalprice_not_zero", "query":
         "SELECT COUNT(*) FROM orders WHERE o_totalprice = 0",
         "operator": "equals", "expected_value": 0},
        {"name": "avg_price_between", "query":
         "SELECT ROUND(AVG(o_totalprice), 4) FROM orders",
         "operator": "between", "expected_value": [1000.0, 1000000.0]},
    ]
    res = run_validations(spark, rules, config={"validation": {"parallelism": 1}})
    rows = [
        (r["rule_name"], float(r["actual_value"]), bool(r["is_valid"])) for r in res
    ]
    return spark.createDataFrame(
        rows, "rule_name string, actual_value double, is_valid boolean"
    )


def q_profile_completeness(spark, sf_dir):
    """ENGINE integration gate: run the real profiler end-to-end and
    flatten its completeness block — oracle-checks profile_table itself
    (null/distinct counts + the reference's round(2) percentage math),
    not just the underlying expression shapes."""
    from sparvi_core_spark import profile_table

    _views(spark, sf_dir)
    prof = profile_table(spark, "lineitem", include_samples=False)
    rows = [
        (
            c,
            s["nulls"],
            float(s["null_percentage"]),
            s["distinct_count"],
            float(s["distinct_percentage"]),
        )
        for c, s in prof["completeness"].items()
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, nulls bigint, null_pct double, "
        "distinct_count bigint, distinct_pct double",
    )


def q_profile_numeric(spark, sf_dir):
    """ENGINE integration gate for the numeric stats block (min/max/avg/
    sum/stdev/quartiles through profile_table, rounded for comparison)."""
    from sparvi_core_spark import profile_table

    _views(spark, sf_dir)
    prof = profile_table(spark, "lineitem", include_samples=False)
    rows = [
        (
            c,
            float(s["min"]),
            float(s["max"]),
            round(float(s["avg"]), 4),
            round(float(s["sum"]), 2),
            round(float(s["stdev"]), 4),
            round(float(s["q1"]), 4),
            round(float(s["median"]), 4),
            round(float(s["q3"]), 4),
        )
        for c, s in prof["numeric_stats"].items()
        if c in NUMERIC_MEASURES
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, min double, max double, avg double, sum double, "
        "stdev double, q1 double, median double, q3 double",
    )


def q_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H-Q1-shaped pricing summary — predicate pushdown to
    parquet, map-side partial aggregation, one shuffle on the tiny
    (flag, status) key space."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shaped: 3-way fact join + revenue ranking, top 10.
    customer filter prunes the broadcast side; date filters push into
    both fact scans."""
    t = _views(spark, sf_dir)
    cutoff = F.lit("1998-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        j.groupBy(
            "l_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6-shaped: pure filter + agg — every predicate reaches the
    parquet scan (no join, no shuffle beyond the final reduce)."""
    t = _views(spark, sf_dir)
    df = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return df.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_effect"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )



def q_numeric_correlations(spark, sf_dir):
    """Pearson correlation between measure pairs — one fused agg
    (co-moment accumulation, streaming, single scan)."""
    t = _views(spark, sf_dir)
    df = t["lineitem"]
    return df.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias("corr_price_disc"),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("corr_qty_disc"),
    )


def q_column_entropy(spark, sf_dir):
    """Shannon entropy per categorical column (skew/balance metric the
    profiler's top-1 share can't capture) — all columns in one stacked
    pass, same fused shape as the frequent-values job."""
    t = _views(spark, sf_dir)
    df = t["orders"]
    cols = ["o_orderstatus", "o_orderpriority"]
    args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {args})").alias("col_name", "value")
    ).filter(F.col("value").isNotNull())
    counts = pairs.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_total = counts.groupBy("col_name").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_values")
    )
    p = counts.join(w_total, "col_name").select(
        "col_name",
        "n_values",
        (F.col("cnt") / F.col("total")).alias("p"),
    )
    return p.groupBy("col_name").agg(
        F.max("n_values").cast("bigint").alias("n_values"),
        F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 4).alias("entropy_nats"),
    )


def q_systematic_sample(spark, sf_dir):
    """S6 — sampling made deterministic (key-systematic; TABLESAMPLE is
    RNG-divergent across engines so it can't be oracle-checked)."""
    t = _views(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_group_topk(spark, sf_dir):
    """Top-3 orders by total price per priority — window rank shape."""
    t = _views(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", F.col("rk").cast("int").alias("rk"))
    )


def q_region_revenue(spark, sf_dir):
    """TPC-H-Q5-shaped dim rollup: customer ⋈ orders ⋈ nation ⋈ region.
    The three dims are broadcast (auto under the threshold; nation and
    region are tiny) — the fact side shuffles once for the final agg."""
    t = _views(spark, sf_dir)
    j = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("r_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_array_agg(spark, sf_dir):
    """The reference's defined-but-never-called aggregate_array surface
    (adapters.py:134-144) made real: sorted distinct sets per group,
    serialized for cross-engine comparison."""
    t = _views(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def q_running_totals(spark, sf_dir):
    """Cumulative revenue per customer over time — running-sum window."""
    t = _views(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 20)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


def q_rollup_counts(spark, sf_dir):
    """ROLLUP aggregation with grouping labels (subtotals + grand total)."""
    _views(spark, sf_dir)
    return spark.sql(
        """SELECT
    CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
    CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
    COUNT(*) AS n
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""
    )


# --------------------------------------------------------------------------
# Scale extensions: dedup / similarity / text analysis
# --------------------------------------------------------------------------


def q_dedup_exact_normalized(spark, sf_dir):
    """Exact dedup over the normalized text form — catches duplicates
    that differ only in case/punctuation/whitespace."""
    from sparvi_core_spark.functions.text import normalize_text
    from sparvi_core_spark.operators.dedup import exact_dedup_stats

    t = _views(spark, sf_dir)
    normalized = t["documents"].select(normalize_text("text").alias("norm_text"))
    return exact_dedup_stats(normalized, ["norm_text"])


def q_novelty_screen(spark, sf_dir):
    """Incremental dedup: a simulated re-crawl batch (100 relabeled
    copies of existing docs + 100 unseen docs) screened against the
    existing corpus; returns the verified (new_id, ref_id, est_jaccard)
    match evidence. The day-to-day 100 TB pipeline operation — new data
    deduped against everything already ingested, never corpus×corpus."""
    from sparvi_core_spark.operators.dedup import novelty_filter

    t = _views(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    reference = docs.filter(F.col("doc_id") < 400)
    newb = (
        docs.filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        .unionByName(docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500)))
    )
    _novel, matches = novelty_filter(
        newb, reference, num_hashes=8, bands=4, threshold=0.5
    )
    return matches


def q_dedup_minhash(spark, sf_dir):
    from sparvi_core_spark.operators.dedup import minhash_dedup_pairs

    t = _views(spark, sf_dir)
    return minhash_dedup_pairs(
        t["documents"], num_hashes=8, bands=4, threshold=0.5
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: minhash pairs → connected components (iterative
    min-label propagation). Oracle: recursive-CTE transitive closure."""
    from sparvi_core_spark.operators.dedup import dedup_clusters, minhash_dedup_pairs

    t = _views(spark, sf_dir)
    pairs = minhash_dedup_pairs(t["documents"], num_hashes=8, bands=4, threshold=0.5)
    return dedup_clusters(pairs)


def q_ngram_jaccard(spark, sf_dir):
    from sparvi_core_spark.operators.dedup import ngram_jaccard_pairs

    t = _views(spark, sf_dir)
    pairs = ngram_jaccard_pairs(t["documents"], n=3, threshold=0.8)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 4).alias("jaccard")
    )


def q_ngram_jaccard_lsh(spark, sf_dir):
    """LSH-then-verify — the 100 TB dedup route: banded LSH candidate
    pairs from MinHash signatures, then EXACT n-gram Jaccard computed
    only over those candidates (``candidates=`` path of
    ``ngram_jaccard_pairs`` — no shingle self-join anywhere)."""
    from sparvi_core_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    t = _views(spark, sf_dir)
    docs = t["documents"]
    sig = minhash_signatures(docs, num_hashes=8)
    cands = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, candidates=cands)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 4).alias("jaccard")
    )


def q_allpairs_jaccard(spark, sf_dir):
    """LOSSLESS prefix-filter Jaccard join (operators/dedup.py
    allpairs_candidates — the AllPairs/SSJoin primitive; no reference
    analog): exact n-gram Jaccard ≥ 0.5 with candidate generation
    guaranteed to miss no true pair. The oracle is the BRUTE-FORCE
    all-pairs self-join, so parity proves losslessness on the organic
    corpus, not just the planted fixtures."""
    from sparvi_core_spark.operators.dedup import allpairs_jaccard_pairs

    t = _views(spark, sf_dir)
    pairs = allpairs_jaccard_pairs(t["documents"], n=3, threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 4).alias("jaccard")
    )


def q_main_content(spark, sf_dir):
    """Block-level link-density main-content extraction
    (functions/text.py main_content; no reference analog — the
    trafilatura/readability step of a web pipeline as pure
    expressions): organic docs wrapped in synthetic chrome (nav +
    footer link blocks, a script header), the extractor must return
    exactly the prose. The oracle re-derives the whole block/anchor/
    density pipeline in DuckDB lambdas over the same RE2 patterns."""
    from sparvi_core_spark.functions.text import main_content

    t = _views(spark, sf_dir)
    pages = t["documents"].filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><script>var x=1;</script></head><body>'
                '<nav><a href="/">Home</a> <a href="/a">About</a> '
                '<a href="/c">Contact</a></nav><p>'
            ),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(
                '</p><footer><a href="/p">Privacy</a> '
                '<a href="/t">Terms</a></footer></body></html>'
            ),
        ).alias("text"),
    )
    return pages.select("doc_id", main_content("text").alias("main"))


_ROBOTS_RULES = [
    # (host, agent, allow, pattern) — planted; mixes prefix rules,
    # a wildcard, a $-anchor, nested allow-over-disallow, and an
    # agent-specific group that must NOT apply to '*'
    ("h.example", "*", False, "/p1/"),
    ("h.example", "*", True, "/p1/q2"),
    ("h.example", "*", False, "/p2/*/end$"),
    ("h.example", "*", True, "/p3"),
    ("h.example", "*", False, "/p3/q"),
    ("h.example", "googlebot", False, "/"),
]


def q_robots_screen(spark, sf_dir):
    """RFC 9309 robots matching (functions/web.py robots_allowed; no
    reference analog): planted rule table over doc_id-derived URLs.
    The oracle re-derives path extraction, the REP-pattern → regex
    conversion, longest-match-wins and allow-wins-ties in DuckDB."""
    from sparvi_core_spark.functions.web import robots_allowed

    t = _views(spark, sf_dir)
    urls = t["documents"].filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.concat(
            F.lit("https://h.example/p"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("/q"),
            (F.col("doc_id") % 3).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/end")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES,
        "host string, agent string, allow boolean, pattern string",
    )
    return robots_allowed(urls, rules, agent="*").select(
        "doc_id", "url", "allowed"
    )


# planted HTML pages for the html_meta pair — one per attribute-order /
# quoting / entity / absence case the extractor must handle (bare
# apostrophes are fine anywhere: the oracle SQL-escapes page text).
_HTML_META_PAGES = {
    0: '<html lang="en"><head><title>Welcome Home</title>'
       '<meta name="description" content="A fine page">'
       '<link rel="canonical" href="https://ex.com/home"></head>'
       "<body>plain body text</body></html>",
    1: '<html LANG="FR"><head><title> Bonjour  le  monde </title>'
       '<meta content="Ordre inverse" name="description">'
       '<link href="https://ex.com/fr" rel="canonical"></head></html>',
    2: '<html lang="de"><head><title>Kein Index</title>'
       '<meta name="robots" content="NOINDEX, nofollow"></head></html>',
    3: "<html><head></head><body>no metadata at all</body></html>",
    4: '<html lang="es-MX"><head><title>Fish &amp; Chips\n'
       "  &quot;Daily&quot;</title></head></html>",
    5: "<html lang='pt'><head><title>Aspas simples</title>"
       "<meta name='description' content='conteudo simples'>"
       "<link rel='canonical' href='https://ex.com/pt'></head></html>",
    # apostrophes inside a double-quoted value (must NOT truncate at
    # the quote of the other kind) + data-lang must not shadow lang
    6: '<html data-lang="xx" lang="en"><head>'
       "<title>Tom's Diner</title>"
       '<meta name="description" content="It\'s Tom\'s place, truly">'
       "</head></html>",
    # xml:lang alone is NOT the lang attribute (html_lang stays NULL);
    # reversed attribute order with single quotes
    7: '<html xml:lang="zz"><head><title>Sem atributo lang</title>'
       "<meta content='ordem inversa simples' name='description'>"
       "</head></html>",
}


def q_html_meta(spark, sf_dir):
    """HTML page metadata extraction (functions/web.py html_metadata;
    no reference analog — the crawl stage between fetch and
    extraction): title, meta description, html lang, rel=canonical,
    robots-meta noindex, over planted pages covering both attribute
    orders, single/double quoting, entities, case-insensitivity, and
    total absence. The oracle re-derives every regex + the entity
    decode chain in DuckDB."""
    from sparvi_core_spark.functions.web import html_metadata

    t = _views(spark, sf_dir)
    m = F.col("doc_id") % 8
    page = F.coalesce(
        *[F.when(m == k, F.lit(v)) for k, v in _HTML_META_PAGES.items()]
    )
    pages = t["documents"].filter(F.col("doc_id") < 240).select(
        "doc_id", page.alias("text")
    )
    return html_metadata(pages).select(
        F.col("id").alias("doc_id"),
        "title",
        "description",
        "html_lang",
        "canonical_url",
        "noindex",
    )


def q_cms_counts(spark, sf_dir):
    """Count-Min sketch (operators/sketch.py cms_build/cms_score; no
    reference analog — Cormode & Muthukrishnan 2005): per-customer
    order frequencies estimated from a 3×256 sketch, scored for every
    distinct key. Deliberately narrow (real collisions at sf0.01) so
    the oracle — which re-derives the ENTIRE sketch in DuckDB SQL via
    the same md5-hex positions — checks the collision arithmetic, not
    just the happy path."""
    from sparvi_core_spark.operators.sketch import cms_build, cms_score

    t = _views(spark, sf_dir)
    orders = t["orders"]
    sk = cms_build(orders, "o_custkey", depth=3, width=256)
    keys = orders.select("o_custkey").distinct()
    return cms_score(keys, sk, "o_custkey").select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("est").cast("long").alias("est"),
    )


def q_simhash(spark, sf_dir):
    """64-bit SimHash (32-bit birthday-collides at corpus scale)."""
    from sparvi_core_spark.operators.dedup import simhash

    t = _views(spark, sf_dir)
    return simhash(t["documents"].filter(F.col("doc_id") < 50), bits=64)


def q_simhash_near(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 8) via pigeonhole chunk
    blocking. The oracle computes ALL-pairs Hamming directly, so parity
    additionally proves the blocking loses no true pair (pigeonhole:
    ≤ k differing bits cannot touch all k+1 chunks)."""
    from sparvi_core_spark.operators.dedup import simhash_near_pairs

    t = _views(spark, sf_dir)
    pairs = simhash_near_pairs(
        t["documents"].filter(F.col("doc_id") < 200), bits=64, max_hamming=8
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_embedding_topk(spark, sf_dir):
    from sparvi_core_spark.operators.similarity import cosine_topk

    t = _views(spark, sf_dir)
    emb = t["embeddings"]
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)


def q_embedding_topk_bucketed(spark, sf_dir):
    from sparvi_core_spark.operators.similarity import cosine_topk_bucketed

    t = _views(spark, sf_dir)
    emb = t["embeddings"]
    return cosine_topk_bucketed(emb, emb.filter(F.col("vec_id") < 3), k=5)


def q_embedding_near_dups(spark, sf_dir):
    from sparvi_core_spark.operators.similarity import embedding_near_duplicates

    t = _views(spark, sf_dir)
    return embedding_near_duplicates(t["embeddings"], threshold=0.4)


def q_range_join_events(spark, sf_dir):
    """Bucketed range join (point-in-interval) pinned end-to-end:
    events × 90-minute windows anchored at each distinct event hour
    (windows deliberately straddle the 3600 s bucket boundary), counted
    per window. The blocking turns Catalyst's would-be
    cartesian/BNLJ into a hash equi-join; DuckDB's IEJoin computes the
    same BETWEEN predicate natively as the oracle."""
    from sparvi_core_spark.operators.timeseries import range_join

    t = _views(spark, sf_dir)
    events = t["events"]
    win = (
        events.select(F.date_trunc("hour", "ts").alias("window_start"))
        .distinct()
        .withColumn("window_end", F.expr("window_start + INTERVAL 90 MINUTES"))
    )
    return (
        range_join(
            events, win, "ts", "window_start", "window_end", bucket_seconds=3600
        )
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_ivf_assign(spark, sf_dir):
    """IVF build + assign: per-label centroids (element-wise mean), then
    nearest-centroid assignment for vec_id < 100."""
    from sparvi_core_spark.operators.similarity import compute_centroids, ivf_assign

    t = _views(spark, sf_dir)
    emb = t["embeddings"]
    cents = compute_centroids(emb)
    return ivf_assign(emb.filter(F.col("vec_id") < 100), cents)


def q_pq_codes(spark, sf_dir):
    """Product-quantization encode (operators/quantization.py) against
    a deterministic per-label slice-mean codebook: dim 64 split into
    m=4 subspaces of 16, code = nearest subspace centroid by rounded
    L2, ties to the smallest code. The codebook is SQL-derivable
    (label means of vector slices), so the full encode — slice,
    distance, argmin, reassembly order — is DuckDB-oracled; pq_train's
    Lloyd refinement is the only non-SQL piece (fixpoint class) and is
    pinned separately by planted-structure recovery + the ADC
    identity tests."""
    from sparvi_core_spark.operators.quantization import pq_encode

    t = _views(spark, sf_dir)
    emb = t["embeddings"]
    m, dsub = 4, 16
    # One embeddings pass for ALL m subspaces (round 11): the previous
    # shape unioned m per-slice sub-plans, each scanning the table and
    # running its own two aggregations (4 scans, 8 exchanges). One
    # posexplode of the whole vector with subspace = pos div dsub
    # produces the identical (subspace, code, pos) groups — the same
    # rows feed the same avg cells — in a single scan + one pair of
    # aggregations.
    cb = (
        emb.select(
            F.col("label").alias("code"),
            F.posexplode("embedding").alias("gpos", "val"),
        )
        .select(
            "code",
            (F.col("gpos") / dsub).cast("int").alias("subspace"),
            (F.col("gpos") % dsub).alias("pos"),
            "val",
        )
        .groupBy("subspace", "code", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("v"))
        .groupBy("subspace", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda p: p["v"],
            ).alias("centroid")
        )
        .select("subspace", "code", "centroid")
    )
    codes = pq_encode(emb.filter(F.col("vec_id") < 200), cb)
    return codes.select(
        "id", F.posexplode("codes").alias("subspace", "code")
    )


def q_sq_codes(spark, sf_dir):
    """Scalar int8 quantization (operators/quantization.py): exact
    per-dimension min/max bounds, then the affine uint8 encode
    ``floor((clip(x) - lo) / (hi - lo) * 255 + 0.5)`` — the whole
    train+encode is SQL-expressible, so unlike PQ both phases sit
    inside the oracle."""
    from sparvi_core_spark.operators.quantization import sq_encode, sq_train

    t = _views(spark, sf_dir)
    emb = t["embeddings"]
    bounds = sq_train(emb)
    codes = sq_encode(emb.filter(F.col("vec_id") < 200), bounds)
    return codes.select("id", F.posexplode("codes").alias("dim", "code"))


def q_language_id(spark, sf_dir):
    from sparvi_core_spark.functions.text import language_id

    t = _views(spark, sf_dir)
    # pinned to the stopword tier explicitly: this query's DuckDB
    # oracle re-derives the stopword gate, and the API default flipped
    # to 'ngram' in round 9 (the ngram tier is pinned by the demoted
    # pair `langid_ngram`)
    return language_id(
        t["documents"].filter(F.col("doc_id") < 50), strategy="stopword"
    )


def q_quality_scores(spark, sf_dir):
    from sparvi_core_spark.functions.text import quality_features

    t = _views(spark, sf_dir)
    return quality_features(t["documents"].filter(F.col("doc_id") < 100))


# planted multilingual sentences for the langid_ngram pair — already
# lowercase (so cross-engine case-folding can never differ), no
# apostrophes (so they inline into oracle SQL verbatim), and NOT in
# the LANGID_SEEDS training set; %5==3 is UNSEGMENTED zh (no spaces),
# the case the stopword tier is structurally blind to
_LANGID_PLANTED = {
    0: "the children walked home through the snow after school ended",
    1: "les enfants sont rentrés à la maison sous la neige après les cours",
    2: "los niños volvieron a casa bajo la nieve después de la escuela",
    3: "孩子们放学以后冒着大雪走路回到了家里",
    4: "die kinder gingen nach der schule durch den schnee nach hause",
}


def q_langid_ngram(spark, sf_dir):
    """Char-n-gram Naive Bayes language ID (functions/text.py
    train_langid + language_id(strategy='ngram'), operators/classify.py
    char featurizer; no reference analog — training-data extension):
    trains on the built-in 12-language seed corpus with exact char
    1/2/3-gram features, classifies docs where 4 of every 5 carry a
    planted multilingual sentence (incl. unsegmented zh) and the fifth
    keeps its organic text. The oracle re-derives the ENTIRE pipeline
    (normalization, gram extraction, NB counts/priors/add-k scores,
    argmax with label-asc ties, the und rule) in DuckDB SQL from the
    same seed constant."""
    from sparvi_core_spark.functions.text import language_id, train_langid

    t = _views(spark, sf_dir)
    m = F.col("doc_id") % 5
    planted_text = F.coalesce(
        *[F.when(m == k, F.lit(v)) for k, v in _LANGID_PLANTED.items()],
        F.col("text"),
    )
    docs = (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", planted_text.alias("text"))
    )
    model = train_langid(spark)
    return language_id(docs, strategy="ngram", model=model)


def q_langid_corpus(spark, sf_dir):
    """language_id with NO model argument — pins the round-11 DEFAULT
    (the packaged 28-language / 9-script corpus via
    train_langid_from_dir on data/langid_sample/train; functions/
    text.py). Same planted docs as langid_ngram; the oracle re-derives
    the whole NB pipeline in DuckDB from the same corpus files, so the
    no-model path every user gets is cross-engine checked end to end,
    not just eval-floored."""
    from sparvi_core_spark.functions.text import language_id

    t = _views(spark, sf_dir)
    m = F.col("doc_id") % 5
    planted_text = F.coalesce(
        *[F.when(m == k, F.lit(v)) for k, v in _LANGID_PLANTED.items()],
        F.col("text"),
    )
    docs = (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", planted_text.alias("text"))
    )
    return language_id(docs)


def q_dsir_scores(spark, sf_dir):
    """DSIR exact-mode log importance of every document, target = the
    English slice (operators/selection.py; no reference analog —
    training-data extension surface). Exact (unhashed) features keep
    the pipeline SQL-expressible for the oracle."""
    from sparvi_core_spark.operators.selection import (
        score_dsir,
        train_dsir,
    )

    t = _views(spark, sf_dir)
    docs = t["documents"]
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    model = train_dsir(target, docs, num_buckets=None)
    return score_dsir(docs, model)


def q_pii_counts(spark, sf_dir):
    """PII detection counts (operators/pii.py; no reference analog —
    training-data extension surface) over the documents corpus with
    deterministically PLANTED pii (derived from doc_id identically in
    Spark and SQL, so the fixture needs no side-channel): verified
    counts per type incl. the expression-only Luhn check on card
    candidates, phone counted on card-stripped text."""
    from sparvi_core_spark.operators.pii import detect_pii

    t = _views(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" card 4111 1111 1111 1111")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" card 1234 5678 9012 3456")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit(" call 415-555-0134 from 10.0.0.1 ssn 123-45-6789"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return detect_pii(aug).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_ssn",
        "n_credit_card",
        "n_phone",
        "pii_total",
    )


def q_conversation_stats(spark, sf_dir):
    """Chat/SFT conversation profiling (operators/conversations.py; no
    reference analog — training-data extension surface): message-list
    JSON is PLANTED deterministically from the documents table (roles
    vary by doc_id so alternation passes and fails; short docs yield
    empty third turns), parsed with real `from_json`, then profiled —
    turn/role counts, first/last role, non-system alternation, empty
    turns, char/token mass per speaker. The oracle rebuilds the same
    JSON and parses it with DuckDB's own json_transform machinery, so
    the parity check crosses two genuinely different JSON parsers.
    Integer aggregates are BIGINT-cast on BOTH sides (the r6 type-drift
    rule)."""
    from sparvi_core_spark.operators.conversations import (
        conversation_stats,
        parse_conversations,
    )

    t = _views(spark, sf_dir)

    def seg(a):
        return F.regexp_replace(
            F.substring(F.coalesce(F.col("text"), F.lit("")), a, 48),
            "[^A-Za-z0-9 ]",
            "",
        )

    r1 = F.when(F.col("doc_id") % 5 == 0, F.lit("system")).otherwise(
        F.lit("user")
    )
    r3 = F.when(F.col("doc_id") % 3 == 0, F.lit("assistant")).otherwise(
        F.lit("user")
    )
    j = F.concat(
        F.lit('[{"role":"'), r1, F.lit('","content":"'), seg(1),
        F.lit('"},{"role":"assistant","content":"'), seg(49),
        F.lit('"},{"role":"'), r3, F.lit('","content":"'), seg(97),
        F.lit('"}]'),
    )
    convs = t["documents"].select("doc_id", j.alias("messages"))
    return conversation_stats(parse_conversations(convs)).select(
        "doc_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_system").cast("long").alias("n_system"),
        F.col("n_user").cast("long").alias("n_user"),
        F.col("n_assistant").cast("long").alias("n_assistant"),
        "first_role",
        "last_role",
        "alternates_ok",
        F.col("n_empty").cast("long").alias("n_empty"),
        "total_chars",
        "user_tokens",
        "assistant_tokens",
    )


def q_hamming_topk(spark, sf_dir):
    """Packed-binary Hamming top-k search (operators/binary_sketch.py;
    no reference analog — training-data extension surface). Sketch
    words are PLANTED from vec_id via md5 (60-bit positive words, so
    neither engine's signed-overflow rules bite) identically in Spark
    and SQL; the search kernel — zip-XOR-popcount distance + windowed
    top-k with (distance, neighbor_id) ties — is what's under test,
    cross-engine."""
    from sparvi_core_spark.operators.binary_sketch import hamming_topk

    t = _views(spark, sf_dir)

    def word(w):
        md = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f"|{w}")))
        return F.conv(F.substring(md, 1, 15), 16, 10).cast("bigint")

    sk = t["embeddings"].select(
        "vec_id", F.array(word(0), word(1), word(2)).alias("sketch")
    )
    qs = sk.filter(F.col("vec_id") % 50 == 0)
    return hamming_topk(sk, qs, k=5).select(
        "query_id",
        "neighbor_id",
        F.col("distance").cast("long").alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_rrf_fuse(spark, sf_dir):
    """Reciprocal rank fusion (operators/ranking.py; no reference
    analog — hybrid-search extension surface). Two retriever rankings
    are PLANTED per query from md5 orderings (salts 'a'/'b', top-10
    each — deterministic and engine-portable), then fused with the
    standard k=60; the fusion algebra, absent-doc semantics and
    (score desc, id) tie contract are what's under test (round 7)."""
    from pyspark.sql import Window as W

    from sparvi_core_spark.operators.ranking import rrf_fuse

    t = _views(spark, sf_dir)
    base = (
        t["documents"]
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
        .crossJoin(
            spark.range(1, 4).select(F.col("id").alias("query_id"))
        )
    )

    def ranking(salt):
        key = F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(f"|{salt}|"),
                F.col("query_id").cast("string"),
            )
        )
        w = W.partitionBy("query_id").orderBy(key, F.col("doc_id"))
        return (
            base.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "doc_id", "rank")
        )

    fused = rrf_fuse([ranking("a"), ranking("b")], k=60)
    return fused.select(
        "query_id",
        "doc_id",
        "rrf_score",
        F.col("n_lists").cast("long").alias("n_lists"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_hamming_near_pairs(spark, sf_dir):
    """Exact Hamming near-pair mining (operators/binary_sketch.py).
    Sketch words are PLANTED so near pairs exist by construction: base
    words keyed on vec_id mod 25/40/50 (ids ≡ mod lcm=200 share all
    three bases) with the third word XOR-perturbed by vec_id%3, so
    each such pair lands at distance 1-2 — findable at max_dist=2 via
    the pigeonhole blocking. The ORACLE brute-forces ALL pairs and
    filters, so the parity check doubles as an exactness proof of the
    blocked plan on real table ids (round 7)."""
    from sparvi_core_spark.operators.binary_sketch import (
        hamming_near_pairs,
    )

    t = _views(spark, sf_dir)

    def word(mod, salt):
        md = F.md5(
            F.concat(
                (F.col("vec_id") % mod).cast("string"), F.lit(f"|{salt}")
            )
        )
        return F.conv(F.substring(md, 1, 15), 16, 10).cast("bigint")

    sk = t["embeddings"].select(
        "vec_id",
        F.array(
            word(25, "w0"),
            word(40, "w1"),
            word(50, "w2").bitwiseXOR(F.col("vec_id") % 3),
        ).alias("sketch"),
    )
    return hamming_near_pairs(sk, max_dist=2).select(
        "id_a",
        "id_b",
        F.col("distance").cast("long").alias("distance"),
    )


def q_token_counts(spark, sf_dir):
    from sparvi_core_spark.functions.text import token_counts

    t = _views(spark, sf_dir)
    return token_counts(t["documents"].filter(F.col("doc_id") < 100))


def q_fuzzy_name_pairs(spark, sf_dir):
    """Bounded edit-distance self-join via symmetric-delete blocking
    (operators/fuzzy.py). The oracle is the ALL-PAIRS levenshtein
    join, so parity proves the deletion-key blocking is lossless
    (complete candidate generation) as well as false-positive-free
    (the verify step) — the fuzzy analog of `simhash_near`'s
    blocking-losslessness proof."""
    from sparvi_core_spark.operators.fuzzy import fuzzy_self_pairs

    t = _views(spark, sf_dir)
    return fuzzy_self_pairs(
        t["customer"], id_col="c_custkey", text_col="c_name", max_edits=1
    )


def q_latest_events(spark, sf_dir):
    """CDC-style compaction: newest event per user in ONE map-side-
    combined `max_by(struct(...), struct(order, tie))` aggregation —
    no window sort of raw partitions (operators/ingest.py). Oracle:
    DuckDB QUALIFY row_number() = 1."""
    from sparvi_core_spark.operators.ingest import latest_by_key

    t = _views(spark, sf_dir)
    ev = t["events"].select("user_id", "event_id", "event_type", "value", "ts")
    return latest_by_key(ev, ["user_id"], "ts", tie_col="event_id").select(
        "user_id", "event_id", "event_type", "value"
    )


def q_fingerprints(spark, sf_dir):
    from sparvi_core_spark.functions.text import fingerprints

    t = _views(spark, sf_dir)
    return fingerprints(t["documents"].filter(F.col("doc_id") < 100))


def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (30 min) over the events stream — the
    window/cumsum sessionizer from operators.timeseries."""
    from sparvi_core_spark.operators.timeseries import session_stats

    t = _views(spark, sf_dir)
    s = session_stats(t["events"].filter(F.col("user_id") < 20), gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.round(F.avg("duration_seconds"), 2).alias("avg_session_seconds"),
    )


def q_asof_purchase_click(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    prior (or same-instant) click. Oracle = DuckDB's native ASOF JOIN."""
    from sparvi_core_spark.operators.timeseries import asof_join, event_micros

    t = _views(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 10)
    ).select("user_id", "ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", right_payload=["click_event_id"]
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        event_micros(joined, "ts").alias("purchase_us"),
        F.col("click_event_id_right").alias("click_event_id"),
        F.col("matched_ts_us").alias("click_us"),
    )


def q_bm25_search(spark, sf_dir):
    """BM25 relevance ranking (operators.ranking.bm25_search): per-term
    array-filter tf + ONE broadcast single-row agg for N/avgdl/df — no
    wide shuffle, one corpus scan (replaced `top_terms` in the 50-query
    pin, round 5; the df top-k shape lives on as the
    `test_local_top_terms_parity` local pair)."""
    from sparvi_core_spark.operators.ranking import bm25_search

    t = _views(spark, sf_dir)
    return bm25_search(t["documents"], "data quality pipeline", top_n=25)


def q_events_hourly(spark, sf_dir):
    """Streaming-shaped tumbling-window agg as a batch query (the same
    transformation runs under Structured Streaming in
    sparvi_core_spark.streaming)."""
    t = _views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_corpus_diversity(spark, sf_dir):
    """Corpus lexical-health report (operators.diversity): entropy via
    the one-pass Σn·ln(n) identity, head-capped OLS Zipf fit — the
    before/after check around every filtering round (round 6)."""
    from sparvi_core_spark.operators.diversity import corpus_diversity

    t = _views(spark, sf_dir)
    return corpus_diversity(t["documents"], zipf_top=10_000)


def q_corpus_divergence(spark, sf_dir):
    """Cross-corpus distribution shift (operators.diversity) between
    the English slice and the rest — JS divergence on the raw unigram
    distributions, add-½-smoothed directional KLs over the union
    vocabulary, total variation, vocab Jaccard. Divergence sums
    rounded to 4 (cross-engine float-accumulation drift on vocab-scale
    sums), counts BIGINT-cast on both sides (round 7)."""
    from sparvi_core_spark.operators.diversity import corpus_divergence

    t = _views(spark, sf_dir)
    docs = t["documents"]
    return corpus_divergence(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
    )


def q_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split (functions/lm.py
    perplexity_buckets; no reference analog — training-data extension):
    self-trained bigram LM, per-LANGUAGE exact terciles, bucket tags.
    The oracle re-derives the LM, the per-doc perplexities, the
    per-lang interpolated quantiles, and the tagging in DuckDB SQL."""
    from sparvi_core_spark.functions.lm import (
        perplexity_buckets,
        train_bigram_lm,
    )

    t = _views(spark, sf_dir)
    lm = train_bigram_lm(t["documents"])
    return perplexity_buckets(
        t["documents"], lm, by="lang", exact=True
    )


def q_para_dedup(spark, sf_dir):
    """Corpus-wide paragraph dedup (operators/substring.py
    dedup_paragraphs; no reference analog — the Dolma/RefinedWeb
    boilerplate stage): planted shared banners (every 3rd / 7th doc)
    over organic text, df>=2, keep-first semantics. The oracle
    re-derives paragraph splitting, md5 keys, the global (id, pos)
    keeper, and the indexed-rebuild in DuckDB SQL."""
    from sparvi_core_spark.operators.substring import dedup_paragraphs

    t = _views(spark, sf_dir)
    planted = t["documents"].filter(F.col("doc_id") < 150).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("\n\nshared banner alpha here")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("\n\nshared banner beta there")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup_paragraphs(planted)


def q_nb_scores(spark, sf_dir):
    """Naive Bayes per-(doc, class) log scores (operators.classify),
    self-trained on the lang labels — the fastText-style quality/
    domain filter tier; joint log-likelihood rounded to 4 so
    cross-engine libm drift on long sums cannot flip the compare
    (round 6)."""
    from sparvi_core_spark.operators.classify import score_nb, train_nb

    t = _views(spark, sf_dir)
    model = train_nb(t["documents"], "lang")
    return score_nb(t["documents"], model, round_to=4)


def q_embedding_health(spark, sf_dir):
    """One-pass embedding-column audit (operators.ann_health): dim
    consistency, NaN/NULL/zero-norm counts, norm moments (round 6)."""
    from sparvi_core_spark.operators.ann_health import embedding_health

    t = _views(spark, sf_dir)
    return embedding_health(t["embeddings"])


def q_canonical_urls(spark, sf_dir):
    """URL canonicalization (functions/web.py; no reference analog —
    web-corpus extension surface) over URLs PLANTED from doc_id (seven
    variants covering case, default/explicit ports, userinfo, tracking
    params, fragments — incl. a '?' that appears only INSIDE the
    fragment — trailing slashes, and unparseable passthrough).
    The DuckDB oracle states the EXPECTED canonical form per variant
    in closed form — an independent derivation, not a re-run of the
    same algorithm."""
    from sparvi_core_spark.functions.web import canonicalize_url

    t = _views(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 7
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTPS://WWW.Example.COM:443/Docs/"), d,
            F.lit("/?utm_source=x&b=2&a=1#f")))
        .when(m == 1, F.concat(
            F.lit("http://user:pw@Site.example.org:8080//x/"), d, F.lit("/")))
        .when(m == 2, F.concat(F.lit("https://example"), d, F.lit(".com")))
        .when(m == 3, F.concat(
            F.lit("https://cdn.example.net/a?z=9&y=8&gclid="), d))
        .when(m == 4, F.concat(F.lit("plain text "), d))
        .when(m == 5, F.concat(
            F.lit("https://h.example.com/p"), d, F.lit("#a?b=c")))
        .otherwise(F.concat(
            F.lit("ftp://Files.Example.com:21/pub/"), d, F.lit("/")))
    )
    planted = t["documents"].select(
        F.col("doc_id").alias("id"), url.alias("url")
    )
    return planted.select("id", "url", canonicalize_url("url").alias("canon"))


def q_gopher_flags(spark, sf_dir):
    """Gopher/MassiveText document-quality rules (functions/text.py;
    no reference analog — training-data extension surface) over the
    documents corpus with planted per-rule suffixes so every rule's
    numerator is exercised. The oracle recomputes every statistic and
    flag with DuckDB list lambdas."""
    from sparvi_core_spark.functions.text import gopher_quality_flags

    t = _views(spark, sf_dir)
    planted = t["documents"].filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit("\n- bullet item\n* another"))
            .when(F.col("doc_id") % 4 == 1, F.lit(" ### ### trailing..."))
            .when(F.col("doc_id") % 4 == 2, F.lit("\nends with dots...\n…"))
            .otherwise(F.lit(" the of and that")),
        ).alias("text"),
    )
    return gopher_quality_flags(planted)


def q_gopher_repetition(spark, sf_dir):
    """The complete Gopher repetition table (functions/text.py
    gopher_repetition_flags; no reference analog — training-data
    extension surface) over documents with per-family planted
    repetition suffixes. The oracle rebuilds all 11 granularities with
    DuckDB list lambdas + a QUALIFY top-gram ranking — a genuinely
    different execution shape from the engine's single tagged
    explode."""
    from sparvi_core_spark.functions.text import gopher_repetition_flags

    t = _views(spark, sf_dir)
    planted = t["documents"].filter(F.col("doc_id") < 150).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit("\nrepeated line\nrepeated line\nrepeated line"))
            .when(F.col("doc_id") % 5 == 1, F.lit(" spam phrase here " * 8))
            .when(F.col("doc_id") % 5 == 2,
                  F.lit("\n\nsame para\n\nsame para"))
            .when(F.col("doc_id") % 5 == 3,
                  F.lit(" one two three four five six " * 3))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return gopher_repetition_flags(planted)


def q_host_quality(spark, sf_dir):
    """Per-host quality rollup (functions/web.py host_quality_stats;
    no reference analog — web-corpus extension surface): gate pass
    fractions per host over planted URLs/flags derived from doc_id
    identically in both engines. NULL flags count as failing but stay
    in n_docs (pinned by the %7 NULL plant)."""
    from sparvi_core_spark.functions.web import host_quality_stats

    t = _views(spark, sf_dir)
    planted = t["documents"].select(
        "doc_id",
        "n_chars",
        F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.com/p/"), F.col("doc_id").cast("string")
                 ).alias("url"),
        (F.col("doc_id") % 2 == 0).alias("f1"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("doc_id") % 3 == 0).alias("f2"),
    )
    return host_quality_stats(planted, ["f1", "f2"], tokens_col="n_chars")


def q_c4_clean(spark, sf_dir):
    """The C4 cleaning recipe (functions/text.py c4_clean; no
    reference analog — training-data extension surface) over documents
    with planted per-rule suffixes (kept closing lines, javascript
    lines, lorem ipsum, brace lines). Oracle rebuilds the line filter
    + page flags with nested DuckDB list lambdas, terminals
    interpolated from the module."""
    from sparvi_core_spark.functions.text import c4_clean

    t = _views(spark, sf_dir)
    planted = t["documents"].filter(F.col("doc_id") < 150).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit(".\nGood closing line with plenty of words here."))
            .when(F.col("doc_id") % 4 == 1,
                  F.lit("\nEnable javascript now please thanks."))
            .when(F.col("doc_id") % 4 == 2, F.lit(" lorem ipsum dolor."))
            .otherwise(F.lit(" { end")),
        ).alias("text"),
    )
    return c4_clean(planted)


def q_trimmed_spans(spark, sf_dir):
    """ExactSubstr span TRIMMING (operators/substring.py
    remove_duplicated_spans; no reference analog — training-data
    extension surface) over documents with a planted shared 8-token
    run (appended for one doc class, the ENTIRE text of another — the
    full-coverage → empty-string edge). The oracle removes the union
    of flagged window positions directly (no interval merge — the
    removed-token set is identical by construction), trimming with a
    DuckDB indexed list_filter."""
    from sparvi_core_spark.operators.substring import (
        remove_duplicated_spans,
    )

    t = _views(spark, sf_dir)
    run = "shared span alpha beta gamma delta epsilon zeta"
    planted = t["documents"].filter(F.col("doc_id") < 120).select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, F.lit(run))
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" " + run)),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return remove_duplicated_spans(planted, window=6, min_docs=2)


def q_filter_sweep(spark, sf_dir):
    """Threshold attrition curve (operators/selection.py filter_sweep;
    no reference analog — training-data extension surface): per-
    threshold doc/char survival of the heuristic quality score over
    the documents corpus, in ONE corpus pass via pass-count
    bucketing. The oracle cross-joins the threshold list (the
    semantics) — the engine's bucketed plan must reproduce it."""
    from sparvi_core_spark.functions.text import quality_features
    from sparvi_core_spark.operators.selection import filter_sweep

    t = _views(spark, sf_dir)
    docs = t["documents"]
    qf = quality_features(docs).join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    return filter_sweep(
        qf, "quality_score", [0.3, 0.5, 0.7], weight_col="n_chars"
    )


# --------------------------------------------------------------------------
# contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


# Pairs demoted from the 50-entry driver contract to make room for new
# operators; each keeps FULL oracle coverage through local_pairs() →
# tests/test_oracle_parity.py (no query-count cap there). Round-6 swaps:
# in — `pq_codes`/`sq_codes`, then `corpus_diversity`/`nb_scores`/
# `embedding_health`; out — `array_agg` (dead-API demo; the grouping
# machinery stays driver-checked by every other agg Q),
# `ngram_jaccard_lsh` (composition whose two pieces — `ngram_jaccard`
# and the MinHash/LSH math inside `dedup_minhash` — both stay pinned),
# `running_totals`/`rollup_counts` (plain-SQL window/rollup demos, not
# cited by any §2 row), and `embedding_topk_bucketed` (same expression
# engine as the still-pinned `embedding_topk`, plus engine-parity and
# recall-tripwire tests).
_LOCAL_ONLY = (
    "array_agg",
    "ngram_jaccard_lsh",
    "running_totals",
    "rollup_counts",
    "embedding_topk_bucketed",
    "dsir_scores",
    "pii_counts",
    # round-7 swap: group_topk (plain window top-k, same machinery as
    # the still-pinned latest_events/frequent_values) makes room for
    # conversation_stats in the 50-pin
    "group_topk",
    "hamming_topk",
    "corpus_divergence",
    "rrf_fuse",
    "hamming_near_pairs",
    # late-round-7 additions: born as local pairs (no pin swap needed —
    # each is a NEW extension operator, not a replacement), full
    # cross-engine coverage via test_demoted_pair_parity
    "canonical_urls",
    "gopher_flags",
    "filter_sweep",
    "gopher_repetition",
    "trimmed_spans",
    "c4_clean",
    "host_quality",
    # round 8: char-n-gram NB language ID (the real lang-id tier)
    "langid_ngram",
    # round 11: the packaged-corpus DEFAULT model (28 languages)
    "langid_corpus",
    # round 8: CCNet per-language perplexity terciles
    "ppl_buckets",
    # round 8: Dolma-style corpus-wide paragraph dedup
    "para_dedup",
    # round 8: lossless AllPairs prefix-filter Jaccard join (oracle is
    # the brute-force self-join — parity proves losslessness)
    "allpairs_jaccard",
    # round 8: Count-Min sketch (oracle re-derives the full counter
    # matrix in SQL from the same md5-hex positions)
    "cms_counts",
    # round 8: main-content extraction (oracle re-derives the block /
    # anchor / link-density pipeline in DuckDB lambdas)
    "main_content",
    # round 8: RFC 9309 robots matching (oracle re-derives pattern →
    # regex conversion and the longest-match/allow-ties decision)
    "robots_screen",
    # round 9: HTML page metadata (title/description/lang/canonical/
    # noindex — oracle re-derives every regex + the entity decode)
    "html_meta",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries, every one with a DuckDB oracle.

    Round-1 CORRECTNESS recorded only the first 50 dict entries, so the
    contract is pinned at 50 oracle-checked queries (capabilities beyond
    these — F.mode, set ops, HLL approx-distinct — keep local-only oracle
    pairs in tests/test_oracle_parity.py, which has no query-count cap).

    Round-4 swaps (operators keep identical oracle coverage as local
    pairs in tests/test_oracle_parity.py, the round-3 `top_terms`
    precedent): `simhash` → `fuzzy_name_pairs` (signature arithmetic
    stays driver-checked via `simhash_near`, whose oracle recomputes
    signatures from scratch), `token_counts` → `latest_events`.
    Round-6 swap: see `_LOCAL_ONLY`.
    """
    return {
        k: v for k, v in _queries_all().items() if k not in _LOCAL_ONLY
    }


def local_pairs() -> dict[str, tuple]:
    """(callable, oracle_sql) for pairs outside the 50-entry driver pin."""
    qs, sqls = _queries_all(), _oracle_sql_all()
    return {k: (qs[k], sqls[k]) for k in _LOCAL_ONLY}


def _queries_all() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_count": q_row_count,
        "null_counts": q_null_counts,
        "distinct_counts": q_distinct_counts,
        "duplicate_row_groups": q_duplicate_row_groups,
        "numeric_summary": q_numeric_summary,
        "text_length_stats": q_text_length_stats,
        "text_patterns": q_text_patterns,
        "date_stats": q_date_stats,
        "frequent_values": q_frequent_values,
        "outlier_counts": q_outlier_counts,
        "outlier_values": q_outlier_values,
        "category_skew": q_category_skew,
        "uniqueness_violations": q_uniqueness_violations,
        "fk_cardinality_flag": q_fk_cardinality_flag,
        "row_growth_flag": q_row_growth_flag,
        "validation_results": q_validation_results,
        "profile_completeness": q_profile_completeness,
        "profile_numeric": q_profile_numeric,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "forecast_revenue": q_forecast_revenue,
        "numeric_correlations": q_numeric_correlations,
        "column_entropy": q_column_entropy,
        "systematic_sample": q_systematic_sample,
        "group_topk": q_group_topk,
        "region_revenue": q_region_revenue,
        "array_agg": q_array_agg,
        "running_totals": q_running_totals,
        "rollup_counts": q_rollup_counts,
        "sessionization": q_sessionization,
        "asof_purchase_click": q_asof_purchase_click,
        "events_hourly": q_events_hourly,
        "dedup_exact_normalized": q_dedup_exact_normalized,
        "novelty_screen": q_novelty_screen,
        "dedup_minhash": q_dedup_minhash,
        "dedup_clusters": q_dedup_clusters,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_lsh": q_ngram_jaccard_lsh,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "simhash_near": q_simhash_near,
        "embedding_topk": q_embedding_topk,
        "embedding_topk_bucketed": q_embedding_topk_bucketed,
        "embedding_near_dups": q_embedding_near_dups,
        "range_join_events": q_range_join_events,
        "ivf_assign": q_ivf_assign,
        "pq_codes": q_pq_codes,
        "sq_codes": q_sq_codes,
        "language_id": q_language_id,
        "quality_scores": q_quality_scores,
        "conversation_stats": q_conversation_stats,
        "latest_events": q_latest_events,
        "fingerprints": q_fingerprints,
        "bm25_search": q_bm25_search,
        "corpus_diversity": q_corpus_diversity,
        "nb_scores": q_nb_scores,
        "embedding_health": q_embedding_health,
        "dsir_scores": q_dsir_scores,
        "pii_counts": q_pii_counts,
        "hamming_topk": q_hamming_topk,
        "corpus_divergence": q_corpus_divergence,
        "rrf_fuse": q_rrf_fuse,
        "hamming_near_pairs": q_hamming_near_pairs,
        "canonical_urls": q_canonical_urls,
        "langid_ngram": q_langid_ngram,
        "langid_corpus": q_langid_corpus,
        "ppl_buckets": q_ppl_buckets,
        "para_dedup": q_para_dedup,
        "allpairs_jaccard": q_allpairs_jaccard,
        "cms_counts": q_cms_counts,
        "main_content": q_main_content,
        "robots_screen": q_robots_screen,
        "html_meta": q_html_meta,
        "gopher_flags": q_gopher_flags,
        "filter_sweep": q_filter_sweep,
        "gopher_repetition": q_gopher_repetition,
        "trimmed_spans": q_trimmed_spans,
        "c4_clean": q_c4_clean,
        "host_quality": q_host_quality,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_SHINGLE3 = (
    "list_transform(range(1, len(string_split(text, ' ')) - 1), i -> "
    "string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' "
    "|| string_split(text, ' ')[i+2])"
)
_SHINGLE4 = (
    "list_transform(range(1, len(string_split(text, ' ')) - 2), i -> "
    "string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' "
    "|| string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3])"
)

_MINHASH_SIG_CTE = f"""
sh AS (
    SELECT doc_id AS id, unnest({_SHINGLE3}) AS shingle
    FROM documents WHERE len(string_split(text, ' ')) >= 3
),
sig AS (
    SELECT id,
           min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
           min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3,
           min(md5('4|' || shingle)) AS h4, min(md5('5|' || shingle)) AS h5,
           min(md5('6|' || shingle)) AS h6, min(md5('7|' || shingle)) AS h7
    FROM sh GROUP BY id
)"""

_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)

_LANG_SCORES = {
    lang: (
        "len(list_filter(regexp_split_to_array(text, '\\s+'), t -> list_contains(["
        + ", ".join(f"'{w}'" for w in words)
        + "], t)))"
    )
    for lang, words in {
        "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
        "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
        "es": ["el", "la", "de", "los", "las", "un", "una", "es", "en", "que"],
        "de": ["der", "die", "das", "und", "ist", "ein", "eine", "den", "von", "mit"],
        "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "不"],
    }.items()
}


def oracle_sql() -> dict[str, str]:
    return {
        k: v for k, v in _oracle_sql_all().items() if k not in _LOCAL_ONLY
    }


def _oracle_sql_all() -> dict[str, str]:
    o: dict[str, str] = {}

    o["row_count"] = "SELECT CAST(COUNT(*) AS BIGINT) AS row_count FROM lineitem"

    o["null_counts"] = "SELECT " + ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS nulls_{c}"
        for c in LINEITEM_COLS
    ) + " FROM lineitem"

    o["distinct_counts"] = "SELECT " + ", ".join(
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS distinct_{c}"
        for c in LINEITEM_COLS
    ) + " FROM lineitem"

    cols = ", ".join(LINEITEM_COLS)
    o["duplicate_row_groups"] = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS duplicate_groups FROM (
    SELECT {cols}, COUNT(*) AS cnt FROM lineitem GROUP BY {cols} HAVING COUNT(*) > 1
) d"""

    parts = []
    for c in NUMERIC_MEASURES:
        parts += [
            f"MIN({c}) AS min_{c}",
            f"MAX({c}) AS max_{c}",
            f"ROUND(AVG({c}), 4) AS avg_{c}",
            f"ROUND(SUM({c}), 2) AS sum_{c}",
            f"ROUND(STDDEV_SAMP({c}), 4) AS stdev_{c}",
            f"ROUND(quantile_cont({c}, 0.25), 4) AS q1_{c}",
            f"ROUND(quantile_cont({c}, 0.5), 4) AS median_{c}",
            f"ROUND(quantile_cont({c}, 0.75), 4) AS q3_{c}",
        ]
    o["numeric_summary"] = "SELECT " + ", ".join(parts) + " FROM lineitem"

    parts = []
    for c in ["p_name", "p_brand", "p_type"]:
        parts += [
            f"CAST(MIN(LENGTH({c})) AS BIGINT) AS min_length_{c}",
            f"CAST(MAX(LENGTH({c})) AS BIGINT) AS max_length_{c}",
            f"ROUND(AVG(LENGTH({c})), 4) AS avg_length_{c}",
        ]
    o["text_length_stats"] = "SELECT " + ", ".join(parts) + " FROM part"

    pats = (
        ("email", ".*@.*\\..*"),
        ("digits", "^[0-9]+$"),
        ("datelike", "^[0-9]{2,4}[/-][0-9]{1,2}[/-][0-9]{1,2}$"),
    )
    parts = []
    for c in ["p_name", "p_type"]:
        for name, pat in pats:
            parts.append(
                f"CAST(COUNT(*) FILTER (WHERE regexp_matches({c}, '{pat}')) AS BIGINT)"
                f" AS {name}_{c}"
            )
    o["text_patterns"] = "SELECT " + ", ".join(parts) + " FROM part"

    o["date_stats"] = """
SELECT strftime(CAST(MIN(l_shipdate) AS DATE), '%Y-%m-%d') AS min_shipdate,
       strftime(CAST(MAX(l_shipdate) AS DATE), '%Y-%m-%d') AS max_shipdate,
       CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS distinct_shipdates,
       CAST(date_diff('day', CAST(MIN(l_shipdate) AS DATE), CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS range_days
FROM lineitem"""

    o["frequent_values"] = """
WITH total AS (SELECT COUNT(*) AS n FROM orders)
(SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        ROUND(COUNT(*) * 100.0 / (SELECT n FROM total), 2) AS percentage
 FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY o_orderstatus
 ORDER BY frequency DESC, value ASC LIMIT 1)
UNION ALL
(SELECT 'o_orderpriority', o_orderpriority, CAST(COUNT(*) AS BIGINT),
        ROUND(COUNT(*) * 100.0 / (SELECT n FROM total), 2)
 FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority
 ORDER BY 3 DESC, 2 ASC LIMIT 1)"""

    o["outlier_counts"] = """
(SELECT 'l_extendedprice' AS col_name, CAST(COUNT(*) AS BIGINT) AS outlier_count
 FROM lineitem, (SELECT AVG(l_extendedprice) a, STDDEV_SAMP(l_extendedprice) s FROM lineitem) st
 WHERE l_extendedprice > st.a + 3*st.s OR l_extendedprice < st.a - 3*st.s)
UNION ALL
(SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT)
 FROM orders, (SELECT AVG(o_totalprice) a, STDDEV_SAMP(o_totalprice) s FROM orders) st
 WHERE o_totalprice > st.a + 3*st.s OR o_totalprice < st.a - 3*st.s)"""

    o["outlier_values"] = """
SELECT o_orderkey, o_totalprice
FROM orders, (SELECT AVG(o_totalprice) a, STDDEV_SAMP(o_totalprice) s FROM orders) st
WHERE o_totalprice > st.a + 2*st.s OR o_totalprice < st.a - 2*st.s
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

    o["category_skew"] = """
(SELECT 'o_orderstatus' AS col_name, 95.0 AS pct_threshold, CAST(COUNT(*) AS BIGINT) AS groups_over
 FROM (SELECT o_orderstatus, COUNT(*) AS cnt,
              COUNT(*) * 100.0 / NULLIF((SELECT COUNT(*) FROM orders), 0) AS pct
       FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY o_orderstatus) v
 WHERE pct > 95.0)
UNION ALL
(SELECT 'c_mktsegment', 20.0, CAST(COUNT(*) AS BIGINT)
 FROM (SELECT c_mktsegment, COUNT(*) AS cnt,
              COUNT(*) * 100.0 / NULLIF((SELECT COUNT(*) FROM customer), 0) AS pct
       FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment) v
 WHERE pct > 20.0)"""

    o["uniqueness_violations"] = """
(SELECT 'l_partkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS dup_groups FROM (
    SELECT l_partkey, COUNT(*) c FROM lineitem WHERE l_partkey IS NOT NULL
    GROUP BY l_partkey HAVING COUNT(*) > 1) d)
UNION ALL
(SELECT 'c_custkey', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT c_custkey, COUNT(*) c FROM customer WHERE c_custkey IS NOT NULL
    GROUP BY c_custkey HAVING COUNT(*) > 1) d)"""

    o["fk_cardinality_flag"] = """
SELECT CAST(CASE WHEN (SELECT COUNT(DISTINCT o_custkey) FROM orders
                       WHERE o_custkey IS NOT NULL) = 1 THEN 1 ELSE 0 END AS BIGINT)
       AS single_value_flag"""

    o["row_growth_flag"] = """
WITH current_count AS (SELECT COUNT(*) AS cnt FROM lineitem),
prev_count AS (SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE COUNT(*) END AS cnt FROM lineitem)
SELECT CAST(CASE WHEN prev_count.cnt IS NULL THEN 0
            WHEN ABS(current_count.cnt - prev_count.cnt) > prev_count.cnt * 0.2 THEN 1
            ELSE 0 END AS BIGINT) AS growth_flag
FROM current_count, prev_count"""

    o["validation_results"] = """
SELECT 'orders_not_empty' AS rule_name,
       CAST((SELECT COUNT(*) FROM orders) AS DOUBLE) AS actual_value,
       (SELECT COUNT(*) FROM orders) > 0 AS is_valid
UNION ALL
SELECT 'quantity_positive',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0) AS DOUBLE),
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0) = 0
UNION ALL
SELECT 'totalprice_not_zero',
       CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice = 0) AS DOUBLE),
       (SELECT COUNT(*) FROM orders WHERE o_totalprice = 0) = 0
UNION ALL
SELECT 'avg_price_between',
       (SELECT ROUND(AVG(o_totalprice), 4) FROM orders),
       (SELECT ROUND(AVG(o_totalprice), 4) FROM orders) BETWEEN 1000.0 AND 1000000.0"""

    # the engine rounds with Python round() (reference behavior,
    # profile_engine.py:418) — round-half-even over the true double.
    # DuckDB ROUND is decimal-half-up; printf matches Python exactly.
    pyround = "CAST(printf('%.{n}f', {x}) AS DOUBLE)"
    comp_branches = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, nulls_{c} AS nulls, "
        + pyround.format(n=2, x=f"nulls_{c} * 100.0 / rc")
        + f" AS null_pct, distinct_{c} AS distinct_count, "
        + pyround.format(n=2, x=f"distinct_{c} * 100.0 / rc")
        + " AS distinct_pct FROM s"
        for c in LINEITEM_COLS
    )
    o["profile_completeness"] = (
        "WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS rc, "
        + ", ".join(
            f"CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS nulls_{c}, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS distinct_{c}"
            for c in LINEITEM_COLS
        )
        + " FROM lineitem) "
        + comp_branches
    )

    num_branches = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(MIN({c}) AS DOUBLE) AS min, "
        f"CAST(MAX({c}) AS DOUBLE) AS max, "
        + pyround.format(n=4, x=f"AVG({c})")
        + " AS avg, "
        + pyround.format(n=2, x=f"SUM({c})")
        + " AS sum, "
        + pyround.format(n=4, x=f"STDDEV_SAMP({c})")
        + " AS stdev, "
        + pyround.format(n=4, x=f"quantile_cont({c}, 0.25)")
        + " AS q1, "
        + pyround.format(n=4, x=f"quantile_cont({c}, 0.5)")
        + " AS median, "
        + pyround.format(n=4, x=f"quantile_cont({c}, 0.75)")
        + " AS q3 FROM lineitem"
        for c in NUMERIC_MEASURES
    )
    o["profile_numeric"] = num_branches

    o["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

    o["shipping_priority"] = """
SELECT l_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, order_date, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""

    o["forecast_revenue"] = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_effect,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24"""

    o["numeric_correlations"] = """
SELECT ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       ROUND(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
       ROUND(corr(l_quantity, l_discount), 4) AS corr_qty_disc
FROM lineitem"""

    o["column_entropy"] = """
WITH pairs AS (
    SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value FROM orders
    WHERE o_orderstatus IS NOT NULL
    UNION ALL
    SELECT 'o_orderpriority', o_orderpriority FROM orders
    WHERE o_orderpriority IS NOT NULL
),
counts AS (
    SELECT col_name, value, COUNT(*) AS cnt FROM pairs GROUP BY col_name, value
),
totals AS (
    SELECT col_name, SUM(cnt) AS total, COUNT(*) AS n_values
    FROM counts GROUP BY col_name
)
SELECT c.col_name,
       CAST(MAX(t.n_values) AS BIGINT) AS n_values,
       ROUND(-SUM((c.cnt * 1.0 / t.total) * ln(c.cnt * 1.0 / t.total)), 4) AS entropy_nats
FROM counts c JOIN totals t ON c.col_name = t.col_name
GROUP BY c.col_name"""

    o["systematic_sample"] = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey"""

    o["group_topk"] = """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
    FROM orders) x
WHERE rk <= 3"""

    o["region_revenue"] = """
SELECT r_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name"""

    o["array_agg"] = """
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority"""

    o["running_totals"] = """
SELECT o_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders WHERE o_custkey < 20"""

    o["rollup_counts"] = """
SELECT
    CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
    CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
    CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""

    o["dedup_exact_normalized"] = """
WITH norm AS (
    SELECT trim(regexp_replace(regexp_replace(lower(text),
        '[.,!?;:''"()\\[\\]{}]', '', 'g'), '\\s+', ' ', 'g')) AS norm_text
    FROM documents
)
SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
       CAST(COUNT(*) AS BIGINT) AS distinct_keys,
       CAST(SUM(cnt - 1) AS BIGINT) AS surplus_rows,
       CAST(COUNT(*) FILTER (WHERE cnt > 1) AS BIGINT) AS duplicated_groups
FROM (SELECT norm_text, COUNT(*) AS cnt FROM norm GROUP BY norm_text) g"""

    _nov_sig = """
        SELECT id,
               min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
               min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3,
               min(md5('4|' || shingle)) AS h4, min(md5('5|' || shingle)) AS h5,
               min(md5('6|' || shingle)) AS h6, min(md5('7|' || shingle)) AS h7
        FROM {src}_sh GROUP BY id"""
    _nov_bands = """
        SELECT id, b.band, CASE b.band
            WHEN 0 THEN md5(h0 || '|' || h1) WHEN 1 THEN md5(h2 || '|' || h3)
            WHEN 2 THEN md5(h4 || '|' || h5) ELSE md5(h6 || '|' || h7) END AS bkey
        FROM {src}_sig, (SELECT unnest([0, 1, 2, 3]) AS band) b"""
    _nov_agree = " + ".join(f"(sa.h{k} = sb.h{k})::INT" for k in range(8))
    o["novelty_screen"] = f"""
WITH newdocs AS (
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id, text FROM documents WHERE doc_id >= 400 AND doc_id < 500
),
refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
new_sh AS (
    SELECT doc_id AS id, unnest({_SHINGLE3}) AS shingle
    FROM newdocs WHERE len(string_split(text, ' ')) >= 3),
ref_sh AS (
    SELECT doc_id AS id, unnest({_SHINGLE3}) AS shingle
    FROM refdocs WHERE len(string_split(text, ' ')) >= 3),
new_sig AS ({_nov_sig.format(src='new')}),
ref_sig AS ({_nov_sig.format(src='ref')}),
new_bands AS ({_nov_bands.format(src='new')}),
ref_bands AS ({_nov_bands.format(src='ref')}),
cands AS (
    SELECT DISTINCT a.id AS new_id, b.id AS ref_id
    FROM new_bands a JOIN ref_bands b ON a.band = b.band AND a.bkey = b.bkey)
SELECT c.new_id, c.ref_id, ({_nov_agree}) / 8.0 AS est_jaccard
FROM cands c
JOIN new_sig sa ON c.new_id = sa.id
JOIN ref_sig sb ON c.ref_id = sb.id
WHERE ({_nov_agree}) / 8.0 >= 0.5"""

    o["dedup_minhash"] = f"""
WITH {_MINHASH_SIG_CTE},
bands AS (
    SELECT id, b.band, CASE b.band
        WHEN 0 THEN md5(h0 || '|' || h1) WHEN 1 THEN md5(h2 || '|' || h3)
        WHEN 2 THEN md5(h4 || '|' || h5) ELSE md5(h6 || '|' || h7) END AS bkey
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
)
SELECT p.id_a, p.id_b,
       ((sa.h0 = sb.h0)::INT + (sa.h1 = sb.h1)::INT + (sa.h2 = sb.h2)::INT +
        (sa.h3 = sb.h3)::INT + (sa.h4 = sb.h4)::INT + (sa.h5 = sb.h5)::INT +
        (sa.h6 = sb.h6)::INT + (sa.h7 = sb.h7)::INT) / 8.0 AS est_jaccard
FROM pairs p JOIN sig sa ON p.id_a = sa.id JOIN sig sb ON p.id_b = sb.id
WHERE ((sa.h0 = sb.h0)::INT + (sa.h1 = sb.h1)::INT + (sa.h2 = sb.h2)::INT +
       (sa.h3 = sb.h3)::INT + (sa.h4 = sb.h4)::INT + (sa.h5 = sb.h5)::INT +
       (sa.h6 = sb.h6)::INT + (sa.h7 = sb.h7)::INT) / 8.0 >= 0.5"""

    o["dedup_clusters"] = f"""
WITH RECURSIVE {_MINHASH_SIG_CTE.lstrip()},
bands AS (
    SELECT id, b.band, CASE b.band
        WHEN 0 THEN md5(h0 || '|' || h1) WHEN 1 THEN md5(h2 || '|' || h3)
        WHEN 2 THEN md5(h4 || '|' || h5) ELSE md5(h6 || '|' || h7) END AS bkey
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cpairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
fpairs AS (
    SELECT p.id_a, p.id_b
    FROM cpairs p JOIN sig sa ON p.id_a = sa.id JOIN sig sb ON p.id_b = sb.id
    WHERE ((sa.h0 = sb.h0)::INT + (sa.h1 = sb.h1)::INT + (sa.h2 = sb.h2)::INT +
           (sa.h3 = sb.h3)::INT + (sa.h4 = sb.h4)::INT + (sa.h5 = sb.h5)::INT +
           (sa.h6 = sb.h6)::INT + (sa.h7 = sb.h7)::INT) / 8.0 >= 0.5
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM fpairs
    UNION SELECT id_b, id_a FROM fpairs
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, r) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id
)
SELECT id, MIN(r) AS cluster FROM reach GROUP BY id"""

    o["ngram_jaccard"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS id, unnest({_SHINGLE3}) AS shingle
    FROM documents WHERE len(string_split(text, ' ')) >= 3
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.8"""

    # brute-force all-pairs (no prefix filter!) — identical output IS
    # the losslessness proof for the AllPairs candidate generation
    o["allpairs_jaccard"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS id, unnest({_SHINGLE3}) AS shingle
    FROM documents WHERE len(string_split(text, ' ')) >= 3
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.5"""

    # the full Count-Min counter matrix re-derived in SQL: positions
    # are the first 15 md5 hex chars cast via a 0x-literal, exactly
    # the Spark side's conv(substring(md5(...),1,15),16,10) % width
    o["cms_counts"] = """
WITH rows_ AS (SELECT unnest(generate_series(0, 2)) AS r),
occ AS (
    SELECT o_custkey::VARCHAR AS key FROM orders WHERE o_custkey IS NOT NULL
),
cells AS (
    SELECT r,
           CAST(('0x' || substr(md5('sparvi-cms|' || r || '|' || key), 1, 15))
                AS BIGINT) % 256 AS p,
           COUNT(*) AS c
    FROM occ CROSS JOIN rows_
    GROUP BY 1, 2
),
keys AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL
),
probes AS (
    SELECT k.o_custkey, r.r,
           CAST(('0x' || substr(md5('sparvi-cms|' || r.r || '|' ||
                                     k.o_custkey::VARCHAR), 1, 15))
                AS BIGINT) % 256 AS p
    FROM keys k CROSS JOIN rows_ r
)
SELECT pr.o_custkey::BIGINT AS o_custkey,
       MIN(COALESCE(c.c, 0))::BIGINT AS est
FROM probes pr LEFT JOIN cells c ON c.r = pr.r AND c.p = pr.p
GROUP BY pr.o_custkey"""

    # the block/anchor/link-density pipeline re-derived in DuckDB
    # lambdas over the same RE2 patterns as the Spark expressions
    _MC_BLOCK_RE = (
        r"(?i)</?(?:p|div|td|th|li|h[1-6]|article|section|main|header|"
        r"footer|nav|aside|br|tr|table|ul|ol|dl|blockquote|pre|form|"
        r"figure|figcaption)\b[^>]*>"
    )
    _MC_PLAIN = (
        "trim(regexp_replace("
        "replace(replace(replace(replace(replace(replace(replace("
        "regexp_replace({X}, '</?[a-zA-Z][^>]*>', ' ', 'g'),"
        "'&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),"
        "'&quot;', '\"'), '&#39;', chr(39)), '&apos;', chr(39)),"
        r" '\s+', ' ', 'g'))"
    )
    _MC_LINKS = (
        "coalesce(list_sum(list_transform("
        "regexp_extract_all(b, '(?is)<a\\b[^>]*>(.*?)</a>', 1),"
        f"x -> length({_MC_PLAIN.format(X='x')}))), 0)"
    )
    o["main_content"] = f"""
WITH pages AS (
    SELECT doc_id,
           '<html><head><script>var x=1;</script></head><body>'
           || '<nav><a href="/">Home</a> <a href="/a">About</a> '
           || '<a href="/c">Contact</a></nav><p>'
           || COALESCE(text, '')
           || '</p><footer><a href="/p">Privacy</a> '
           || '<a href="/t">Terms</a></footer></body></html>' AS html
    FROM documents WHERE doc_id < 200
),
blocks AS (
    SELECT doc_id,
           string_split(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(html,
                                   '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                           '(?s)<!--.*?-->', ' ', 'g'),
                       '[\\s\x1e]+', ' ', 'g'),
                   '{_MC_BLOCK_RE}', chr(30), 'g'),
               chr(30)) AS bs
    FROM pages
),
scored AS (
    SELECT doc_id,
           list_transform(bs, b -> struct_pack(
               t := {_MC_PLAIN.format(X='b')},
               l := {_MC_LINKS}
           )) AS ss
    FROM blocks
)
SELECT doc_id,
       array_to_string(
           list_transform(
               list_filter(ss, s -> length(s.t) >= 25
                                AND s.l <= 0.3 * length(s.t)),
               s -> s.t),
           chr(10)) AS main
FROM scored"""

    # RFC 9309 decision rule re-derived: REP pattern -> RE2 regex
    # (metachars escaped, * -> .*, trailing $ stays an anchor), then
    # longest-match wins with allow winning ties, no match = allowed
    _robots_vals = ",\n  ".join(
        f"('{h}', '{a}', {str(al).upper()}, '{p}')"
        for h, a, al, p in _ROBOTS_RULES
    )
    # html_meta: every extractor regex spelled out as a LITERAL below —
    # deliberately NOT imported from functions/web.py, so the oracle
    # stays blind to a bug in the implementation's pattern constants
    # (sharing planted DATA with the query is fine; sharing matching
    # LOGIC would make parity vacuous). Entity decode + collapse are
    # replicated in the exact replace order. Coalesce order matches
    # the implementation: (double-quote fwd, rev), (single-quote fwd,
    # rev) — value classes are quote-specific so a double-quoted value
    # containing an apostrophe is not truncated.
    _HM_PATS = {
        "description": [
            r"""(?is)<meta\b[^>]*name\s*=\s*["']description["'][^>]*content\s*=\s*"([^"]*)""",
            r"""(?is)<meta\b[^>]*content\s*=\s*"([^"]*)"[^>]*name\s*=\s*["']description["']""",
            r"""(?is)<meta\b[^>]*name\s*=\s*["']description["'][^>]*content\s*=\s*'([^']*)""",
            r"""(?is)<meta\b[^>]*content\s*=\s*'([^']*)'[^>]*name\s*=\s*["']description["']""",
        ],
        "robots": [
            r"""(?is)<meta\b[^>]*name\s*=\s*["']robots["'][^>]*content\s*=\s*"([^"]*)""",
            r"""(?is)<meta\b[^>]*content\s*=\s*"([^"]*)"[^>]*name\s*=\s*["']robots["']""",
            r"""(?is)<meta\b[^>]*name\s*=\s*["']robots["'][^>]*content\s*=\s*'([^']*)""",
            r"""(?is)<meta\b[^>]*content\s*=\s*'([^']*)'[^>]*name\s*=\s*["']robots["']""",
        ],
        "canonical": [
            r"""(?is)<link\b[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*"([^"]*)""",
            r"""(?is)<link\b[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*["']canonical["']""",
            r"""(?is)<link\b[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*'([^']*)""",
            r"""(?is)<link\b[^>]*href\s*=\s*'([^']*)'[^>]*rel\s*=\s*["']canonical["']""",
        ],
    }

    def _hm_sq(s: str) -> str:
        return s.replace("'", "''")

    def _hm_dec(x: str) -> str:
        # the _ENTITIES chain, same order as functions/text.py
        return (
            "replace(replace(replace(replace(replace(replace(replace("
            + x
            + ", '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),"
            " '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)),"
            " '&apos;', chr(39))"
        )

    def _hm_norm(x: str) -> str:
        return (
            "NULLIF(trim(regexp_replace(" + _hm_dec(x)
            + r", '\s+', ' ', 'g')), '')"
        )

    def _hm_pair(which):
        return (
            "COALESCE("
            + ", ".join(
                f"NULLIF(regexp_extract(text, '{_hm_sq(p)}', 1), '')"
                for p in _HM_PATS[which]
            )
            + ")"
        )

    _hm_title = "regexp_extract(text, '(?is)<title[^>]*>(.*?)</title>', 1)"
    # lang needs a preceding delimiter ([\s"']) — \b treats :/- as word
    # boundaries, so a bare \blang would match data-lang / xml:lang
    _hm_lang = (
        "NULLIF(lower(regexp_extract(text,"
        " '(?is)<html\\b[^>]*[\\s\"'']lang\\s*=\\s*[\"'']?"
        "([a-zA-Z][a-zA-Z-]*)', 1)), '')"
    )
    _hm_pages_case = (
        "CASE doc_id % 8 "
        + " ".join(
            f"WHEN {k} THEN '{_hm_sq(v)}'"
            for k, v in _HTML_META_PAGES.items()
        )
        + " END"
    )
    o["html_meta"] = f"""
WITH pages AS (
    SELECT doc_id, {_hm_pages_case} AS text
    FROM documents WHERE doc_id < 240
)
SELECT doc_id,
       {_hm_norm(_hm_title)} AS title,
       {_hm_norm(_hm_pair("description"))}
           AS description,
       {_hm_lang} AS html_lang,
       {_hm_pair("canonical")} AS canonical_url,
       contains(lower(coalesce(
           {_hm_norm(_hm_pair("robots"))},
           '')), 'noindex') AS noindex
FROM pages"""

    o["robots_screen"] = """
WITH urls AS (
    SELECT doc_id,
           'https://h.example/p' || (doc_id % 7) || '/q' || (doc_id % 3)
           || CASE WHEN doc_id % 5 = 0 THEN '/end' ELSE '' END AS url
    FROM documents WHERE doc_id < 300
),
rules(host, agent, allow, pattern) AS (VALUES
  __VALS__),
grp AS (
    SELECT host, allow, pattern,
           '^' || regexp_replace(
                      regexp_replace(
                          regexp_replace(pattern,
                              '([\\^$.|?+()\\[\\]{}])', '\\\\\\1', 'g'),
                          '\\*', '.*', 'g'),
                      '\\\\\\$$', '$') AS rx
    FROM rules WHERE agent = '*'
),
pathed AS (
    SELECT doc_id, url,
           COALESCE(NULLIF(regexp_extract(url,
               '^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*(/[^?#]*)', 1),
               ''), '/') AS path,
           lower(regexp_extract(url,
               '^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)',
               1)) AS host
    FROM urls
),
win AS (
    SELECT p.doc_id, g.allow,
           row_number() OVER (
               PARTITION BY p.doc_id
               ORDER BY length(g.pattern) DESC, g.allow DESC
           ) AS rn
    FROM pathed p JOIN grp g
      ON g.host = p.host AND regexp_matches(p.path, g.rx)
)
SELECT p.doc_id, p.url, COALESCE(w.allow, TRUE) AS allowed
FROM pathed p LEFT JOIN win w ON p.doc_id = w.doc_id AND w.rn = 1
""".replace("__VALS__", _robots_vals)

    o["ngram_jaccard_lsh"] = f"""
WITH {_MINHASH_SIG_CTE.lstrip()},
bands AS (
    SELECT id, b.band, CASE b.band
        WHEN 0 THEN md5(h0 || '|' || h1) WHEN 1 THEN md5(h2 || '|' || h3)
        WHEN 2 THEN md5(h4 || '|' || h5) ELSE md5(h6 || '|' || h7) END AS bkey
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cpairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
shd AS (SELECT DISTINCT id, shingle FROM sh),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM shd GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS shared
    FROM cpairs c
    JOIN shd a ON a.id = c.id_a
    JOIN shd b ON b.id = c.id_b AND a.shingle = b.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.5"""

    o["fuzzy_name_pairs"] = """
SELECT x.c_custkey AS id_a, y.c_custkey AS id_b,
       CAST(levenshtein(x.c_name, y.c_name) AS INT) AS edit_distance
FROM customer x JOIN customer y ON x.c_custkey < y.c_custkey
WHERE levenshtein(x.c_name, y.c_name) <= 1"""

    o["simhash_near"] = """
WITH toks AS (
    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id < 200
),
hashed AS (
    SELECT id, md5(tok) AS h FROM toks WHERE tok <> ''
),
bits AS (
    SELECT id, b.bit,
           ((strpos('0123456789abcdef', substr(h, 16 - (b.bit // 4), 1)) - 1)
            // CAST(pow(2, b.bit % 4) AS INT)) % 2 AS bitval
    FROM hashed, (SELECT unnest(range(0, 64)) AS bit) b
),
sums AS (
    SELECT id, bit, SUM(CASE WHEN bitval = 1 THEN 1 ELSE -1 END) AS s
    FROM bits GROUP BY id, bit
),
sim AS (
    SELECT id, CAST(SUM(CASE WHEN s > 0 THEN
               CASE WHEN bit = 63 THEN -9223372036854775808
                    ELSE CAST(pow(2, bit) AS BIGINT) END
               ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sim a JOIN sim b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8"""

    topk_base = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 3),
scored AS (
    SELECT a.query_id, b.vec_id AS neighbor_id, ROUND({_COS}, 4) AS cosine
    FROM (SELECT query_id, embedding FROM q) a(query_id, embedding),
         embeddings b
    WHERE a.query_id <> b.vec_id {{extra}}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5"""
    o["embedding_topk"] = topk_base.format(extra="")

    o["embedding_topk_bucketed"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding, label FROM embeddings WHERE vec_id < 3),
scored AS (
    SELECT a.query_id, b.vec_id AS neighbor_id, ROUND({_COS}, 4) AS cosine
    FROM (SELECT query_id, embedding, label FROM q) a(query_id, embedding, label),
         embeddings b
    WHERE a.query_id <> b.vec_id AND a.label = b.label
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5"""

    o["embedding_near_dups"] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 4) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_COS}, 4) >= 0.4"""

    o["range_join_events"] = """
WITH w AS (
    SELECT DISTINCT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 90 MINUTE AS window_end
    FROM events
)
SELECT w.window_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events l JOIN w ON l.ts BETWEEN w.window_start AND w.window_end
GROUP BY 1"""

    o["sq_codes"] = """
WITH ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
),
b AS (
    SELECT pos, MIN(val) AS lo, MAX(val) AS hi FROM ex GROUP BY pos
)
SELECT e.vec_id AS id, CAST(e.pos - 1 AS INT) AS dim,
       CAST(CASE WHEN b.hi > b.lo
                 THEN FLOOR((LEAST(GREATEST(e.val, b.lo), b.hi) - b.lo)
                            / (b.hi - b.lo) * 255 + 0.5)
                 ELSE 0 END AS INT) AS code
FROM ex e JOIN b USING (pos)
WHERE e.vec_id < 200"""

    o["pq_codes"] = """
WITH ex AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
           unnest(embedding) AS val
    FROM embeddings
),
exd AS (
    SELECT vec_id, label, CAST((pos - 1) // 16 AS INT) AS subspace,
           (pos - 1) % 16 AS spos, CAST(val AS DOUBLE) AS val
    FROM ex
),
cent AS (
    SELECT label AS code, subspace, spos, AVG(val) AS cv
    FROM exd GROUP BY label, subspace, spos
),
dist AS (
    SELECT e.vec_id, e.subspace, c.code,
           ROUND(SQRT(SUM((e.val - c.cv) * (e.val - c.cv))), 4) AS d
    FROM exd e JOIN cent c ON e.subspace = c.subspace AND e.spos = c.spos
    WHERE e.vec_id < 200
    GROUP BY e.vec_id, e.subspace, c.code
),
best AS (
    SELECT vec_id, subspace, code,
           row_number() OVER (PARTITION BY vec_id, subspace
                              ORDER BY d, code) AS rn
    FROM dist
)
SELECT vec_id AS id, subspace, code FROM best WHERE rn = 1"""

    o["ivf_assign"] = """
WITH ex AS (
    SELECT label AS bucket, unnest(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
),
cent AS (
    SELECT bucket, pos, AVG(CAST(val AS DOUBLE)) AS v FROM ex GROUP BY bucket, pos
),
centroids AS (
    SELECT bucket, list(v ORDER BY pos) AS centroid FROM cent GROUP BY bucket
),
scored AS (
    SELECT e.vec_id AS id, c.bucket,
           list_distance(CAST(e.embedding AS DOUBLE[]), c.centroid) AS distance
    FROM embeddings e, centroids c
    WHERE e.vec_id < 100
)
SELECT id, arg_min(bucket, distance) AS bucket,
       ROUND(MIN(distance), 4) AS distance
FROM scored GROUP BY id"""

    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN {_LANG_SCORES[lang]} = best THEN '{lang}'"
            for lang in ["en", "fr", "es", "de", "zh"]
        )
        + " ELSE 'und' END"
    )
    greatest = "GREATEST(" + ", ".join(_LANG_SCORES[lang] for lang in ["en", "fr", "es", "de", "zh"]) + ")"
    o["language_id"] = f"""
WITH scored AS (
    SELECT doc_id AS id, text, {greatest} AS best FROM documents WHERE doc_id < 50
)
SELECT id, CASE WHEN best > 0 THEN {lang_case} ELSE 'und' END AS predicted_lang
FROM scored"""

    en_stops = ", ".join(f"'{w}'" for w in ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"])
    o["quality_scores"] = f"""
WITH base AS (
    SELECT doc_id AS id, text,
           len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS n_tokens,
           LENGTH(regexp_replace(text, '\\s', '', 'g')) AS no_space,
           len(regexp_extract_all(text, '[.,!?;:]')) AS punct,
           len(list_filter(regexp_split_to_array(text, '\\s+'), t -> list_contains([{en_stops}], t))) AS stop_hits
    FROM documents WHERE doc_id < 100
)
SELECT id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(no_space * 1.0 / GREATEST(n_tokens, 1), 4) AS avg_token_len,
       ROUND(punct * 1.0 / GREATEST(LENGTH(text), 1), 4) AS punct_ratio,
       ROUND(stop_hits * 1.0 / GREATEST(n_tokens, 1), 4) AS stopword_ratio,
       ROUND(0.4 * LEAST(1.0, n_tokens / 100.0) + 0.3 * (stop_hits * 1.0 / GREATEST(n_tokens, 1))
             + 0.3 * (1 - punct * 1.0 / GREATEST(LENGTH(text), 1)), 4) AS quality_score
FROM base"""

    o["conversation_stats"] = r"""
WITH built AS (
  SELECT doc_id,
         '[{"role":"' || CASE WHEN doc_id % 5 = 0 THEN 'system' ELSE 'user' END
         || '","content":"'
         || regexp_replace(substring(coalesce(text,''), 1, 48), '[^A-Za-z0-9 ]', '', 'g')
         || '"},{"role":"assistant","content":"'
         || regexp_replace(substring(coalesce(text,''), 49, 48), '[^A-Za-z0-9 ]', '', 'g')
         || '"},{"role":"'
         || CASE WHEN doc_id % 3 = 0 THEN 'assistant' ELSE 'user' END
         || '","content":"'
         || regexp_replace(substring(coalesce(text,''), 97, 48), '[^A-Za-z0-9 ]', '', 'g')
         || '"}]' AS messages
  FROM documents
),
parsed AS (
  SELECT doc_id,
         json_transform(messages,
             '[{"role":"VARCHAR","content":"VARCHAR"}]') AS turns
  FROM built
),
ex AS (
  SELECT doc_id,
         unnest(turns) AS turn,
         unnest(range(1, len(turns) + 1)) AS pos,
         len(turns) AS n
  FROM parsed
),
flat AS (
  SELECT doc_id, n, pos,
         turn.role AS role,
         coalesce(turn.content, '') AS content,
         CASE WHEN trim(coalesce(turn.content, '')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(turn.content), '\s+'))
         END AS toks
  FROM ex
),
alt AS (
  SELECT doc_id,
         coalesce(bool_and(role <> prev_role), TRUE) AS alternates_ok
  FROM (
    SELECT doc_id, role,
           lag(role) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_role
    FROM flat WHERE role <> 'system'
  )
  WHERE prev_role IS NOT NULL
  GROUP BY doc_id
)
SELECT f.doc_id,
       CAST(any_value(f.n) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (f.role = 'system') AS BIGINT) AS n_system,
       CAST(count(*) FILTER (f.role = 'user') AS BIGINT) AS n_user,
       CAST(count(*) FILTER (f.role = 'assistant') AS BIGINT) AS n_assistant,
       any_value(f.role ORDER BY f.pos) AS first_role,
       any_value(f.role ORDER BY f.pos DESC) AS last_role,
       coalesce(any_value(a.alternates_ok), TRUE) AS alternates_ok,
       CAST(count(*) FILTER (trim(f.content) = '') AS BIGINT) AS n_empty,
       CAST(sum(length(f.content)) AS BIGINT) AS total_chars,
       CAST(coalesce(sum(f.toks) FILTER (f.role = 'user'), 0) AS BIGINT) AS user_tokens,
       CAST(coalesce(sum(f.toks) FILTER (f.role = 'assistant'), 0) AS BIGINT) AS assistant_tokens
FROM flat f LEFT JOIN alt a USING (doc_id)
GROUP BY f.doc_id"""

    o["latest_events"] = """
SELECT user_id, event_id, event_type, value FROM events
QUALIFY row_number() OVER
    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1"""

    o["fingerprints"] = f"""
WITH sh AS (
    SELECT doc_id AS id, unnest({_SHINGLE4}) AS shingle
    FROM documents WHERE doc_id < 100 AND len(string_split(text, ' ')) >= 4
)
SELECT id, min(md5('fp|' || shingle)) AS fingerprint FROM sh GROUP BY id"""

    o["bm25_search"] = """
WITH base AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS dl,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x = 'data')) AS tf_data,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x = 'quality')) AS tf_quality,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x = 'pipeline')) AS tf_pipeline
  FROM documents
), stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
         sum((tf_data > 0)::BIGINT)::DOUBLE AS df_data,
         sum((tf_quality > 0)::BIGINT)::DOUBLE AS df_quality,
         sum((tf_pipeline > 0)::BIGINT)::DOUBLE AS df_pipeline
  FROM base
)
SELECT doc_id,
       round(
         ln(1 + (n - df_data + 0.5)/(df_data + 0.5))
           * (tf_data*2.2)/(tf_data + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
       + ln(1 + (n - df_quality + 0.5)/(df_quality + 0.5))
           * (tf_quality*2.2)/(tf_quality + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
       + ln(1 + (n - df_pipeline + 0.5)/(df_pipeline + 0.5))
           * (tf_pipeline*2.2)/(tf_pipeline + 1.2*(1 - 0.75 + 0.75*dl/avgdl)), 6) AS bm25,
       dl, tf_data, tf_quality, tf_pipeline
FROM base, stats
WHERE tf_data + tf_quality + tf_pipeline > 0
ORDER BY bm25 DESC, doc_id LIMIT 25"""

    o["sessionization"] = """
WITH ev AS (
    SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
    FROM events WHERE user_id < 20
),
flagged AS (
    SELECT user_id, us,
           CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM ev
),
sessions AS (
    SELECT user_id, us,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
               ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           (MAX(us) - MIN(us)) / 1000000.0 AS duration_seconds
    FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       ROUND(AVG(duration_seconds), 2) AS avg_session_seconds
FROM per_session GROUP BY user_id"""

    o["asof_purchase_click"] = """
WITH purchases AS (
    SELECT user_id, event_id AS purchase_event_id,
           CAST(epoch_ns(ts) // 1000 AS BIGINT) AS purchase_us
    FROM events WHERE event_type = 'purchase' AND user_id < 10
),
clicks AS (
    SELECT user_id, event_id AS click_event_id,
           CAST(epoch_ns(ts) // 1000 AS BIGINT) AS click_us
    FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_event_id, p.purchase_us,
       c.click_event_id, c.click_us
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us"""

    o["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2"""

    o["corpus_diversity"] = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
toks AS (SELECT unnest(l) AS tok FROM base),
freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
totals AS (
  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
         count(*) AS vocab_size,
         max(n) AS top_n,
         sum(n * ln(n)) AS sum_nlogn
  FROM freq
),
head AS (
  SELECT ln(row_number() OVER (ORDER BY n DESC, tok ASC)) AS x,
         ln(n) AS y
  FROM freq ORDER BY n DESC, tok ASC LIMIT 10000
),
zipf AS (
  SELECT CASE WHEN var_pop(x) > 0
              THEN covar_pop(x, y) / var_pop(x) END AS zipf_slope
  FROM head
),
bi AS (
  SELECT doc_id,
         unnest(list_slice(l, 1, len(l) - 1)) AS w1,
         unnest(list_slice(l, 2, len(l))) AS w2
  FROM base WHERE len(l) > 1
),
bifreq AS (SELECT w1, w2, count(*) AS n FROM bi GROUP BY ALL),
bistats AS (
  SELECT coalesce(sum(n), 0) AS n_bigrams,
         count(*) AS distinct_bigrams
  FROM bifreq
)
SELECT (SELECT count(*) FROM base) AS n_docs,
       t.n_tokens, t.vocab_size,
       round(t.vocab_size / (t.n_tokens * 1.0), 6) AS type_token_ratio,
       round(b.distinct_bigrams / (b.n_bigrams * 1.0), 6) AS distinct_2,
       round(ln(t.n_tokens) - t.sum_nlogn / t.n_tokens, 6) AS token_entropy,
       round(t.top_n / (t.n_tokens * 1.0), 6) AS top_token_frac,
       round(z.zipf_slope, 6) AS zipf_slope
FROM totals t, zipf z, bistats b"""

    o["nb_scores"] = """
WITH base AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
),
pairs AS (
  SELECT lang AS label, unnest(l) AS feature FROM base WHERE lang IS NOT NULL
),
counts AS (SELECT label, feature, count(*) AS n FROM pairs GROUP BY ALL),
classes AS (
  SELECT c.label, c.total, d.n_docs FROM
    (SELECT label, sum(n) AS total FROM counts GROUP BY label) c
    JOIN (SELECT lang AS label, count(*) AS n_docs FROM base
          WHERE lang IS NOT NULL GROUP BY lang) d USING (label)
),
dims AS (
  SELECT (SELECT count(DISTINCT feature) FROM counts) AS d,
         (SELECT count(*) FROM base WHERE lang IS NOT NULL) AS n_docs_all
),
toks AS (SELECT doc_id, unnest(l) AS feature FROM base),
contrib AS (
  SELECT t.doc_id, c.label,
         sum(ln(coalesce(cnt.n, 0) + 1.0)) AS loglik,
         count(*) AS n_tokens
  FROM toks t CROSS JOIN (SELECT label FROM classes) c
  LEFT JOIN counts cnt ON cnt.feature = t.feature AND cnt.label = c.label
  GROUP BY t.doc_id, c.label
),
grid AS (
  SELECT b.doc_id, c.label,
         coalesce(ct.loglik, 0.0) AS loglik,
         coalesce(ct.n_tokens, 0) AS n_tokens
  FROM base b CROSS JOIN (SELECT label FROM classes) c
  LEFT JOIN contrib ct ON ct.doc_id = b.doc_id AND ct.label = c.label
)
SELECT g.doc_id, g.label, g.n_tokens,
       round(ln(cl.n_docs * 1.0 / dims.n_docs_all) + g.loglik
             - g.n_tokens * ln(cl.total + 1.0 * dims.d), 4) AS score
FROM grid g JOIN classes cl ON g.label = cl.label, dims"""

    o["embedding_health"] = """
WITH per AS (
  SELECT CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null,
         CASE WHEN embedding IS NOT NULL THEN len(embedding) END AS dim,
         CASE WHEN embedding IS NOT NULL AND
              len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) > 0
              THEN 1 ELSE 0 END AS is_nan,
         CASE WHEN embedding IS NOT NULL AND
              len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) = 0
              THEN sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END AS norm
  FROM embeddings
)
SELECT count(*) AS n_vectors,
       CAST(sum(is_null) AS BIGINT) AS n_null,
       count(DISTINCT dim) AS n_dims_distinct,
       min(dim) AS dim_min,
       max(dim) AS dim_max,
       CAST(sum(is_nan) AS BIGINT) AS n_nan,
       CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       round(avg(norm), 6) AS norm_mean,
       round(stddev_samp(norm), 6) AS norm_std,
       round(min(norm), 6) AS norm_min,
       round(max(norm), 6) AS norm_max
FROM per"""

    o["dsir_scores"] = """
WITH feat AS (
  SELECT doc_id, lang,
         unnest(l || list_transform(range(1, len(l)),
                                    i -> l[i] || ' ' || l[i+1])) AS feature
  FROM (SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents)
),
counts AS (
  SELECT feature,
         count(*) FILTER (WHERE side = 't') AS n_target,
         count(*) FILTER (WHERE side = 'r') AS n_raw
  FROM (SELECT feature, 't' AS side FROM feat WHERE lang = 'en'
        UNION ALL SELECT feature, 'r' FROM feat)
  GROUP BY feature
),
tot AS (SELECT sum(n_target) AS nt, sum(n_raw) AS nr, count(*) AS d
        FROM counts)
SELECT f.doc_id,
       round(sum(ln(coalesce(c.n_target, 0) + 1.0) - ln(t.nt + t.d)
                 - ln(coalesce(c.n_raw, 0) + 1.0) + ln(t.nr + t.d)),
             6) AS log_importance,
       count(*) AS n_features
FROM feat f LEFT JOIN counts c USING (feature), tot t
GROUP BY f.doc_id"""

    # pii_counts: patterns interpolated from the module so SQL and
    # Spark can never drift; the Luhn check is inlined as a DuckDB
    # list lambda (strip separators, double every 2nd from the right,
    # sum % 10). 'g' flag on the card-strip replace: DuckDB replaces
    # first-match-only by default, Spark replaces all.
    from sparvi_core_spark.operators.pii import PII_PATTERNS as _PII

    _digits = "regexp_replace(c, '[ -]', '', 'g')"
    _dig_at = f"CAST(reverse({_digits})[i] AS INT)"
    _luhn = (
        f"len(list_filter(regexp_extract_all(text, '{_PII['credit_card']}'), c ->\n"
        f"  len({_digits}) >= 13\n"
        f"  AND list_sum(list_transform(range(1, len({_digits}) + 1),\n"
        f"    i -> CASE WHEN i % 2 = 0 THEN\n"
        f"           CASE WHEN {_dig_at} * 2 > 9 THEN {_dig_at} * 2 - 9\n"
        f"                ELSE {_dig_at} * 2 END\n"
        f"         ELSE {_dig_at} END)) % 10 = 0))"
    )
    o["hamming_topk"] = r"""
WITH sk AS (
  SELECT vec_id,
         [CAST(concat('0x', substr(md5(vec_id::VARCHAR || '|0'),1,15)) AS BIGINT),
          CAST(concat('0x', substr(md5(vec_id::VARCHAR || '|1'),1,15)) AS BIGINT),
          CAST(concat('0x', substr(md5(vec_id::VARCHAR || '|2'),1,15)) AS BIGINT)] AS sketch
  FROM embeddings
),
q AS (SELECT * FROM sk WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1,4),
              i -> bit_count(xor(q.sketch[i], v.sketch[i])))) AS BIGINT) AS distance
  FROM q, sk v WHERE q.vec_id <> v.vec_id
)
SELECT query_id, neighbor_id, distance,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY distance, neighbor_id) AS BIGINT) AS rank
FROM scored QUALIFY rank <= 5"""

    o["corpus_divergence"] = r"""
WITH fa AS (
  SELECT tok, count(*)::DOUBLE AS na FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
    FROM documents WHERE lang = 'en'
  ) GROUP BY tok
),
fb AS (
  SELECT tok, count(*)::DOUBLE AS nb FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
    FROM documents WHERE lang <> 'en'
  ) GROUP BY tok
),
j AS (
  SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM fa FULL OUTER JOIN fb USING (tok)
),
tot AS (
  SELECT sum(na) AS ta, sum(nb) AS tb, count(*) AS v_union,
         sum((na > 0)::INT) AS va, sum((nb > 0)::INT) AS vb,
         sum((na > 0 AND nb > 0)::INT) AS v_both
  FROM j
),
terms AS (
  SELECT j.na / t.ta AS p, j.nb / t.tb AS q,
         (j.na + 0.5) / (t.ta + 0.5 * t.v_union) AS ps,
         (j.nb + 0.5) / (t.tb + 0.5 * t.v_union) AS qs,
         t.*
  FROM j, tot t
)
SELECT CAST(any_value(ta) AS BIGINT) AS tokens_a,
       CAST(any_value(tb) AS BIGINT) AS tokens_b,
       CAST(any_value(va) AS BIGINT) AS vocab_a,
       CAST(any_value(vb) AS BIGINT) AS vocab_b,
       round(any_value(v_both) / any_value(v_union)::DOUBLE, 6) AS vocab_jaccard,
       round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
               + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END), 4) AS js_divergence,
       round(sum(ps * ln(ps / qs)), 4) AS kl_ab,
       round(sum(qs * ln(qs / ps)), 4) AS kl_ba,
       round(sum(abs(p - q) / 2), 4) AS tvd
FROM terms"""

    o["rrf_fuse"] = r"""
WITH base AS (
  SELECT d.doc_id, q.query_id
  FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d,
       (SELECT unnest([1, 2, 3]) AS query_id) q
),
ra AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY md5(doc_id::VARCHAR || '|a|' || query_id::VARCHAR),
                      doc_id) AS rank
  FROM base QUALIFY rank <= 10
),
rb AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY md5(doc_id::VARCHAR || '|b|' || query_id::VARCHAR),
                      doc_id) AS rank
  FROM base QUALIFY rank <= 10
),
un AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM ra
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM rb
),
fused AS (
  SELECT query_id, doc_id,
         round(sum(contrib), 6) AS rrf_score,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM un GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score, n_lists,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
FROM fused"""

    o["hamming_near_pairs"] = r"""
WITH sk AS (
  SELECT vec_id,
         [CAST(concat('0x', substr(md5((vec_id % 25)::VARCHAR || '|w0'),1,15)) AS BIGINT),
          CAST(concat('0x', substr(md5((vec_id % 40)::VARCHAR || '|w1'),1,15)) AS BIGINT),
          xor(CAST(concat('0x', substr(md5((vec_id % 50)::VARCHAR || '|w2'),1,15)) AS BIGINT),
              vec_id % 3)] AS sketch
  FROM embeddings
)
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(range(1,4),
              i -> bit_count(xor(a.sketch[i], b.sketch[i])))) AS BIGINT) AS distance
  FROM sk a, sk b
  WHERE a.vec_id < b.vec_id
) WHERE distance <= 2"""

    o["pii_counts"] = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' card 4111 1111 1111 1111' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' card 1234 5678 9012 3456' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call 415-555-0134 from 10.0.0.1 ssn 123-45-6789'
                 ELSE '' END AS text
  FROM documents
),
cnt AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_PII["email"]}')) AS n_email,
         len(regexp_extract_all(text, '{_PII["ipv4"]}')) AS n_ipv4,
         len(regexp_extract_all(text, '{_PII["ssn"]}')) AS n_ssn,
         {_luhn} AS n_credit_card,
         len(regexp_extract_all(
             regexp_replace(text, '{_PII["credit_card"]}', ' ', 'g'),
             '{_PII["phone"]}')) AS n_phone
  FROM aug
)
SELECT doc_id, n_email, n_ipv4, n_ssn, n_credit_card, n_phone,
       n_email + n_ipv4 + n_ssn + n_credit_card + n_phone AS pii_total
FROM cnt"""

    # canonical_urls: the oracle derives the EXPECTED canonical form of
    # each planted variant in closed form (independent of the engine's
    # regex/array pipeline)
    o["canonical_urls"] = """
SELECT doc_id AS id,
  CASE doc_id % 7
    WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Docs/' || doc_id || '/?utm_source=x&b=2&a=1#f'
    WHEN 1 THEN 'http://user:pw@Site.example.org:8080//x/' || doc_id || '/'
    WHEN 2 THEN 'https://example' || doc_id || '.com'
    WHEN 3 THEN 'https://cdn.example.net/a?z=9&y=8&gclid=' || doc_id
    WHEN 4 THEN 'plain text ' || doc_id
    WHEN 5 THEN 'https://h.example.com/p' || doc_id || '#a?b=c'
    ELSE 'ftp://Files.Example.com:21/pub/' || doc_id || '/'
  END AS url,
  CASE doc_id % 7
    WHEN 0 THEN 'https://www.example.com/Docs/' || doc_id || '?a=1&b=2'
    WHEN 1 THEN 'http://site.example.org:8080//x/' || doc_id
    WHEN 2 THEN 'https://example' || doc_id || '.com/'
    WHEN 3 THEN 'https://cdn.example.net/a?y=8&z=9'
    WHEN 4 THEN 'plain text ' || doc_id
    WHEN 5 THEN 'https://h.example.com/p' || doc_id
    ELSE 'ftp://files.example.com/pub/' || doc_id
  END AS canon
FROM documents"""

    # ppl_buckets: bigram-LM perplexity (the score_perplexity oracle
    # arithmetic) + per-language exact interpolated terciles
    # (quantile_cont == Spark's percentile) + head/middle/tail tags
    o["ppl_buckets"] = """
WITH base AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_slice(list_prepend('<s>', l), 1, len(l))) AS w1,
         unnest(l) AS w2
  FROM base WHERE len(l) > 0
), counts AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY ALL),
ctx AS (SELECT w1, sum(n) AS c_total FROM counts GROUP BY w1),
v AS (SELECT count(*) AS v FROM ctx),
logps AS (
  SELECT bg.doc_id,
         ln((coalesce(c.n, 0) + 0.1)/(coalesce(cx.c_total, 0) + 0.1*v.v)) AS logp
  FROM bg LEFT JOIN counts c USING (w1, w2) LEFT JOIN ctx cx USING (w1), v
),
scored AS (
  SELECT l.doc_id, b.lang, count(*) AS n_bigrams,
         round(exp(-avg(l.logp)), 6) AS perplexity
  FROM logps l JOIN base b USING (doc_id)
  GROUP BY l.doc_id, b.lang
),
thr AS (
  SELECT lang,
         quantile_cont(perplexity, 1.0/3) AS t_lo,
         quantile_cont(perplexity, 2.0/3) AS t_hi
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, CAST(s.n_bigrams AS BIGINT) AS n_bigrams,
       s.perplexity,
       CASE WHEN s.perplexity <= t.t_lo THEN 'head'
            WHEN s.perplexity <= t.t_hi THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN thr t USING (lang)"""

    # para_dedup: paragraph split + md5 keys + df>=2 + global (id,pos)
    # keeper + indexed list_filter rebuild (1-based i in DuckDB;
    # Spark positions are 0-based); untouched docs pass byte-identical
    o["para_dedup"] = """
WITH planted AS (
  SELECT doc_id,
    coalesce(text, '')
    || CASE WHEN doc_id % 3 = 0
            THEN chr(10) || chr(10) || 'shared banner alpha here'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN chr(10) || chr(10) || 'shared banner beta there'
            ELSE '' END AS text
  FROM documents WHERE doc_id < 150
),
base AS (
  SELECT doc_id AS id, text,
    list_filter(list_transform(string_split(text, chr(10) || chr(10)),
                               x -> trim(x)), x -> x <> '') AS paras
  FROM planted
),
occ AS (
  SELECT id, i.i - 1 AS pos, md5(paras[i.i]) AS phash
  FROM base, unnest(range(1, len(paras) + 1)) AS i(i)
),
flagged AS (
  SELECT phash, id, pos,
         ROW_NUMBER() OVER (PARTITION BY phash ORDER BY id, pos) AS rn
  FROM occ
  QUALIFY COUNT(DISTINCT id) OVER (PARTITION BY phash) >= 2
),
removals AS (SELECT id, pos FROM flagged WHERE rn > 1),
per_doc AS (
  SELECT id, list(pos) AS plist, CAST(COUNT(*) AS BIGINT) AS nrem
  FROM removals GROUP BY id
)
SELECT b.id,
  CASE WHEN p.id IS NULL THEN b.text
       ELSE COALESCE(array_to_string(
         list_filter(b.paras, (x, j) -> NOT list_contains(p.plist, j - 1)),
         chr(10) || chr(10)), '')
  END AS text,
  CAST(len(b.paras) - COALESCE(p.nrem, 0) AS BIGINT) AS n_paras_kept,
  COALESCE(p.nrem, 0) AS n_paras_removed
FROM base b LEFT JOIN per_doc p ON b.id = p.id"""

    # langid_ngram / langid_corpus: the ENTIRE char-n-gram NB pipeline
    # re-derived in DuckDB SQL — seed corpus inlined (zero drift),
    # normalization, 1/2/3-gram extraction, add-1 NB scoring,
    # label-asc argmax, and the und rule for featureless docs. Two
    # instantiations: the authored 12-language LANGID_SEEDS constant
    # (langid_ngram, the stable r8 pair) and the packaged 28-language
    # corpus files that back language_id's r11 DEFAULT model
    # (langid_corpus — the no-model path every user gets).
    from sparvi_core_spark.functions.text import LANGID_SEEDS as _LS

    _seed_vals = ",\n    ".join(
        f"('{lang}', '{s}')" for lang in sorted(_LS) for s in _LS[lang]
    )
    _planted_case = " ".join(
        f"WHEN {k} THEN '{v}'" for k, v in _LANGID_PLANTED.items()
    )
    _grams123 = (
        "list_concat(list_concat("
        "list_transform(range(1, len(t) - 1 + 2), i -> substr(t, i, 1)), "
        "list_transform(range(1, len(t) - 2 + 2), i -> substr(t, i, 2))), "
        "list_transform(range(1, len(t) - 3 + 2), i -> substr(t, i, 3)))"
    )
    o["langid_ngram"] = f"""
WITH seeds(label, text) AS (VALUES
    {_seed_vals}),
docs AS (
  SELECT doc_id AS id,
         CASE doc_id % 5 {_planted_case} ELSE text END AS text
  FROM documents WHERE doc_id < 100
),
snorm AS (SELECT label, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM seeds),
dnorm AS (SELECT id, trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS t FROM docs),
sfeat AS (SELECT label, unnest({_grams123}) AS feature FROM snorm),
counts AS (SELECT label, feature, count(*) AS n FROM sfeat GROUP BY ALL),
classes AS (
  SELECT c.label, c.total, d.n_docs FROM
    (SELECT label, sum(n) AS total FROM counts GROUP BY label) c
    JOIN (SELECT label, count(*) AS n_docs FROM seeds GROUP BY label) d USING (label)
),
dims AS (
  SELECT (SELECT count(DISTINCT feature) FROM counts) AS d,
         (SELECT count(*) FROM seeds) AS n_docs_all
),
dfeat AS (SELECT id, unnest({_grams123}) AS feature FROM dnorm),
contrib AS (
  SELECT f.id, c.label,
         sum(ln(coalesce(cnt.n, 0) + 1.0)) AS loglik,
         count(*) AS n_tokens
  FROM dfeat f CROSS JOIN (SELECT label FROM classes) c
  LEFT JOIN counts cnt ON cnt.feature = f.feature AND cnt.label = c.label
  GROUP BY f.id, c.label
),
grid AS (
  SELECT d0.id, c.label,
         coalesce(ct.loglik, 0.0) AS loglik,
         coalesce(ct.n_tokens, 0) AS n_tokens
  FROM dnorm d0 CROSS JOIN (SELECT label FROM classes) c
  LEFT JOIN contrib ct ON ct.id = d0.id AND ct.label = c.label
),
scored AS (
  SELECT g.id, g.label, g.n_tokens,
         round(ln(cl.n_docs * 1.0 / dims.n_docs_all) + g.loglik
               - g.n_tokens * ln(cl.total + 1.0 * dims.d), 4) AS score
  FROM grid g JOIN classes cl ON g.label = cl.label, dims
),
top AS (
  SELECT id, label, n_tokens,
         row_number() OVER (PARTITION BY id ORDER BY score DESC, label ASC) AS rn
  FROM scored
)
SELECT id, CASE WHEN n_tokens = 0 THEN 'und' ELSE label END AS predicted_lang
FROM top WHERE rn = 1"""

    # langid_corpus: the same SQL with the packaged 28-language corpus
    # inlined from the data files themselves (quotes escaped; the
    # loader's lowercase rule is re-applied by snorm's lower())
    from sparvi_core_spark.functions.text import (
        LANGID_SAMPLE_DIR as _LSD,
        load_langid_corpus as _load_lc,
    )

    _corpus_seeds = _load_lc(_osp.join(_LSD, "train"))
    _corpus_vals = ",\n    ".join(
        "('{}', '{}')".format(lang, s.replace("'", "''"))
        for lang in sorted(_corpus_seeds)
        for s in _corpus_seeds[lang]
    )
    o["langid_corpus"] = o["langid_ngram"].replace(_seed_vals, _corpus_vals)

    # gopher_flags: every statistic and boolean recomputed with DuckDB
    # list lambdas over identically-planted text
    _greq = ", ".join(f"'{w}'" for w in ["the", "be", "to", "of", "and", "that", "have", "with"])
    o["gopher_flags"] = f"""
WITH planted AS (
  SELECT doc_id,
         coalesce(text,'') || CASE doc_id % 4
           WHEN 0 THEN chr(10) || '- bullet item' || chr(10) || '* another'
           WHEN 1 THEN ' ### ### trailing...'
           WHEN 2 THEN chr(10) || 'ends with dots...' || chr(10) || '…'
           ELSE ' the of and that' END AS text
  FROM documents WHERE doc_id < 200
),
base AS (
  SELECT doc_id AS id, text,
    list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS words,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> x <> '') AS lines
  FROM planted
),
stats AS (
  SELECT id,
    CAST(len(words) AS BIGINT) AS n_words,
    ROUND(list_sum(list_transform(words, w -> len(w))) * 1.0
          / GREATEST(len(words), 1), 4) AS mean_word_len,
    ROUND((len(text) - len(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\\.\\.\\.|…'))) * 1.0
          / GREATEST(len(words), 1), 4) AS symbol_word_ratio,
    ROUND(len(list_filter(lines,
          x -> list_contains(['•','‣','▪','-','*'], substr(x, 1, 1)))) * 1.0
          / GREATEST(len(lines), 1), 4) AS bullet_line_frac,
    ROUND(len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…')) * 1.0
          / GREATEST(len(lines), 1), 4) AS ellipsis_line_frac,
    ROUND(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
          / GREATEST(len(words), 1), 4) AS alpha_word_frac,
    CAST(len(list_filter([{_greq}],
         r -> list_contains(list_transform(words, w -> lower(w)), r)))
         AS BIGINT) AS required_word_hits
  FROM base
)
SELECT *,
  (n_words BETWEEN 50 AND 100000) AS ok_word_count,
  (mean_word_len BETWEEN 3.0 AND 10.0) AS ok_mean_word_len,
  (symbol_word_ratio <= 0.10) AS ok_symbol_ratio,
  (bullet_line_frac <= 0.10) AS ok_bullet_lines,
  (ellipsis_line_frac <= 0.30) AS ok_ellipsis_lines,
  (alpha_word_frac >= 0.80) AS ok_alpha_words,
  (required_word_hits >= 2) AS ok_required_words,
  ((n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
   AND symbol_word_ratio <= 0.10 AND bullet_line_frac <= 0.10
   AND ellipsis_line_frac <= 0.30 AND alpha_word_frac >= 0.80
   AND required_word_hits >= 2) AS passes_gopher
FROM stats"""

    # gopher_repetition: all 11 granularities rebuilt with DuckDB list
    # lambdas; thresholds interpolated from the module (zero drift)
    from sparvi_core_spark.functions.text import (
        GOPHER_REPETITION_THRESHOLDS as _GRT,
    )

    _rep_units = (
        "ROUND(COALESCE(SUM({d}) FILTER (kind = '{k}') * 1.0 / "
        "GREATEST(SUM({t}) FILTER (kind = '{k}'), 1), 0), 4)"
    )
    _rep_dup = (
        "LEAST(ROUND(COALESCE(MAX(dup_all) FILTER (kind = 'g{n}'), 0) "
        "* 1.0 / MAX(chars), 4), 1.0)"
    )
    _rep_top = (
        "LEAST(ROUND(COALESCE(MAX(top_chars) FILTER (kind = 'g{n}'), 0) "
        "* 1.0 / MAX(chars), 4), 1.0)"
    )
    _stat_exprs = {
        "dup_line_frac": _rep_units.format(d="dup_occ", t="occ", k="line"),
        "dup_line_char_frac": _rep_units.format(
            d="dup_excess", t="all_chars", k="line"),
        "dup_para_frac": _rep_units.format(d="dup_occ", t="occ", k="para"),
        "dup_para_char_frac": _rep_units.format(
            d="dup_excess", t="all_chars", k="para"),
        **{f"top_{n}gram_char_frac": _rep_top.format(n=n) for n in (2, 3, 4)},
        **{f"dup_{n}gram_char_frac": _rep_dup.format(n=n)
           for n in range(5, 11)},
    }
    _stat_sql = ",\n    ".join(
        f"{e} AS {name}" for name, e in _stat_exprs.items()
    )
    _flag_sql = ",\n    ".join(
        f"({name} <= {_GRT[name]}) AS ok_{name}" for name in _stat_exprs
    )
    _pass_sql = " AND ".join(f"{name} <= {_GRT[name]}" for name in _stat_exprs)
    o["gopher_repetition"] = f"""
WITH planted AS (
  SELECT doc_id, coalesce(text, '') || CASE doc_id % 5
    WHEN 0 THEN chr(10) || 'repeated line' || chr(10) || 'repeated line' || chr(10) || 'repeated line'
    WHEN 1 THEN repeat(' spam phrase here ', 8)
    WHEN 2 THEN chr(10) || chr(10) || 'same para' || chr(10) || chr(10) || 'same para'
    WHEN 3 THEN repeat(' one two three four five six ', 3)
    ELSE '' END AS text
  FROM documents WHERE doc_id < 150
),
base AS (
  SELECT doc_id AS id, text, GREATEST(len(text), 1) AS chars,
    list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS words
  FROM planted
),
units AS (
  SELECT id, 'line' AS kind, u.u AS val FROM base,
    unnest(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS u(u)
  UNION ALL
  SELECT id, 'para', u.u FROM base,
    unnest(list_filter(list_transform(string_split(text, chr(10) || chr(10)), x -> trim(x)), x -> x <> '')) AS u(u)
  UNION ALL
  SELECT id, 'g' || n.n, g.g FROM base,
    unnest([2,3,4,5,6,7,8,9,10]) AS n(n),
    unnest(list_transform(range(1, len(words) - n.n + 2),
           i -> array_to_string(list_slice(words, i, i + n.n - 1), ' '))) AS g(g)
),
counts AS (
  SELECT id, kind, val, COUNT(*) AS c, len(val) AS ln
  FROM units GROUP BY ALL
),
per AS (
  SELECT id, kind, SUM(c) AS occ, SUM(c - 1) AS dup_occ,
         SUM((c - 1) * ln) AS dup_excess, SUM(c * ln) AS all_chars,
         SUM(CASE WHEN c > 1 THEN c * ln ELSE 0 END) AS dup_all
  FROM counts GROUP BY id, kind
),
tops AS (
  SELECT id, kind, CASE WHEN c >= 2 THEN c * ln ELSE 0 END AS top_chars
  FROM counts
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY id, kind ORDER BY c DESC, c * ln DESC, val DESC) = 1
),
joined AS (
  SELECT b.id, b.chars, p.kind, p.occ, p.dup_occ, p.dup_excess,
         p.all_chars, p.dup_all, t.top_chars
  FROM base b
  LEFT JOIN per p ON b.id = p.id
  LEFT JOIN tops t ON p.id = t.id AND p.kind = t.kind
),
stats AS (
  SELECT id,
    {_stat_sql}
  FROM joined GROUP BY id
)
SELECT *,
    {_flag_sql},
    ({_pass_sql}) AS passes_repetition
FROM stats"""

    # host_quality: per-host gate pass fractions; NULL flags fail via
    # COALESCE(flag, FALSE)
    o["host_quality"] = """
WITH planted AS (
  SELECT doc_id, n_chars,
    'h' || (doc_id % 5) || '.example.com' AS host,
    (doc_id % 2 = 0) AS f1,
    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE (doc_id % 3 = 0) END AS f2
  FROM documents
)
SELECT host,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
  ROUND(AVG(CASE WHEN COALESCE(f1, FALSE) THEN 1.0 ELSE 0.0 END), 4) AS f1_frac,
  ROUND(AVG(CASE WHEN COALESCE(f2, FALSE) THEN 1.0 ELSE 0.0 END), 4) AS f2_frac
FROM planted GROUP BY host"""

    # c4_clean: line filter + page flags with nested list lambdas;
    # terminals interpolated from the module (zero drift); COALESCE on
    # the empty-kept case (DuckDB array_to_string([]) is NULL)
    from sparvi_core_spark.functions.text import C4_TERMINALS as _C4T

    _ends = " OR ".join(
        "ends_with(ln, '{}')".format(t.replace("'", "''")) for t in _C4T
    )
    _line_ok = (
        f"({_ends}) "
        "AND len(list_filter(regexp_split_to_array(ln, '\\s+'), t -> t <> '')) >= 5 "
        "AND NOT list_contains(list_filter(regexp_split_to_array(lower(ln), '\\s+'), "
        "t -> t <> ''), 'javascript')"
    )
    o["c4_clean"] = f"""
WITH planted AS (
  SELECT doc_id, coalesce(text, '') || CASE doc_id % 4
    WHEN 0 THEN '.' || chr(10) || 'Good closing line with plenty of words here.'
    WHEN 1 THEN chr(10) || 'Enable javascript now please thanks.'
    WHEN 2 THEN ' lorem ipsum dolor.'
    ELSE ' {{ end' END AS text
  FROM documents WHERE doc_id < 150
),
base AS (
  SELECT doc_id AS id, text AS orig,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> x <> '') AS lines
  FROM planted
),
kept AS (
  SELECT id, orig, lines,
    list_filter(lines, ln -> {_line_ok}) AS keep
  FROM base
),
built AS (
  SELECT id, orig,
    COALESCE(array_to_string(keep, chr(10)), '') AS text,
    CAST(len(keep) AS BIGINT) AS n_lines_kept,
    CAST(len(lines) - len(keep) AS BIGINT) AS n_lines_dropped
  FROM kept
)
SELECT id, text, n_lines_kept, n_lines_dropped,
  (len(regexp_extract_all(text, '[.!?]')) >= 3) AS ok_sentences,
  (NOT contains(lower(orig), 'lorem ipsum')
   AND NOT contains(lower(orig), '{{')) AS ok_banned,
  TRUE AS ok_badwords,
  ((len(regexp_extract_all(text, '[.!?]')) >= 3)
   AND NOT contains(lower(orig), 'lorem ipsum')
   AND NOT contains(lower(orig), '{{')) AS passes_c4
FROM built"""

    # trimmed_spans: flagged-position union removed with an indexed
    # list_filter (1-based i in DuckDB; Spark positions are 0-based);
    # COALESCE because DuckDB's array_to_string([]) is NULL where
    # Spark's array_join is ''
    o["trimmed_spans"] = """
WITH planted AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 17 = 0 THEN 'shared span alpha beta gamma delta epsilon zeta'
      WHEN doc_id % 4 = 1 THEN coalesce(text, '') || ' shared span alpha beta gamma delta epsilon zeta'
      ELSE coalesce(text, '')
    END AS text
  FROM documents WHERE doc_id < 120
),
base AS (
  SELECT doc_id AS id, text, string_split(text, ' ') AS words FROM planted
),
wins AS (
  SELECT id, i.i - 1 AS pos,
         md5(array_to_string(list_slice(words, i.i, i.i + 6 - 1), ' ')) AS whash
  FROM base, unnest(range(1, len(words) - 6 + 2)) AS i(i)
),
fh AS (
  SELECT whash FROM (
    SELECT whash, COUNT(DISTINCT id) AS df FROM wins GROUP BY whash
  ) WHERE df >= 2
),
fpos AS (
  SELECT DISTINCT w.id AS fid, w.pos + u.u AS p
  FROM wins w JOIN fh USING (whash), unnest(range(0, 6)) AS u(u)
),
agg AS (
  SELECT fid, CAST(COUNT(*) AS BIGINT) AS nrem, list(p) AS plist
  FROM fpos GROUP BY fid
)
SELECT b.id,
  CASE WHEN a.fid IS NULL THEN b.text
       ELSE COALESCE(array_to_string(
         list_filter(b.words, (w, i) -> NOT list_contains(a.plist, i - 1)),
         ' '), '')
  END AS text,
  COALESCE(a.nrem, 0) AS n_tokens_removed
FROM base b LEFT JOIN agg a ON b.id = a.fid"""

    # filter_sweep: the oracle states the SEMANTICS (per-threshold
    # filtered aggregates via a cross join); the engine's one-pass
    # bucketed plan must reproduce it
    o["filter_sweep"] = f"""
WITH base AS (
  SELECT doc_id AS id, n_chars,
    ROUND(0.4 * LEAST(1.0, len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) / 100.0)
      + 0.3 * (len(list_filter(regexp_split_to_array(text, '\\s+'), t -> list_contains([{en_stops}], t))) * 1.0
               / GREATEST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')), 1))
      + 0.3 * (1 - len(regexp_extract_all(text, '[.,!?;:]')) * 1.0
               / GREATEST(LENGTH(text), 1)), 4) AS score
  FROM documents
),
t(threshold) AS (VALUES (0.3), (0.5), (0.7)),
tot AS (SELECT COUNT(*) AS n, SUM(n_chars) AS w FROM base)
SELECT CAST(threshold AS DOUBLE) AS threshold,
  CAST(COUNT(*) FILTER (WHERE score >= threshold) AS BIGINT) AS docs_kept,
  ROUND(COUNT(*) FILTER (WHERE score >= threshold) * 1.0
        / GREATEST((SELECT n FROM tot), 1), 4) AS doc_frac,
  CAST(COALESCE(SUM(n_chars) FILTER (WHERE score >= threshold), 0) AS DOUBLE)
      AS weight_kept,
  ROUND(COALESCE(SUM(n_chars) FILTER (WHERE score >= threshold), 0) * 1.0
        / (SELECT w FROM tot), 4) AS weight_frac
FROM t CROSS JOIN base
GROUP BY threshold
ORDER BY threshold"""

    return o
