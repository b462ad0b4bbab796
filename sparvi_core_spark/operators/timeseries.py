"""Time-series operators Spark lacks as builtins: as-of join,
gap-based sessionization, and a bucketed range (point-in-interval)
join.

The as-of join and sessionizer are single-shuffle window plans
(partition by key, order by time). The range join — where a window
plan cannot apply because matches are many-to-many — uses fixed-width
time-bucket blocking so Catalyst plans an equi-join instead of the
cartesian/broadcast-nested-loop plan it would otherwise pick for a
pure inequality predicate.

Determinism note: event-time arithmetic is done on integer microseconds
(``unix_micros``) so results are exact and portable across engines
(parquet nanosecond inputs truncate identically everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T


def event_micros(df: DataFrame, ts_col: str) -> Column:
    """Integer microseconds for a timestamp column, NTZ-safe.

    Parquet written with ``isAdjustedToUTC=false`` (e.g. plain
    pandas/pyarrow writers) reads back as ``TIMESTAMP_NTZ`` in Spark 4,
    which ``unix_micros`` rejects. For NTZ we compute epoch-style
    microseconds arithmetically from the wall-clock fields — no
    session-timezone interpretation, so the result is deterministic and
    matches how DuckDB (which reads the same parquet as wall-clock
    timestamps) orders and differences the values.
    """
    dt = df.schema[ts_col].dataType
    c = F.col(ts_col)
    if isinstance(dt, T.TimestampNTZType):
        return (
            F.unix_date(c.cast("date")) * F.lit(86_400_000_000)
            + (F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60)
            * F.lit(1_000_000)
            + (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
        )
    return F.unix_micros(c)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids per user.

    A new session starts when the time since the previous event of the
    same user exceeds ``gap_seconds``. One shuffle (by user), one
    window pass: ``session_seq`` is the running count of gap-breaks.
    Output = input + (session_seq bigint).

    At scale this is the standard shuffle-bounded sessionizer; for
    unbounded streams the stateful equivalent lives in
    ``streaming`` (``applyInPandasWithState``-style), where the state
    store holds one (last_ts, session_seq) pair per user.
    """
    us = event_micros(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | ((us - prev) > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: (user, session_seq, n_events, start/end µs,
    duration_seconds)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    us = event_micros(df, ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
        .withColumn(
            "duration_seconds",
            ((F.col("end_us") - F.col("start_us")) / 1_000_000.0),
        )
    )


def _floordiv_us(c: Column, width_us: int) -> Column:
    """Exact floor division for microsecond longs (negative-safe).

    ``c - pmod(c, w)`` is exactly divisible by ``w`` and stays below
    2^53, so the double division is exact; the cast back to long is
    therefore boundary-safe (no FP off-by-one at bucket edges).
    """
    w = F.lit(width_us)
    return ((c - F.pmod(c, w)) / w).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_seconds: int = 3600,
    key: str | None = None,
    how: str = "inner",
    max_interval_buckets: int = 10_000,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-interval join: each left row pairs with every right
    interval where ``right_start <= left_ts <= right_end`` (inclusive
    both ends; optional equi-``key`` must also match). Many-to-many: a
    left row inside k intervals yields k rows; ``how="left"`` keeps
    unmatched left rows with NULL right columns.

    Spark has no range-join optimization for a pure inequality
    predicate — Catalyst plans a broadcast-nested-loop or cartesian
    product, which is O(|L|·|R|) and unrunnable at scale. This uses
    the standard time-bucket blocking instead: every interval is
    exploded into the fixed-width buckets it overlaps, every left
    timestamp lands in exactly ONE bucket, and the join becomes a hash
    equi-join on (bucket[, key]) with the exact BETWEEN predicate as a
    post-filter. Each matching pair meets in exactly one bucket (the
    left row's), so no dedup pass is needed — including under
    ``how="left"``.

    Scale properties: the only shuffle is the equi-join's hash
    exchange; right-side fan-out is bounded by
    ceil(interval_len / bucket) + 1 per interval, runtime-guarded by
    ``max_interval_buckets`` (``raise_error`` inside the live bucket
    expression, so column pruning can't silently drop the check).
    Choose ``bucket_seconds`` near the typical interval length: wider
    buckets mean fewer right copies but more same-bucket candidates to
    post-filter. Intervals with ``start > end`` match nothing (SQL
    BETWEEN semantics) and are pruned before the explode.

    Oracle: a plain ``JOIN ... ON l.ts BETWEEN r.start AND r.end``
    (DuckDB plans its own IEJoin for this; we compare results, not
    plans). Reference anchor: sparvi-core has no range join — this is
    part of the training-data-pipeline extension surface (SURVEY.md
    §2.8).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w_us = bucket_seconds * 1_000_000
    lt = event_micros(left, left_ts)
    rs = event_micros(right, right_start)
    re = event_micros(right, right_end)

    rename = {
        c: c + suffix for c in right.columns if c in set(left.columns)
    }
    r = right.filter(rs <= re)
    startb = _floordiv_us(rs, w_us)
    endb = _floordiv_us(re, w_us)
    nb = endb - startb + F.lit(1)
    # the guard lives INSIDE the sequence bound so it can't be pruned
    guarded_end = F.when(
        nb > F.lit(max_interval_buckets),
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join: interval spans more than "
                    f"{max_interval_buckets} buckets of {bucket_seconds}s "
                    "(raise bucket_seconds or max_interval_buckets); "
                    "interval start µs = "
                ),
                rs.cast("string"),
            )
        ).cast("long"),
    ).otherwise(endb)
    r = r.select(
        *[F.col(c).alias(rename.get(c, c)) for c in right.columns],
        rs.alias("__rs"),
        re.alias("__re"),
        F.explode(F.sequence(startb, guarded_end)).alias("__bucket"),
    )
    l = left.withColumn("__bucket", _floordiv_us(lt, w_us)).withColumn(
        "__lt", lt
    )
    cond = (
        (l["__bucket"] == r["__bucket"])
        & (l["__lt"] >= r["__rs"])
        & (l["__lt"] <= r["__re"])
    )
    if key is not None:
        cond = cond & (l[key] == r[rename.get(key, key)])
    out = l.join(r, cond, how)
    keep = [l[c] for c in left.columns] + [
        r[rename.get(c, c)] for c in right.columns
        if not (key is not None and c == key)
    ]
    return out.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str = "start_ts",
    left_end: str = "end_ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_seconds: int = 3600,
    key: str | None = None,
    max_interval_buckets: int = 10_000,
    suffix: str = "_right",
) -> DataFrame:
    """Interval × interval overlap join (inner): pairs where
    ``left_start <= right_end AND right_start <= left_end`` (touching
    endpoints count as overlap, matching SQL's closed-interval
    BETWEEN-style semantics), optionally also requiring an equi-``key``.

    Blocking: BOTH sides explode into the fixed-width buckets they
    cover. Overlapping intervals both contain the intersection start
    ``greatest(left_start, right_start)``, so both carry a copy in that
    point's bucket — the join keeps a pair ONLY in that one bucket
    (``__bucket == floordiv(greatest(ls, rs))`` rides the join
    condition), so each overlapping pair appears exactly once with no
    dedup/distinct shuffle afterwards.

    Inner-only by design: the exploded left side means unmatched-left
    semantics would need a per-row identity to restore; compose
    left/semi/anti variants with your own id column
    (``left.join(pairs.select(id_col).distinct(), on=id_col,
    how="left_anti")``).

    Same scale contract as ``range_join``: one hash-equi-join shuffle,
    per-interval fan-out bounded by ``max_interval_buckets`` with the
    ``raise_error`` guard inside the live bucket expression.
    """
    w_us = bucket_seconds * 1_000_000

    def _explode_side(df: DataFrame, s_col: str, e_col: str,
                      out_names: dict[str, str], s_alias: str, e_alias: str):
        s_us = event_micros(df, s_col)
        e_us = event_micros(df, e_col)
        startb = _floordiv_us(s_us, w_us)
        endb = _floordiv_us(e_us, w_us)
        nb = endb - startb + F.lit(1)
        guarded_end = F.when(
            nb > F.lit(max_interval_buckets),
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_overlap_join: interval spans more than "
                        f"{max_interval_buckets} buckets of "
                        f"{bucket_seconds}s; interval start µs = "
                    ),
                    s_us.cast("string"),
                )
            ).cast("long"),
        ).otherwise(endb)
        return df.filter(s_us <= e_us).select(
            *[F.col(c).alias(out_names.get(c, c)) for c in df.columns],
            s_us.alias(s_alias),
            e_us.alias(e_alias),
            F.explode(F.sequence(startb, guarded_end)).alias("__bucket"),
        )

    rename = {c: c + suffix for c in right.columns if c in set(left.columns)}
    l = _explode_side(left, left_start, left_end, {}, "__ls", "__le")
    r = _explode_side(right, right_start, right_end, rename, "__rs", "__re")
    meet_bucket = _floordiv_us(F.greatest(l["__ls"], r["__rs"]), w_us)
    cond = (
        (l["__bucket"] == r["__bucket"])
        & (l["__bucket"] == meet_bucket)
        & (l["__ls"] <= r["__re"])
        & (r["__rs"] <= l["__le"])
    )
    if key is not None:
        cond = cond & (l[key] == r[rename.get(key, key)])
    out = l.join(r, cond, "inner")
    keep = [l[c] for c in left.columns] + [
        r[rename.get(c, c)] for c in right.columns
        if not (key is not None and c == key)
    ]
    return out.select(*keep)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row of
    the same key with ``right.ts <= left.ts`` (left join: no match →
    nulls).

    Plan: union the two sides tagged, one window over (key, time, tag)
    carrying the right payload forward with ``last(..., ignorenulls)``,
    filter back to left rows. Exactly ONE shuffle on the key — the
    scale-correct alternative to a range join (quadratic per key) or a
    groupBy-collect (unbounded per-key memory). Equal timestamps match
    (right sorts before left at ties). Among DUPLICATE right rows
    sharing the same (key, timestamp) the surviving payload is
    unspecified — the same contract as DuckDB's ASOF JOIN.

    The whole right payload travels as ONE struct: a struct whose
    fields are NULL is itself non-NULL, so a genuine NULL inside the
    matched right row is preserved instead of being backfilled from an
    older right row (which per-column ``last(ignorenulls)`` would do).

    DuckDB's native ``ASOF JOIN`` is the oracle for this operator.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    lcols = [c for c in left.columns]
    rrow_type = T.StructType(
        [
            T.StructField(c + suffix, right.schema[c].dataType)
            for c in right_payload
        ]
        + [T.StructField("matched_ts_us", T.LongType())]
    )
    l = left.select(
        F.col(key).alias("__k"),
        event_micros(left, left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        event_micros(right, right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(
            *[F.col(c).alias(c + suffix) for c in right_payload],
            event_micros(right, right_ts).alias("matched_ts_us"),
        ).alias("__rrow"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__is_left",
        "__lrow",
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__rrow"),
    )
    out = carried.filter(F.col("__is_left") == 1)
    return out.select(
        *[F.col("__lrow." + c).alias(c) for c in lcols],
        *[F.col("__rrow." + c + suffix).alias(c + suffix) for c in right_payload],
        F.col("__rrow.matched_ts_us").alias("matched_ts_us"),
    )
