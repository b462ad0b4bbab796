"""Time-series operators Spark lacks as builtins: as-of join and
gap-based sessionization.

Both are implemented as single-shuffle window plans (partition by key,
order by time) — NOT range joins, whose candidate space explodes
quadratically per key at scale.

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
