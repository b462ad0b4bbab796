"""As-of join and sessionization semantics on crafted data."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.timeseries import asof_join, session_stats, sessionize


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: events at 12:00, 12:10, 12:50 (gap>30min before last)
        (1, _ts(0)), (1, _ts(10)), (1, _ts(50)),
        # user 2: single event
        (2, _ts(5)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_gap_semantics(events):
    s = sessionize(events, gap_seconds=1800)
    got = {(r["user_id"], r["ts"].minute): r["session_seq"] for r in s.collect()}
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1  # same session
    assert got[(1, 50)] == 2                        # 40-min gap → new session
    assert got[(2, 5)] == 1


def test_session_stats(events):
    st = {(r["user_id"], r["session_seq"]): r for r in session_stats(events, gap_seconds=1800).collect()}
    assert st[(1, 1)]["n_events"] == 2
    assert st[(1, 1)]["duration_seconds"] == 600.0
    assert st[(1, 2)]["n_events"] == 1
    assert st[(2, 1)]["duration_seconds"] == 0.0


def test_asof_backward_with_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (2, _ts(10), "p3"), (3, _ts(10), "p4")],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), "c1"),
            (1, _ts(10), "c2"),   # tie with p1 → matches (<=)
            (1, _ts(15), "c3"),
            (2, _ts(30), "c4"),   # after p3 → no match
        ],
        "user_id long, ts timestamp, cid string",
    )
    out = asof_join(left, right, key="user_id", right_payload=["cid"])
    got = {r["pid"]: r["cid_right"] for r in out.collect()}
    assert got["p1"] == "c2"   # equal timestamp matches
    assert got["p2"] == "c3"   # latest prior
    assert got["p3"] is None   # only future clicks
    assert got["p4"] is None   # key never in right
    assert out.count() == 4    # left join preserves all left rows


def test_asof_null_payload_not_backfilled(spark):
    """A genuine NULL in the matched right row must survive — not be
    stitched from an older right row (per-column last(ignorenulls)
    would do that; the struct carry must not)."""
    left = spark.createDataFrame(
        [(1, _ts(20), "p1"), (1, _ts(40), "p2")],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), "c1", 100),
            (1, _ts(15), None, 200),  # matched for p1: cid is genuinely NULL
            (1, _ts(30), "c3", None), # matched for p2: amount is genuinely NULL
        ],
        "user_id long, ts timestamp, cid string, amount long",
    )
    out = asof_join(left, right, key="user_id", right_payload=["cid", "amount"])
    got = {r["pid"]: (r["cid_right"], r["amount_right"]) for r in out.collect()}
    assert got["p1"] == (None, 200)  # NOT ("c1", 200)
    assert got["p2"] == ("c3", None)  # NOT ("c3", 200)


def test_asof_null_payload_matches_duckdb_asof(spark):
    """Same NULL-payload scenario directly against DuckDB's native
    ASOF LEFT JOIN — the operator's declared oracle."""
    import duckdb

    left = spark.createDataFrame(
        [(1, _ts(20), "p1"), (1, _ts(40), "p2"), (2, _ts(10), "p3")],
        "k long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), "c1", 100),
            (1, _ts(15), None, 200),
            (1, _ts(30), "c3", None),
        ],
        "k long, ts timestamp, cid string, amount long",
    )
    got = {
        r["pid"]: (r["cid_right"], r["amount_right"])
        for r in asof_join(left, right, key="k", right_payload=["cid", "amount"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 12:20:00', 'p1'),"
        "(1, TIMESTAMP '2024-01-01 12:40:00', 'p2'),"
        "(2, TIMESTAMP '2024-01-01 12:10:00', 'p3')) t(k, ts, pid)"
    )
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 12:05:00', 'c1', 100),"
        "(1, TIMESTAMP '2024-01-01 12:15:00', NULL, 200),"
        "(1, TIMESTAMP '2024-01-01 12:30:00', 'c3', NULL)) t(k, ts, cid, amount)"
    )
    oracle = {
        pid: (cid, amount)
        for pid, cid, amount in con.execute(
            "SELECT l.pid, r.cid, r.amount FROM l "
            "ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == oracle == {
        "p1": (None, 200), "p2": ("c3", None), "p3": (None, None)
    }


def test_asof_randomized_vs_bruteforce(spark):
    """Seeded randomized check against a brute-force reference: 300
    left rows x 200 right rows over 8 keys with equal-timestamp ties
    and ~25% NULL payload fields. Ties among right rows at the same
    (key, ts) are avoided by construction (the survivor is unspecified
    there, matching DuckDB)."""
    import random

    rnd = random.Random(1234)
    lrows = [
        (rnd.randrange(8), _ts(rnd.randrange(60), rnd.randrange(60)), f"p{i}")
        for i in range(300)
    ]
    seen = set()
    rrows = []
    for i in range(200):
        k, ts = rnd.randrange(8), _ts(rnd.randrange(60), rnd.randrange(60))
        if (k, ts) in seen:  # keep right (key, ts) unique
            continue
        seen.add((k, ts))
        rrows.append(
            (k, ts,
             None if rnd.random() < 0.25 else f"c{i}",
             None if rnd.random() < 0.25 else i * 10)
        )
    left = spark.createDataFrame(lrows, "k long, ts timestamp, pid string")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, cid string, amount long")
    got = {
        r["pid"]: (r["cid_right"], r["amount_right"])
        for r in asof_join(left, right, key="k", right_payload=["cid", "amount"]).collect()
    }
    by_key: dict[int, list] = {}
    for k, ts, cid, amount in rrows:
        by_key.setdefault(k, []).append((ts, cid, amount))
    for rows in by_key.values():
        rows.sort(key=lambda r: r[0])
    expected = {}
    for k, ts, pid in lrows:
        match = (None, None)
        for rts, cid, amount in by_key.get(k, []):
            if rts <= ts:
                match = (cid, amount)  # latest-so-far wins
            else:
                break
        expected[pid] = match
    assert got == expected


def test_sessionize_randomized_vs_bruteforce(spark):
    """Seeded randomized check: 500 events over 6 users vs a per-user
    sorted scan applying the same gap rule."""
    import random

    rnd = random.Random(99)
    rows = [
        (rnd.randrange(6), _ts(rnd.randrange(60), rnd.randrange(60), rnd.randrange(1000) * 1000))
        for _ in range(500)
    ]
    rows = list(dict.fromkeys(rows))  # unique (user, ts): lag-order is
    # unspecified among exact-duplicate events
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    gap = 120
    got = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(df, gap_seconds=gap).collect()
    }
    by_user: dict[int, list] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    expected = {}
    for u, tss in by_user.items():
        tss.sort()
        seq, last = 0, None
        for ts in tss:
            if last is None or (ts - last).total_seconds() > gap:
                seq += 1
            expected[(u, ts)] = seq
            last = ts
    assert got == expected


def test_asof_one_shuffle_plan(spark):
    left = spark.createDataFrame([(1, _ts(1), "x")], "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame([(1, _ts(0), "y")], "user_id long, ts timestamp, cid string")
    plan = asof_join(left, right, key="user_id")._jdf.queryExecution().optimizedPlan().toString()
    # no Join node at all: union + window
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# range_join (bucketed point-in-interval)
# ---------------------------------------------------------------------------

from sparvi_core_spark.operators.timeseries import range_join  # noqa: E402


@pytest.fixture(scope="module")
def windows(spark):
    # w1: 12:05-12:15 (inside one bucket at 3600s, straddles at 600s)
    # w2: 12:10-13:30 (longer than a 3600s bucket; crosses its boundary)
    # w3: 12:00-12:00 (degenerate point interval)
    # w4: 14:00-13:00 (invalid: start > end, must match nothing)
    rows = [
        ("w1", _ts(5), _ts(15)),
        ("w2", dt.datetime(2024, 1, 1, 12, 10), dt.datetime(2024, 1, 1, 13, 30)),
        ("w3", _ts(0), _ts(0)),
        ("w4", dt.datetime(2024, 1, 1, 14, 0), dt.datetime(2024, 1, 1, 13, 0)),
    ]
    return spark.createDataFrame(rows, "wid string, start_ts timestamp, end_ts timestamp")


@pytest.mark.parametrize("bucket_seconds", [600, 3600, 86400])
def test_range_join_inclusive_many_to_many(spark, events, windows, bucket_seconds):
    """Same pairs at every bucket width: blocking is a plan choice, not
    a semantics choice. Bounds inclusive; overlapping windows both match;
    invalid interval matches nothing; each pair appears exactly once."""
    out = range_join(events, windows, "ts", "start_ts", "end_ts",
                     bucket_seconds=bucket_seconds)
    got = sorted((r["user_id"], r["ts"].minute, r["wid"]) for r in out.collect())
    assert got == [
        (1, 0, "w3"),     # 12:00 == w3 point interval (inclusive both ends)
        (1, 10, "w1"),    # 12:10 in w1
        (1, 10, "w2"),    # ... and in w2 (many-to-many)
        (1, 50, "w2"),    # 12:50 in w2 only
        (2, 5, "w1"),     # 12:05 == w1 start (inclusive)
    ]


def test_range_join_left_keeps_unmatched(spark, events, windows):
    out = range_join(events, windows, bucket_seconds=600, how="left")
    rows = out.collect()
    # the 5 matches above, plus nothing lost: every left row present
    assert len(rows) == 5  # all 4 events match at least one window? no:
    # (1,0)->w3, (1,10)->w1+w2, (1,50)->w2, (2,5)->w1 — all matched, 5 rows
    unmatched_probe = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1, 23, 0))], "user_id long, ts timestamp"
    )
    out2 = range_join(unmatched_probe, windows, bucket_seconds=600, how="left")
    r = out2.collect()
    assert len(r) == 1 and r[0]["wid"] is None


def test_range_join_equi_key(spark, windows):
    left = spark.createDataFrame(
        [(1, "w1", _ts(10)), (2, "w2", _ts(10)), (3, "w9", _ts(10))],
        "id long, wid string, ts timestamp",
    )
    out = range_join(left, windows, key="wid", bucket_seconds=600)
    got = sorted((r["id"], r["wid"]) for r in out.collect())
    # key must match AND point must be inside that key's interval
    assert got == [(1, "w1"), (2, "w2")]
    # right's colliding key column is dropped, not duplicated
    assert out.columns.count("wid") == 1


def test_range_join_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(77)
    base = dt.datetime(2024, 3, 1)
    pts = [(i, base + dt.timedelta(seconds=rng.randrange(0, 200_000)))
           for i in range(120)]
    ivs = []
    for j in range(40):
        s = rng.randrange(0, 200_000)
        e = s + rng.randrange(0, 30_000)  # up to ~8h, bucket=1h → multi-bucket
        ivs.append((j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=e)))
    L = spark.createDataFrame(pts, "pid long, ts timestamp")
    R = spark.createDataFrame(ivs, "iid long, start_ts timestamp, end_ts timestamp")
    got = sorted((r["pid"], r["iid"]) for r in
                 range_join(L, R, bucket_seconds=3600).collect())
    want = sorted(
        (p, i) for p, t in pts for i, s, e in ivs if s <= t <= e
    )
    assert got == want and len(got) > 50


def test_range_join_guard_raises(spark, events):
    huge = spark.createDataFrame(
        [("h", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3))],
        "wid string, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="spans more than"):
        range_join(events, huge, bucket_seconds=60, max_interval_buckets=100).collect()


def test_range_join_plan_is_equi_join(spark, events, windows):
    plan = range_join(events, windows, bucket_seconds=3600)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# interval_overlap_join (interval × interval, bucketed)
# ---------------------------------------------------------------------------

from sparvi_core_spark.operators.timeseries import interval_overlap_join  # noqa: E402


@pytest.mark.parametrize("bucket_seconds", [600, 3600, 86400])
def test_overlap_join_semantics_bucket_invariant(spark, bucket_seconds):
    H = dt.datetime(2024, 1, 1, 12, 0)

    def m(minutes):
        return H + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [("a", m(0), m(30)),     # overlaps x (touching end), y (nested)
         ("b", m(45), m(400)),   # long: crosses many 600s buckets; overlaps z
         ("c", m(31), m(40))],   # disjoint from everything but y? y=[10,20] no; z=[300,360]? no → only vs x? x=[30,50]: c=[31,40] overlaps x
        "lid string, start_ts timestamp, end_ts timestamp",
    )
    right = spark.createDataFrame(
        [("x", m(30), m(50)),    # touches a at minute 30 (inclusive)
         ("y", m(10), m(20)),    # nested inside a
         ("z", m(300), m(360))], # inside b
        "rid string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_overlap_join(left, right, bucket_seconds=bucket_seconds)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [("a", "x"), ("a", "y"), ("b", "x"), ("b", "z"), ("c", "x")]


def test_overlap_join_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(31)
    base = dt.datetime(2024, 5, 1)

    def mk(n):
        rows = []
        for i in range(n):
            s = rng.randrange(0, 150_000)
            e = s + rng.randrange(0, 20_000)
            rows.append((i, base + dt.timedelta(seconds=s),
                         base + dt.timedelta(seconds=e)))
        return rows

    lrows, rrows = mk(60), mk(60)
    L = spark.createDataFrame(lrows, "lid long, start_ts timestamp, end_ts timestamp")
    R = spark.createDataFrame(rrows, "rid long, start_ts timestamp, end_ts timestamp")
    got = sorted((r["lid"], r["rid"]) for r in
                 interval_overlap_join(L, R, bucket_seconds=3600).collect())
    want = sorted(
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls <= re and rs <= le
    )
    assert got == want and len(got) > 30
    # exactly-once: no pair duplicated despite multi-bucket intervals
    assert len(got) == len(set(got))


def test_overlap_join_equi_key_and_plan(spark):
    H = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [(1, "u", H, H + dt.timedelta(hours=2)),
         (2, "v", H, H + dt.timedelta(hours=2))],
        "lid long, k string, start_ts timestamp, end_ts timestamp",
    )
    R = spark.createDataFrame(
        [(10, "u", H + dt.timedelta(hours=1), H + dt.timedelta(hours=3))],
        "rid long, k string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_overlap_join(L, R, key="k", bucket_seconds=3600)
    rows = out.collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 10)]
    assert out.columns.count("k") == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_overlap_join_guard_raises(spark):
    H = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [(1, H, H + dt.timedelta(days=30))],
        "lid long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_overlap_join(L, L.select(
            F.col("lid").alias("rid"), "start_ts", "end_ts"
        ), bucket_seconds=60, max_interval_buckets=1000).collect()


def test_sessionize_matches_builtin_session_window(spark):
    """Cross-engine pin: the custom gap sessionizer must agree with
    Spark's own F.session_window on real event data (session counts and
    sizes per user). Boundary semantics differ only when a gap is
    EXACTLY gap_seconds (we keep, session_window splits); real
    microsecond timestamps never land there."""
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 50)
    )
    ours = (
        session_stats(events, gap_seconds=1800)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.sum("n_events").alias("n_events"))
    )
    builtin = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.sum("cnt").alias("n_events"))
    )
    a = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in ours.collect()}
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in builtin.collect()}
    assert a == b and len(a) > 10
