"""URL parsing + per-host caps: DuckDB regex parity and plan equality."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.functions.web import (
    _HOST_FROM_REST_RE,
    _PATH_FROM_REST_RE,
    _PREFIX_RE,
    _QUERY_RE,
    _SCHEME_RE,
    cap_per_group,
    cap_per_host,
    host_stats,
    registered_domain,
    url_host,
    with_url_parts,
)

URLS = [
    (1, "https://www.example.com/a/b?q=1#frag"),
    (2, "http://sub.domain.co.uk:8080/path"),
    (3, "ftp://user:pw@files.example.org/pub"),
    (4, "https://example.com"),
    (5, "//cdn.example.net/asset.js"),
    (6, "example.com/bare/path"),
    (7, "https://HOST.Example.COM/UPPER"),
    (8, "not a url at all"),
    (9, "https://api.example.com.au/v1?x=2&y=3"),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, ["doc_id", "url"])


def test_url_parts_match_duckdb_regex(urls_df):
    got = with_url_parts(urls_df).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("u", pd.DataFrame(URLS, columns=["doc_id", "url"]))
    want = con.execute(
        f"""
        WITH r AS (
          SELECT doc_id, url,
                 regexp_replace(url, '{_PREFIX_RE}', '') AS rest
          FROM u
        )
        SELECT doc_id,
               lower(coalesce(regexp_extract(url, '{_SCHEME_RE}', 1), '')) AS scheme,
               lower(coalesce(regexp_extract(rest, '{_HOST_FROM_REST_RE}', 1), '')) AS host,
               coalesce(regexp_extract(rest, '{_PATH_FROM_REST_RE}', 1), '') AS path,
               coalesce(regexp_extract(url, '{_QUERY_RE}', 1), '') AS query
        FROM r ORDER BY doc_id
        """
    ).df()
    for c in ("scheme", "host", "path", "query"):
        assert got[c].tolist() == want[c].tolist(), c


def test_url_parts_values(urls_df):
    got = with_url_parts(urls_df).toPandas().set_index("doc_id")
    assert got.loc[1, "host"] == "www.example.com"
    assert got.loc[1, "path"] == "/a/b"
    assert got.loc[1, "query"] == "q=1"
    assert got.loc[2, "host"] == "sub.domain.co.uk"  # port stripped
    assert got.loc[3, "host"] == "files.example.org"  # userinfo stripped
    assert got.loc[4, "path"] == ""
    assert got.loc[5, "host"] == "cdn.example.net"  # scheme-relative
    assert got.loc[6, "host"] == "example.com"  # bare
    assert got.loc[7, "host"] == "host.example.com"  # lowercased


def test_registered_domain(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("sub.domain.co.uk", "domain.co.uk"),
        ("api.example.com.au", "example.com.au"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("a.b.c.d.org", "d.org"),
    ]
    df = spark.createDataFrame(cases, ["host", "want"])
    out = df.select(
        registered_domain(F.col("host")).alias("got"), "want"
    ).collect()
    for r in out:
        assert r.got == r.want, r


def test_host_stats(urls_df):
    out = host_stats(urls_df).toPandas()
    assert out["n_docs"].sum() == len(URLS)
    assert out.iloc[0]["n_docs"] >= out.iloc[-1]["n_docs"]
    dom = host_stats(urls_df, by_domain=True).toPandas()
    assert "domain" in dom.columns


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one megahost (600 docs), several small hosts
    rows = [(i, f"https://big.example.com/p{i}") for i in range(600)]
    rows += [(1000 + i, f"https://tiny{i % 7}.org/x") for i in range(70)]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_two_phase_equals_single_window(skewed_df):
    df = skewed_df.withColumn("host", url_host("url"))
    fast = cap_per_group(df, "host", 50, order="hash", plan="bucketed").toPandas()
    slow = cap_per_group(df, "host", 50, order="hash", plan="window").toPandas()
    assert sorted(fast["doc_id"]) == sorted(slow["doc_id"])
    per_host = fast.groupby("host").size()
    assert per_host.max() <= 50
    assert per_host["tiny0.org"] == 10  # uncapped host untouched


def test_cap_per_group_id_order_matches_qualify_oracle(skewed_df, spark):
    df = skewed_df.withColumn("host", url_host("url"))
    got = sorted(
        cap_per_group(df, "host", 25, order="id").toPandas()["doc_id"]
    )
    con = duckdb.connect()
    con.register("t", df.select("doc_id", "host").toPandas())
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM t QUALIFY row_number() OVER "
            "(PARTITION BY host ORDER BY doc_id) <= 25"
        ).fetchall()
    )
    assert got == want


def test_cap_per_group_quality_order(spark):
    rows = [("h", i, float(i % 10)) for i in range(40)]
    df = spark.createDataFrame(rows, ["host", "doc_id", "score"])
    out = cap_per_group(
        df, "host", 8, order="quality", order_col="score"
    ).toPandas()
    assert len(out) == 8
    assert out["score"].min() >= 8.0  # the 8 best scores are 8s and 9s


def test_cap_per_host_end_to_end(skewed_df):
    out = cap_per_host(skewed_df, 30).toPandas()
    assert "url" in out.columns and "__cap_key" not in out.columns
    big = out[out["url"].str.contains("big.example")]
    assert len(big) == 30
    assert len(out) == 30 + 70


def test_cap_determinism_and_salt(skewed_df):
    a = sorted(cap_per_host(skewed_df, 30).toPandas()["doc_id"])
    b = sorted(cap_per_host(skewed_df, 30).toPandas()["doc_id"])
    c = sorted(cap_per_host(skewed_df, 30, salt="other").toPandas()["doc_id"])
    assert a == b  # deterministic
    assert a != c  # salt changes the kept subset


def test_bucketed_plan_shape(spark, skewed_df):
    """The spill-regime plan must broadcast its tiny per-group tables
    (no SortMergeJoin shuffling the corpus) and return the input
    untouched when no group exceeds the cap."""
    df = skewed_df.withColumn("host", url_host("url"))
    out = cap_per_group(df, "host", 50, order="hash", plan="bucketed")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan

    # cap above every host's count → input passes through unchanged
    nocap = cap_per_group(df, "host", 10_000, order="hash", plan="bucketed")
    assert nocap is df


def test_plan_validation(spark, skewed_df):
    df = skewed_df.withColumn("host", url_host("url"))
    with pytest.raises(ValueError, match="plan"):
        cap_per_group(df, "host", 5, plan="nope")
    with pytest.raises(ValueError, match="hash"):
        cap_per_group(df, "host", 5, order="id", plan="bucketed")


def test_host_blocklist_subdomain_semantics(spark):
    from sparvi_core_spark.functions.web import (
        filter_blocked_hosts,
        host_suffixes,
    )

    docs = spark.createDataFrame(
        [
            (1, "https://ads.example.com/banner"),
            (2, "https://example.com/page"),
            (3, "https://notexample.com/fine"),       # substring ≠ match
            (4, "https://sub.deep.tracker.net/x"),
            (5, "https://safe.org/a"),
            (6, None),                                 # NULL → kept
            (7, "https://EXAMPLE.com/CaseFold"),       # case-insensitive
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("tracker.net",)], ["host"]
    )
    kept, blocked = filter_blocked_hosts(docs, bl)
    assert {r["doc_id"] for r in blocked.collect()} == {1, 2, 4, 7}
    assert {r["doc_id"] for r in kept.collect()} == {3, 5, 6}
    assert kept.columns == docs.columns

    chain = docs.filter("doc_id = 4").select(
        host_suffixes(F.lit("sub.deep.tracker.net")).alias("s")
    ).first()["s"]
    assert chain == [
        "sub.deep.tracker.net", "deep.tracker.net", "tracker.net", "net",
    ]


def test_host_blocklist_duckdb_oracle(spark):
    """Dialect-independent re-derivation of the blocked set: DuckDB
    generates the same suffix chains and joins the same blocklist."""
    from sparvi_core_spark.functions.web import filter_blocked_hosts

    rows = [
        (i, f"https://h{i % 7}.d{i % 3}.example{i % 5}.com/p/{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    bl_rows = [("example0.com",), ("d1.example2.com",), ("h3.d0.example3.com",)]
    bl = spark.createDataFrame(bl_rows, ["host"])
    _, blocked = filter_blocked_hosts(docs, bl)
    got = {r["doc_id"] for r in blocked.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{u}')" for i, u in rows)
        + ") v(doc_id, url)"
    )
    con.execute(
        "CREATE TABLE bl AS SELECT * FROM (VALUES "
        + ",".join(f"('{h}')" for h, in bl_rows)
        + ") v(host)"
    )
    want = {
        r[0]
        for r in con.execute(
            """
            WITH hosts AS (
              SELECT doc_id,
                     regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS h
              FROM docs),
            suff AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, len(string_split(h, '.')) + 1),
                       i -> array_to_string(string_split(h, '.')[i:], '.')
                     )) AS s
              FROM hosts)
            SELECT DISTINCT doc_id FROM suff JOIN bl ON s = host
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_host_blocklist_plan_broadcasts(spark):
    from sparvi_core_spark.functions.web import filter_blocked_hosts

    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("example.com",)], ["host"])
    kept, _ = filter_blocked_hosts(docs, bl)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # The blocklist side must ride a broadcast hash join, never a
    # shuffle join: lists are MBs, the corpus is TBs. The id join-back
    # MAY plan as SMJ (the blocked-id set is corpus-driven, so that is
    # the honest static plan; AQE converts it to broadcast at runtime
    # when the blocked set turns out small).
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "__blocked_host" not in line, line


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

from sparvi_core_spark.functions.web import (  # noqa: E402
    TRACKING_PARAMS,
    canonicalize_url,
    dedup_by_url,
)


def _py_canon(url, strip_www=False, keep=None):
    """Independent Python twin of canonicalize_url (stdlib re only)."""
    import re as _re

    if url is None:
        return None
    u = url.strip()
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", u)
    if not m:
        return u
    scheme = m.group(1).lower()
    rest = _re.sub(r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//", "", u)
    m2 = _re.match(r"^(?:[^/?#@]*@)?([^/?#\s]+)", rest)
    hostport = m2.group(1) if m2 else ""
    mp = _re.search(r":(\d+)$", hostport)
    port = mp.group(1) if mp else ""
    host = _re.sub(r":(\d+)$", "", hostport).lower()
    if strip_www:
        host = _re.sub(r"^www\.", "", host)
    default = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}.get(scheme, "")
    port_part = "" if port in ("", default) else ":" + port
    mpath = _re.match(r"^[^/?#]*(/[^?#]*)", rest)
    path = mpath.group(1) if mpath else ""
    if path == "":
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    mq = _re.match(r"^[^#?]*\?([^#]*)", u)
    q = mq.group(1) if mq else ""
    params = [p for p in q.split("&") if p != ""]

    def key(p):
        return p.split("=", 1)[0].lower()

    if keep is not None:
        allowed = {k.lower() for k in keep}
        params = [p for p in params if key(p) in allowed]
    else:
        params = [
            p
            for p in params
            if not key(p).startswith("utm_") and key(p) not in TRACKING_PARAMS
        ]
    params.sort()
    qp = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port_part}{path}{qp}"


CANON_CASES = [
    # (input, expected default-mode canonical)
    ("HTTPS://Example.COM:443/path/?utm_source=x&b=2&a=1#frag",
     "https://example.com/path?a=1&b=2"),
    ("https://example.com/path?a=1&b=2", "https://example.com/path?a=1&b=2"),
    ("http://User:pw@WWW.Example.com:8080//weird/",
     "http://www.example.com:8080//weird"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/?gclid=abc&UTM_Campaign=z", "https://example.com/"),
    ("   https://example.com/a/b/   ", "https://example.com/a/b"),
    ("not a url", "not a url"),
    ("//cdn.example.net/asset.js", "//cdn.example.net/asset.js"),
    ("ftp://files.example.com:21/pub/", "ftp://files.example.com/pub"),
    ("https://example.com/p?x=B&x=A&fbclid=1", "https://example.com/p?x=A&x=B"),
    ("https://example.com:8443/s?flag", "https://example.com:8443/s?flag"),
    ("https:///odd/path", "https:///odd/path"),
    ("wss://Hub.example.com:443/socket", "wss://hub.example.com/socket"),
    # a '?' only inside the fragment is NOT a query (fragment dropped whole)
    ("https://h.example.com/p#a?b=c", "https://h.example.com/p"),
]


def test_canonicalize_hand_checked(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (_, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"case {i}"


def test_canonicalize_matches_python_twin(spark):
    urls = [u for u, _ in CANON_CASES]
    # widen with generated variants: case, ports, params, fragments
    for i in range(60):
        scheme = ["http", "https", "HTTPS", "ftp"][i % 4]
        host = ["Example.com", "www.SITE.org", "a.b.co.uk", "x.io"][i % 4]
        port = ["", ":80", ":443", ":8080"][(i // 4) % 4]
        path = ["", "/", "/a/b/", "/a%20b", "/trail/"][i % 5]
        q = ["", "?utm_source=s&z=1&a=2", "?b=2&a=1&gclid=g", "?only=utm_x"][
            (i // 5) % 4
        ]
        frag = ["", "#sec"][i % 2]
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    urls += [None, "", "   ", "mailto:a@b.c", "http://"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    for kw in ({}, {"strip_www": True}, {"keep_params": ["a", "only"]}):
        got = {
            r["i"]: r["c"]
            for r in df.select(
                "i", canonicalize_url("url", **kw).alias("c")
            ).collect()
        }
        py_kw = {"strip_www": kw.get("strip_www", False), "keep": kw.get("keep_params")}
        for i, u in enumerate(urls):
            assert got[i] == _py_canon(u, **py_kw), f"{kw} on {u!r}"


def test_canonicalize_idempotent(spark):
    """Canonical output re-canonicalizes to itself (fixed point)."""
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    two = df.select(
        canonicalize_url("url").alias("c1")
    ).select(
        "c1", canonicalize_url("c1").alias("c2")
    )
    assert two.filter(F.col("c1") != F.col("c2")).count() == 0


def test_canonicalize_plan_map_only(spark):
    df = spark.createDataFrame([(1, "https://a.b/c")], ["doc_id", "url"])
    plan = df.select(
        canonicalize_url("url").alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_by_url_contract(spark):
    rows = [
        (1, "https://example.com/a?utm_source=x", "2024-01-02"),
        (2, "HTTPS://EXAMPLE.COM/a", "2024-01-01"),
        (3, "https://www.example.com/a/", "2024-01-03"),
        (4, "https://example.com/b", "2024-01-01"),
        (5, "oops", "2024-01-01"),
        (6, "oops2", "2024-01-01"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "fetched"])
    # earliest-fetch-wins: quality order on an inverted timestamp
    inv = df.withColumn(
        "neg_fetch", -F.unix_timestamp("fetched", "yyyy-MM-dd")
    )
    kept = dedup_by_url(inv, order="quality", order_col="neg_fetch")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1,2,3 collide (strip_www default ON) -> earliest fetch = 2;
    # garbage rows stay distinct
    assert ids == [2, 4, 5, 6]
    # hash order: deterministic across runs
    a = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    b = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert a == b and len(a) == 4


def test_dedup_by_url_null_urls_stay_distinct(spark):
    """NULL urls never collapse into one group — each gets a per-row
    unique fallback key, so all NULL-url rows survive."""
    rows = [(1, None), (2, None), (3, "https://example.com/x"),
            (4, "https://example.com/x")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    ids = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert 1 in ids and 2 in ids          # both NULL rows kept
    assert len([i for i in ids if i in (3, 4)]) == 1  # real dup collapsed


def test_canonicalize_fuzz_batch(spark):
    """Seeded adversarial fuzz: random compositions of URL fragments
    (unicode hosts, empty segments, repeated separators, %-escapes,
    nested ?/#) must match the stdlib twin AND be idempotent — one
    Spark job over the whole batch."""
    import random

    rng = random.Random(20260815)
    schemes = ["http", "HTTPS", "ftp", "wss", "x+y.z-1", ""]
    hosts = ["Ex.COM", "ünï.example", "a..b", "[::1]", "x", ""]
    ports = ["", ":0", ":80", ":443", ":65535", ":badport"]
    paths = ["", "/", "//", "/a//b/", "/%2Fa", "/?", "/#", "/a b"]
    queries = ["", "?", "?&&", "?a", "?a=&b", "?A=1&a=2&utm_x=9",
               "?gclid=##", "?=v", "?a=b=c&fbclid"]
    frags = ["", "#", "#f", "#a?b=c"]
    urls = []
    for _ in range(250):
        s = rng.choice(schemes)
        pre = f"{s}://" if s else rng.choice(["", "//"])
        urls.append(
            pre + rng.choice(hosts) + rng.choice(ports) + rng.choice(paths)
            + rng.choice(queries) + rng.choice(frags)
        )
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: (r["c1"], r["c2"])
        for r in df.select(
            "i", canonicalize_url("url").alias("c1")
        ).select(
            "i", "c1", canonicalize_url("c1").alias("c2")
        ).collect()
    }
    for i, u in enumerate(urls):
        c1, c2 = got[i]
        assert c1 == _py_canon(u), f"twin mismatch on {u!r}"
        assert c2 == c1, f"not idempotent on {u!r} -> {c1!r} -> {c2!r}"


# ---------------------------------------------------------------------------
# host quality rollup
# ---------------------------------------------------------------------------

from sparvi_core_spark.functions.web import host_quality_stats  # noqa: E402


def test_host_quality_stats_hand_checked(spark):
    rows = [
        # host a: 4 docs, 2 pass_a, 1 NULL (counts as fail), toks 10 each
        (1, "https://a.com/1", True, 10),
        (2, "https://a.com/2", True, 10),
        (3, "https://a.com/3", False, 10),
        (4, "https://a.com/4", None, 10),
        # host b: 2 docs, both pass
        (5, "https://b.org/1", True, 7),
        (6, "https://b.org/2", True, 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ok boolean, toks long")
    out = {
        r["host"]: r
        for r in host_quality_stats(df, ["ok"], tokens_col="toks").collect()
    }
    assert out["a.com"]["n_docs"] == 4
    assert out["a.com"]["ok_frac"] == 0.5
    assert out["a.com"]["n_tokens"] == 40
    assert out["b.org"]["ok_frac"] == 1.0
    with pytest.raises(ValueError):
        host_quality_stats(df, [])


def test_host_quality_stats_by_domain_and_gates(spark, views):
    """End-to-end with a real gate: per-domain Gopher pass rates over
    planted URLs on the organic corpus."""
    from sparvi_core_spark.functions.text import gopher_quality_flags

    docs = spark.table("documents").limit(200)
    with_url = docs.withColumn(
        "url",
        F.concat(F.lit("https://sub"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".site"), (F.col("doc_id") % 4).cast("string"),
                 F.lit(".co.uk/p/"), F.col("doc_id").cast("string")),
    )
    gates = gopher_quality_flags(docs, min_required_words=0).select(
        F.col("id").alias("doc_id"), "passes_gopher"
    )
    joined = with_url.join(gates, "doc_id")
    out = host_quality_stats(joined, ["passes_gopher"], by_domain=True)
    rows = out.collect()
    # registered-domain heuristic folds sub0..2 into 4 co.uk domains
    assert {r["domain"] for r in rows} == {
        f"site{i}.co.uk" for i in range(4)
    }
    assert sum(r["n_docs"] for r in rows) == 200
    for r in rows:
        assert 0.0 <= r["passes_gopher_frac"] <= 1.0


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309)
# ---------------------------------------------------------------------------

ROBOTS_A = """
# group for everyone
User-agent: *
Disallow: /private/
Allow: /private/ok.html

User-agent: GoodBot
User-agent: NiceBot
Disallow: /good-only/
Allow: /good-only/*.css
Disallow: /ends$
Sitemap: https://a.example/sitemap.xml
Crawl-delay: 10
Disallow:
"""


def _rules(spark):
    from sparvi_core_spark.functions.web import parse_robots_txt

    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("empty.example", ""), ("x.example", None)],
        "host string, robots_txt string",
    )
    return parse_robots_txt(df)


def test_parse_robots_groups_and_edges(spark):
    rows = {
        (r["host"], r["agent"], r["allow"], r["pattern"])
        for r in _rules(spark).collect()
    }
    assert ("a.example", "*", False, "/private/") in rows
    assert ("a.example", "*", True, "/private/ok.html") in rows
    # both agents of the second group carry each rule
    assert ("a.example", "goodbot", False, "/good-only/") in rows
    assert ("a.example", "nicebot", False, "/good-only/") in rows
    assert ("a.example", "goodbot", True, "/good-only/*.css") in rows
    # empty Disallow emits nothing; Sitemap/Crawl-delay skipped;
    # empty/None bodies parse to zero rules
    assert not any(p == "" for *_xs, p in rows)
    assert not any(h in ("empty.example", "x.example") for h, *_ in rows)


def test_robots_allowed_rfc_semantics(spark):
    from sparvi_core_spark.functions.web import robots_allowed

    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            (1, "https://a.example/public/page.html"),   # no rule -> ok
            (2, "https://a.example/private/x"),           # disallow
            (3, "https://a.example/private/ok.html"),     # longer allow wins
            (4, "https://noidx.example/anything"),        # no robots -> ok
            (5, "https://a.example/ends"),                # $-anchored
            (6, "https://a.example/ends-not"),            # past anchor -> ok
        ],
        "id long, url string",
    )
    star = {
        r["id"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="*").collect()
    }
    assert star == {1: True, 2: False, 3: True, 4: True, 5: True, 6: True}

    good = {
        r["id"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="GoodBot/1.2").collect()
    }
    # a specific group EXCLUDES the * group: /private/ is fine for
    # GoodBot, /ends is $-anchored-disallowed, /ends-not escapes it
    assert good[2] is True and good[5] is False and good[6] is True
    g2 = {
        r["id"]: r["allowed"]
        for r in robots_allowed(
            spark.createDataFrame(
                [(7, "https://a.example/good-only/site.css"),
                 (8, "https://a.example/good-only/page.html")],
                "id long, url string",
            ),
            rules, agent="nicebot",
        ).collect()
    }
    assert g2 == {7: True, 8: False}  # wildcard allow beats shorter disallow


def test_robots_longest_match_twin_randomized(spark):
    """Randomized parity against a 12-line Python twin of the RFC
    longest-match rule (allow wins ties; no match = allowed)."""
    import random
    import re

    from sparvi_core_spark.functions.web import robots_allowed

    rnd = random.Random(13)
    segs = ["a", "b", "c", "dd", "e1"]
    pats, rows = [], []
    for _ in range(25):
        depth = rnd.randint(1, 3)
        p = "/" + "/".join(rnd.choice(segs) for _ in range(depth))
        if rnd.random() < 0.3:
            p += "*"
        elif rnd.random() < 0.2:
            p += "$"
        pats.append((rnd.random() < 0.5, p))
    rules = spark.createDataFrame(
        [("h.example", "*", a, p) for a, p in pats],
        "host string, agent string, allow boolean, pattern string",
    )
    for i in range(120):
        depth = rnd.randint(1, 4)
        rows.append(
            (i, "https://h.example/" + "/".join(
                rnd.choice(segs) for _ in range(depth)))
        )
    urls = spark.createDataFrame(rows, "id long, url string")

    def twin(path):
        best = None
        for allow, p in pats:
            rx = "^" + re.escape(p).replace(r"\*", ".*")
            rx = re.sub(r"\\\$$", "$", rx)
            if re.match(rx, path):
                key = (len(p), allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    got = {
        r["id"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    want = {
        i: twin("/" + u.split("/", 3)[3]) for i, u in rows
    }
    assert got == want


def test_html_metadata_extraction(spark):
    """Title/description/lang/canonical/noindex across attribute
    orders, quoting styles, entities, hard-wrapped titles, and total
    absence — the fetch→extraction metadata stage."""
    from sparvi_core_spark.functions.web import html_metadata

    pages = [
        (0, '<html lang="en"><head><title>Home &amp; Garden</title>'
            '<meta name="description" content="Nice &quot;page&quot;">'
            '<link rel="canonical" href="https://ex.com/a"></head></html>'),
        # reversed attribute order + uppercase attr names
        (1, '<html LANG="FR"><head><title> Deux   mots </title>'
            '<meta content="ordre inverse" name="description">'
            '<link href="https://ex.com/b" rel="canonical"></head></html>'),
        # single-quoted attributes
        (2, "<html lang='pt-BR'><head>"
            "<meta name='robots' content='NOINDEX, nofollow'>"
            "<title>simples</title></head></html>"),
        # hard-wrapped title; no other metadata
        (3, "<html><head><title>line one\n   line two</title></head></html>"),
        (4, None),
        (5, "<p>not even an html element</p>"),
        # apostrophe inside a double-quoted value must not truncate;
        # data-lang must not shadow the real lang attribute
        (6, '<html data-lang="xx" lang="en"><head>'
            '<meta name="description" content="It\'s Tom\'s place">'
            "</head></html>"),
        # xml:lang alone is not the lang attribute
        (7, '<html xml:lang="zz"><head><title>no lang</title></head></html>'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in html_metadata(df).collect()}
    assert got[0]["title"] == "Home & Garden"
    assert got[0]["description"] == 'Nice "page"'
    assert got[0]["html_lang"] == "en"
    assert got[0]["canonical_url"] == "https://ex.com/a"
    assert got[0]["noindex"] is False
    assert got[1]["description"] == "ordre inverse"
    assert got[1]["html_lang"] == "fr"
    assert got[1]["canonical_url"] == "https://ex.com/b"
    assert got[2]["html_lang"] == "pt-br"
    assert got[2]["noindex"] is True
    assert got[3]["title"] == "line one line two"
    assert got[3]["html_lang"] is None
    assert got[3]["canonical_url"] is None
    assert got[4]["title"] is None and got[4]["noindex"] is False
    assert got[5]["title"] is None and got[5]["html_lang"] is None
    assert got[6]["description"] == "It's Tom's place"
    assert got[6]["html_lang"] == "en"
    assert got[7]["html_lang"] is None and got[7]["title"] == "no lang"
