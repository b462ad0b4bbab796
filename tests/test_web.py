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
