"""Web-corpus URL operators: parsing, host stats, per-host caps.

The reference has no web surface; a crawl-derived training corpus
(Common-Crawl-style) is keyed by URL and needs host-level curation:
parse hosts out of URLs, measure per-host supply, and cap any one
host's contribution so boilerplate-heavy sites can't dominate the mix
(the UniMax/C4 "per-domain cap" recipe — `operators.mixing` applies
token budgets to KNOWN domains from a driver-side dict; these
operators work on MILLIONS of hosts discovered from the data itself).

Design (Spark-first):
- URL parsing is regex expressions in the Java-regex ∩ RE2 subset (the
  same portability rule as `functions.text.redact_pii`), NOT Spark's
  `parse_url` — so every extraction is DuckDB-oracle-checkable and the
  whole pipeline stays inside whole-stage codegen.
- `registered_domain` is the last-2-labels heuristic with a small
  built-in multi-part-suffix list (co.uk, com.au, ...). It is NOT the
  full public-suffix list (that's a data file, not an algorithm); pass
  `extra_suffixes` to extend it.
- `cap_per_group` keeps at most N rows per group. The textbook
  `row_number() OVER (PARTITION BY host)` sorts every host's full
  partition — one 100M-doc megahost means one task sorting 100M rows.
  The default two-phase plan (the count analog of `mixing`'s
  bucket/boundary plan) avoids that: hash priorities are uniform, so
  phase 1 histograms each group's priorities into coarse buckets (one
  map-side-combined count), finds the boundary bucket where the
  cumulative count crosses N, keeps sub-boundary buckets outright, and
  ranks ONLY the boundary bucket's rows (~1/n_buckets of the group).
  Both plans produce the IDENTICAL kept set (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# regexes shared with the DuckDB oracle (RE2-safe: no backrefs, no
# lookaround). Parsing is a two-step recipe — strip the
# ``scheme://``/``//`` prefix, then extract from the remainder with
# regexes that contain NO optional groups. (A single regex with an
# optional scheme group backtracks under Java's engine: for
# ``https://example.com`` the authority can re-match as ``https:`` and
# the "path" becomes ``//example.com``.)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_PREFIX_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//"  # scheme:// or bare //
_HOST_FROM_REST_RE = r"^(?:[^/?#@]*@)?([^/?#:\s]+)"
_PATH_FROM_REST_RE = r"^[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _rest(url_col: str) -> F.Column:
    """URL with any ``scheme://`` / ``//`` prefix removed: the
    authority + path + query remainder (bare URLs pass through)."""
    return F.regexp_replace(F.col(url_col), _PREFIX_RE, "")

# common multi-part suffixes (heuristic subset of the public-suffix
# list; extend via extra_suffixes)
_MULTI_SUFFIXES = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
]


def url_host(url_col: str = "url") -> F.Column:
    """Lower-cased hostname (empty string when unparseable; garbage
    input yields a garbage "host" — validate upstream if needed)."""
    return F.lower(F.regexp_extract(_rest(url_col), _HOST_FROM_REST_RE, 1))


def url_scheme(url_col: str = "url") -> F.Column:
    return F.lower(F.regexp_extract(F.col(url_col), _SCHEME_RE, 1))


def url_path(url_col: str = "url") -> F.Column:
    return F.regexp_extract(_rest(url_col), _PATH_FROM_REST_RE, 1)


def url_query(url_col: str = "url") -> F.Column:
    return F.regexp_extract(F.col(url_col), _QUERY_RE, 1)


def registered_domain(
    host: F.Column, extra_suffixes: list[str] | None = None
) -> F.Column:
    """eTLD+1 heuristic: last two labels, or last three when the last
    two form a known multi-part suffix (co.uk, com.au, ...)."""
    suffixes = _MULTI_SUFFIXES + list(extra_suffixes or [])
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(suffixes), last3)
        .otherwise(last2)
    )


def with_url_parts(
    df: DataFrame, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Adds ``scheme, host, domain, path, query`` columns."""
    host = url_host(url_col)
    return df.withColumns(
        {
            prefix + "scheme": url_scheme(url_col),
            prefix + "host": host,
            prefix + "domain": registered_domain(host),
            prefix + "path": url_path(url_col),
            prefix + "query": url_query(url_col),
        }
    )


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    tokens_col: str | None = None,
    by_domain: bool = False,
) -> DataFrame:
    """Docs (and optionally tokens) per host/domain, descending.
    One map-side-combined aggregation; the result is small (one row
    per host) and feeds cap decisions or `mixing.temperature_weights`."""
    key = url_host(url_col)
    if by_domain:
        key = registered_domain(key)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).alias("n_tokens"))
    return (
        df.groupBy(key.alias("domain" if by_domain else "host"))
        .agg(*aggs)
        .orderBy(F.desc("n_docs"))
    )


# ---------------------------------------------------------------------------
# per-group row caps
# ---------------------------------------------------------------------------

_PRIORITY_BITS = 20  # matches operators.mixing


def _hash_priority(id_col: str, salt: str) -> F.Column:
    return F.pmod(
        F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(1 << _PRIORITY_BITS)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    id_col: str = "doc_id",
    order: str = "hash",
    order_col: str | None = None,
    salt: str = "cap",
    n_buckets: int = 1024,
    exact: bool = False,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, deterministically.

    ``order="hash"`` keeps an unbiased pseudo-random subset (seeded by
    ``salt``); ``order="id"`` the lowest ids; ``order="quality"`` the
    highest-``order_col`` rows. Output columns == input columns.

    Scale: the default hash order uses the two-phase bucket/boundary
    plan (module docstring) so no task ever sorts a whole megagroup;
    ``exact=True`` or non-hash orders use the single-window plan. Both
    return the identical kept set for hash order.
    """
    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    if order not in ("hash", "id", "quality"):
        raise ValueError(f"unknown order {order!r}")
    if order == "quality" and order_col is None:
        raise ValueError("order='quality' requires order_col")

    if order == "hash":
        pri = _hash_priority(id_col, salt)
    elif order == "quality":
        worst = 1.7976931348623157e308
        pri = -F.coalesce(F.col(order_col).cast("double"), F.lit(-worst))
    else:
        pri = F.col(id_col).cast("long")

    in_cols = df.columns
    g = df.withColumn("__pri", pri)

    if exact or order != "hash":
        w = Window.partitionBy(group_col).orderBy("__pri", id_col)
        return (
            g.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_rows)
            .select(*in_cols)
        )

    # two-phase: coarse histogram → boundary bucket → rank only there
    shift = _PRIORITY_BITS - n_buckets.bit_length() + 1
    bucket = F.shiftright(F.col("__pri"), shift)
    g = g.withColumn("__bkt", bucket)

    counts = g.groupBy(group_col, "__bkt").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        counts.withColumn("__before", F.coalesce(F.sum("__n").over(wb), F.lit(0)))
        .withColumn("__take", F.lit(max_rows) - F.col("__before"))
        # boundary bucket: first whose cumulative crosses the cap
        .filter((F.col("__before") < max_rows))
        .select(
            group_col,
            "__bkt",
            # full bucket fits → take=None marks "keep all"
            F.when(F.col("__before") + F.col("__n") <= max_rows, F.lit(None))
            .otherwise(F.col("__take"))
            .alias("__take"),
        )
    )
    joined = g.join(bounds, on=[group_col, "__bkt"], how="inner")
    full = joined.filter(F.col("__take").isNull()).select(*in_cols)
    wboundary = Window.partitionBy(group_col, "__bkt").orderBy("__pri", id_col)
    partial = (
        joined.filter(F.col("__take").isNotNull())
        .withColumn("__rn", F.row_number().over(wboundary))
        .filter(F.col("__rn") <= F.col("__take"))
        .select(*in_cols)
    )
    return full.unionByName(partial)


def cap_per_host(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    by_domain: bool = False,
    order: str = "hash",
    order_col: str | None = None,
    salt: str = "cap",
) -> DataFrame:
    """Cap each host's (or registered domain's) document count.
    Adds no columns; the host key is computed on the fly."""
    key = url_host(url_col)
    if by_domain:
        key = registered_domain(key)
    tmp = "__cap_key"
    out = cap_per_group(
        df.withColumn(tmp, key), tmp, max_docs, id_col=id_col,
        order=order, order_col=order_col, salt=salt,
    )
    return out.drop(tmp)
