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
- `cap_per_group` keeps at most N rows per group. The default
  `plan="window"` is the textbook `row_number() OVER (PARTITION BY
  host)` — one shuffle, per-host sorts; fastest whenever each host
  fits a task's sort (measured 4× faster than the alternative on an
  8M-row half-megahost corpus). `plan="bucketed"` is the spill-regime
  escape hatch for TRUE megagroups (a single reducer sorting 100M+
  rows): (a) one tiny count finds the hosts exceeding the cap at
  all, (b) under-cap hosts' rows pass a broadcast-join filter with NO
  shuffle, (c) only over-cap hosts' rows shuffle, on fine-grained
  (host, priority-bucket) keys, so no sort exceeds ~1/n_buckets of a
  megahost. Both plans produce the IDENTICAL kept set (tested).
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
# anchored so a '?' that first appears INSIDE the fragment is never
# parsed as a query: the query is what sits between the first '?' and
# the first '#', and only when that '?' precedes any '#'
_QUERY_RE = r"^[^#?]*\?([^#]*)"


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
    plan: str = "window",
    broadcast_max_groups: int = 2_000_000,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, deterministically.

    ``order="hash"`` keeps an unbiased pseudo-random subset (seeded by
    ``salt``); ``order="id"`` the lowest ids; ``order="quality"`` the
    highest-``order_col`` rows. Output columns == input columns.

    Both plans return the IDENTICAL kept set (tested); they differ in
    execution shape:

    - ``plan="window"`` (default): one shuffle by group + per-group
      sort. Fastest whenever every group's rows fit one task's sort
      comfortably — measured 4× faster than "bucketed" on an 8M-row
      corpus whose megahost holds half the rows (stress_bench).
    - ``plan="bucketed"`` (hash order only): the spill-regime escape
      hatch for true megagroups (hundreds of millions of rows on one
      key, where the window plan's single reducer sorts/spills for
      hours). Under-cap groups' rows pass a broadcast-join filter with
      NO shuffle; only over-cap groups' rows shuffle, on fine-grained
      (group, priority-bucket) keys, so no sort exceeds ~1/n_buckets
      of a megagroup. The trade is extra scans — it optimizes shuffle
      volume and straggler/spill risk, not small-scale wall clock.
    """
    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    if order not in ("hash", "id", "quality"):
        raise ValueError(f"unknown order {order!r}")
    if order == "quality" and order_col is None:
        raise ValueError("order='quality' requires order_col")
    if plan not in ("window", "bucketed"):
        raise ValueError(f"plan must be 'window' or 'bucketed', got {plan!r}")
    if plan == "bucketed" and order != "hash":
        raise ValueError("plan='bucketed' requires order='hash'")

    if order == "hash":
        pri = _hash_priority(id_col, salt)
    elif order == "quality":
        worst = 1.7976931348623157e308
        pri = -F.coalesce(F.col(order_col).cast("double"), F.lit(-worst))
    else:
        pri = F.col(id_col).cast("long")

    in_cols = df.columns
    g = df.withColumn("__pri", pri)

    if plan == "window":
        w = Window.partitionBy(group_col).orderBy("__pri", id_col)
        return (
            g.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_rows)
            .select(*in_cols)
        )

    # Two-phase, over-groups-only. The naive two-phase (histogram of
    # EVERY group) backfires: with many small groups the (group,
    # bucket) histogram is nearly data-sized and its shuffle+join cost
    # 5× the single window (measured, 8M rows / 40k hosts). So:
    #
    #   1. one map-side-combined count per group (tiny output) finds
    #      the groups that exceed the cap at all;
    #   2. rows of under-cap groups pass through a broadcast-joinable
    #      filter — NO shuffle, no sort, which at corpus scale is the
    #      vast majority of the data;
    #   3. only over-cap groups' rows get the histogram → boundary
    #      bucket → rank treatment, and only the boundary bucket
    #      (~1/n_buckets of each megagroup) is ever sorted.
    #
    # The union's three branches re-scan the input, trading (cheap,
    # column-pruned, parallel) scans for the full-data shuffle + mega-
    # group sort the window plan pays. Catalyst/AQE broadcasts the
    # per-group tables when small; at worst they hash-join.
    shift = _PRIORITY_BITS - n_buckets.bit_length() + 1
    bucket = F.shiftright(F.col("__pri"), shift)
    g = g.withColumn("__bkt", bucket)

    over = (
        g.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__tot"))
        .filter(F.col("__tot") > max_rows)
        .select(group_col, F.lit(True).alias("__over"))
    )
    # Catalyst can't estimate an agg-filter's output, so it plans
    # sort-merge joins that shuffle the full input once per union
    # branch (measured: 7 SMJs / 13 exchanges). Gate on the MEASURED
    # over-group count — the `prepare_corpus` precedent: one cheap
    # aggregate action buys shuffle-free passes for the whole plan.
    # Above the gate (millions of capped groups) fall back to the
    # single-window plan: with that many groups to rank there is no
    # megagroup advantage left to exploit.
    n_over = over.count()
    if n_over == 0:
        return df
    if n_over > broadcast_max_groups:
        return cap_per_group(
            df, group_col, max_rows, id_col, order, order_col, salt,
            n_buckets, plan="window",
        )
    over = F.broadcast(over.localCheckpoint())
    tagged = g.join(over, on=group_col, how="left")
    under_rows = tagged.filter(F.col("__over").isNull()).select(*in_cols)
    gov = tagged.filter(F.col("__over").isNotNull()).drop("__over")

    counts = gov.groupBy(group_col, "__bkt").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        counts.withColumn(
            "__before", F.coalesce(F.sum("__n").over(wb), F.lit(0))
        )
        # the unique bucket where the cumulative count REACHES the cap
        # (>=, not >: an exact hit at a bucket edge must still mark the
        # boundary so later buckets drop); groups with total < max_rows
        # have none and keep every row
        .filter(
            (F.col("__before") < max_rows)
            & (F.col("__before") + F.col("__n") >= max_rows)
        )
        .select(
            group_col,
            F.col("__bkt").alias("__bb"),
            (F.lit(max_rows) - F.col("__before")).alias("__take"),
        )
    )
    # one branch for all over-cap rows: rank within (group, BUCKET) —
    # fine-grained keys, so the shuffle carries only over-group rows
    # and no sort exceeds ~1/n_buckets of a megagroup. Sub-boundary
    # rows keep regardless of their rank; above-boundary rows drop.
    joined = gov.join(F.broadcast(boundary), on=group_col, how="inner")
    wbucket = Window.partitionBy(group_col, "__bkt").orderBy("__pri", id_col)
    kept_over = (
        joined.withColumn("__rn", F.row_number().over(wbucket))
        .filter(
            (F.col("__bkt") < F.col("__bb"))
            | ((F.col("__bkt") == F.col("__bb")) & (F.col("__rn") <= F.col("__take")))
        )
        .select(*in_cols)
    )
    return under_rows.unionByName(kept_over)


def cap_per_host(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    by_domain: bool = False,
    order: str = "hash",
    order_col: str | None = None,
    salt: str = "cap",
    plan: str = "window",
) -> DataFrame:
    """Cap each host's (or registered domain's) document count.
    Adds no columns; the host key is computed on the fly."""
    key = url_host(url_col)
    if by_domain:
        key = registered_domain(key)
    tmp = "__cap_key"
    out = cap_per_group(
        df.withColumn(tmp, key), tmp, max_docs, id_col=id_col,
        order=order, order_col=order_col, salt=salt, plan=plan,
    )
    return out.drop(tmp)


def host_suffixes(host: F.Column) -> F.Column:
    """``array<string>`` of the host's dot-suffix chain:
    ``a.b.co.uk → [a.b.co.uk, b.co.uk, co.uk, uk]`` — the exact-match
    key space for domain blocklists (an entry blocks itself and every
    subdomain; substring accidents like ``notexample.com`` vs
    ``example.com`` are impossible by construction). Pure array
    expressions; NULL host → NULL."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(labels, i, n)),
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    block_col: str = "host",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (kept, blocked) by a domain blocklist — the
    UT1-style URL category filter of the CCNet/RefinedWeb recipe: a
    blocklist entry blocks the exact host and every subdomain, nothing
    else. Pass ``host_col`` when the host is already extracted;
    otherwise it is parsed from ``url_col``. Rows with a NULL host
    (unparseable URL) are KEPT — a blocklist states what to remove,
    not what to admit; stack an explicit NULL-URL rule upstream if
    absence should exclude.

    Scale shape: each row fans out by its label count (≤ ~10, bounded
    by hostname syntax, never corpus-driven), broadcast-joins the
    blocklist (UT1-class lists are millions of rows — MBs), and the
    distinct blocked-id set anti-joins back. The blocklist is never
    shuffled; both corpus-side joins key on the id column. Entries are
    matched lowercase-exact; normalize the blocklist once upstream.
    """
    host = (
        F.col(host_col) if host_col else url_host(url_col)
    )
    bl = blocklist.select(
        F.lower(F.col(block_col)).alias("__blocked_host")
    ).distinct()
    suff = df.select(
        F.col(id_col).alias("__bid"),
        F.explode(host_suffixes(F.lower(host))).alias("__suffix"),
    )
    blocked_ids = (
        suff.join(
            F.broadcast(bl),
            suff["__suffix"] == bl["__blocked_host"],
            "left_semi",
        )
        .select("__bid")
        .distinct()
    )
    blocked = df.join(
        blocked_ids, df[id_col] == blocked_ids["__bid"], "left_semi"
    )
    kept = df.join(
        blocked_ids, df[id_col] == blocked_ids["__bid"], "left_anti"
    )
    return kept, blocked


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# query keys stripped by canonicalize_url: click/campaign trackers that
# vary per visitor while pointing at the same resource. Any key whose
# lowercase form starts with ``utm_`` is also stripped.
TRACKING_PARAMS = [
    "gclid", "fbclid", "msclkid", "yclid", "igshid", "twclid",
    "mc_cid", "mc_eid", "_ga", "_gl", "s_kwcid", "spm", "ref_src",
]

_HOSTPORT_FROM_REST_RE = r"^(?:[^/?#@]*@)?([^/?#\s]+)"
_PORT_RE = r":(\d+)$"
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def canonicalize_url(
    url_col: str = "url",
    strip_www: bool = False,
    keep_params: list[str] | None = None,
) -> F.Column:
    """One canonical string per resource, so exact URL dedup stops
    treating tracker/fragment/case variants as distinct documents (the
    crawl-frontier + URL-dedup normalization step every web corpus
    runs; the reference has no web surface — extension operator).

    Deterministic, documented recipe:

    - scheme and host lowercased; userinfo (``user:pass@``) dropped;
      fragment (``#...``) dropped.
    - default ports stripped (http:80, https:443, ftp:21, ws/wss);
      any other explicit port is kept.
    - ``strip_www=True`` additionally removes one leading ``www.``
      label from the host (common for dedup keys; off by default
      because ``www`` and apex CAN serve different content).
    - empty path becomes ``/``; a single trailing slash on a deeper
      path is removed (``/a/`` → ``/a``) so the two crawl spellings
      collide.
    - query: tracking keys (``utm_*`` prefix + ``TRACKING_PARAMS``,
      matched on the lowercased key) are removed; survivors are sorted
      byte-wise on the full ``key=value`` token (key case and value
      untouched — they can be significant); empty query drops the
      ``?``. ``keep_params`` flips to whitelist mode: ONLY those
      (lowercased) keys survive.
    - inputs that don't parse as ``scheme://...`` pass through
      trimmed-only (garbage in, trimmed garbage out — never NULL, so
      a dedup key over the result keeps unparseable rows distinct).

    Pure codegen expressions (regex/array ops in the Java∩RE2∩DuckDB
    subset — oracle-checkable, map-only, zero Python).
    """
    url = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(url, _PREFIX_RE, "")
    hostport = F.regexp_extract(rest, _HOSTPORT_FROM_REST_RE, 1)
    host = F.lower(F.regexp_replace(hostport, _PORT_RE, ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    default_port = F.coalesce(
        *[
            F.when(scheme == s, F.lit(p))
            for s, p in _DEFAULT_PORTS.items()
        ],
        F.lit(""),
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    raw_path = F.regexp_extract(rest, _PATH_FROM_REST_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            raw_path.substr(F.lit(1), F.length(raw_path) - 1),
        ).otherwise(raw_path)
    )

    raw_q = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(F.split(raw_q, "&"), lambda x: x != "")
    key_of = lambda x: F.lower(F.element_at(F.split(x, "=", 2), 1))
    if keep_params is not None:
        allowed = F.array(*[F.lit(k.lower()) for k in keep_params])
        params = F.filter(params, lambda x: F.array_contains(allowed, key_of(x)))
    else:
        blocked = F.array(*[F.lit(k) for k in TRACKING_PARAMS])
        params = F.filter(
            params,
            lambda x: ~key_of(x).startswith("utm_")
            & ~F.array_contains(blocked, key_of(x)),
        )
    query = F.array_join(F.array_sort(params), "&")
    q_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )

    canonical = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(scheme == "", url).otherwise(canonical)


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = True,
    order: str = "hash",
    order_col: str | None = None,
    salt: str = "urldedup",
) -> DataFrame:
    """Keep exactly one row per canonical URL (``canonicalize_url``
    with ``strip_www`` defaulting ON — for dedup, merging www/apex
    variants is usually wanted). Winner selection is
    ``cap_per_group``'s vocabulary: ``order="hash"`` a seeded-hash-
    stable representative, ``order="id"`` the lowest id,
    ``order="quality"`` the highest ``order_col`` (for
    earliest-fetch-wins, pass a negated/inverted timestamp column).
    One shuffle on the canonical key.
    Unparseable URLs canonicalize to their trimmed selves, so distinct
    garbage rows all survive; NULL urls get a per-row unique key
    (``\\x00null:<id>``), so they all survive too instead of
    collapsing into one NULL group."""
    tmp = "__canon_url"
    canon = F.coalesce(
        canonicalize_url(url_col, strip_www=strip_www),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    out = cap_per_group(
        df.withColumn(tmp, canon),
        tmp, 1, id_col=id_col, order=order, order_col=order_col, salt=salt,
    )
    return out.drop(tmp)


def host_quality_stats(
    df: DataFrame,
    flag_cols: list[str],
    url_col: str = "url",
    host_col: str | None = None,
    by_domain: bool = False,
    tokens_col: str | None = None,
    extra_suffixes: list[str] | None = None,
) -> DataFrame:
    """Per-host (or per-registered-domain) quality rollup: document
    count, optional token mass, and the pass FRACTION of each boolean
    ``flag_cols`` column — the crawl-feedback table (RefinedWeb-style
    host prioritization: hosts whose pages keep failing the gates get
    de-prioritized or blocklisted, hosts that pass get crawled deeper).
    Join the gate outputs (``passes_gopher``, ``passes_c4``,
    ``passes_repetition``, ...) onto the URL-bearing frame first; this
    operator only aggregates.

    NULL flags count as FAILING (a page that couldn't be scored is not
    evidence of quality) but still count in ``n_docs``. Fractions
    rounded to 4. One map-side-combined aggregation; output is one row
    per host — broadcastable back against the corpus or exportable as
    a frontier-priority table. Scales.
    """
    if not flag_cols:
        raise ValueError("flag_cols must be non-empty")
    key = F.col(host_col) if host_col else url_host(url_col)
    if by_domain:
        key = registered_domain(key, extra_suffixes)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).alias("n_tokens"))
    for c in flag_cols:
        aggs.append(
            F.round(
                F.avg(F.coalesce(F.col(c), F.lit(False)).cast("double")), 4
            ).alias(f"{c}_frac")
        )
    return (
        df.groupBy(key.alias("domain" if by_domain else "host"))
        .agg(*aggs)
        .orderBy(F.desc("n_docs"))
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl politeness as data
# ---------------------------------------------------------------------------
#
# A compliant crawl pipeline carries each host's robots.txt as a row
# of config data; whether a URL may be fetched is then a JOIN, not a
# per-URL network call. Parsing runs Arrow-batched (robots bodies are
# a per-HOST side table — millions of rows at web scale, never
# corpus-sized); matching is pure expressions over a broadcast rule
# table: longest-match wins, allow wins ties, no rule means allowed —
# the RFC 9309 semantics (NOT the 1997 first-match rule).


# ---------------------------------------------------------------------------
# HTML document metadata
# ---------------------------------------------------------------------------


def _attr_pair(
    tag_re: str, key1: str, val1: str, key2: str
) -> tuple[str, str, str, str]:
    """Four regexes (both attribute orders × both value quote styles)
    extracting ``key2``'s value from a tag matching ``key1="val1"`` —
    HTML attribute order is free, so every extractor needs the swapped
    variant, and the value class must be QUOTE-SPECIFIC: a shared
    ``[^"']*`` class stops at the first quote of either kind, silently
    truncating a double-quoted value containing an apostrophe
    (``content="it's fine"`` → ``it``) — and apostrophes are common in
    real meta descriptions/titles."""
    pre = rf"(?is)<{tag_re}\b[^>]*"
    k1 = rf"{key1}\s*=\s*[\"']{val1}[\"']"
    pats = []
    for q in ('"', "'"):
        pats.append(pre + k1 + rf"[^>]*{key2}\s*=\s*{q}([^{q}]*)")
        pats.append(pre + rf"{key2}\s*=\s*{q}([^{q}]*){q}[^>]*" + k1)
    return tuple(pats)


def _first_nonempty(c: F.Column, *patterns: str) -> F.Column:
    return F.coalesce(
        *[F.nullif(F.regexp_extract(c, p, 1), F.lit("")) for p in patterns]
    )


def html_title(text_col: str = "text") -> F.Column:
    """First ``<title>`` text: entity-decoded, whitespace-collapsed,
    trimmed; NULL when absent/empty."""
    from sparvi_core_spark.functions.text import _decode_entities

    raw = F.regexp_extract(
        F.col(text_col), r"(?is)<title[^>]*>(.*?)</title>", 1
    )
    t = F.trim(F.regexp_replace(_decode_entities(raw), r"\s+", " "))
    return F.nullif(t, F.lit(""))


def html_lang(text_col: str = "text") -> F.Column:
    """The ``<html lang=...>`` attribute, lowercased (a cheap
    publisher-declared prior for :func:`~...text.language_id` — trust
    but verify: crawls are full of template-default ``lang="en"`` on
    non-English pages). NULL when absent. The attribute name requires
    a preceding delimiter (``[\\s"']``) because ``\\b`` treats ``:``
    and ``-`` as word boundaries — a bare ``\\blang`` would match
    ``data-lang``/``xml:lang`` and could shadow a real ``lang``
    attribute; ``xml:lang`` is deliberately NOT read (XHTML-only, and
    HTML5 defines ``lang`` as the one that wins)."""
    return F.nullif(
        F.lower(
            F.regexp_extract(
                F.col(text_col),
                r"(?is)<html\b[^>]*[\s\"']lang\s*=\s*[\"']?([a-zA-Z][a-zA-Z-]*)",
                1,
            )
        ),
        F.lit(""),
    )


def html_canonical(text_col: str = "text") -> F.Column:
    """``<link rel="canonical" href=...>`` target (either attribute
    order) — the publisher's own dedup key; feed it to
    ``canonicalize_url``/``dedup_by_url`` ahead of the content tiers.
    NULL when absent."""
    return _first_nonempty(
        F.col(text_col), *_attr_pair("link", "rel", "canonical", "href")
    )


def html_meta(text_col: str, name: str) -> F.Column:
    """``<meta name="<name>" content=...>`` value (either attribute
    order), entity-decoded, whitespace-collapsed; NULL when absent."""
    from sparvi_core_spark.functions.text import _decode_entities

    raw = _first_nonempty(
        F.col(text_col), *_attr_pair("meta", "name", name, "content")
    )
    return F.nullif(
        F.trim(F.regexp_replace(_decode_entities(raw), r"\s+", " ")),
        F.lit(""),
    )


def html_noindex(text_col: str = "text") -> F.Column:
    """True when a robots meta tag carries ``noindex`` — the in-page
    counterpart of robots.txt (RFC 9309 gates the FETCH; the robots
    meta gates INDEXING of a page already fetched). Pipelines honoring
    publisher opt-outs drop these before the corpus store."""
    robots = F.lower(F.coalesce(html_meta(text_col, "robots"), F.lit("")))
    return robots.contains("noindex")


def html_metadata(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Page-level metadata in one map-only pass → ``(id, title,
    description, html_lang, canonical_url, noindex)``.

    The crawl stage between fetch and extraction: the canonical link
    keys publisher-declared dedup, the robots meta drives opt-out
    compliance, the lang attribute is a (noisy) language prior, and
    title/description are quality/context signals for curation. All
    Java-regex ∩ RE2 expressions — JVM-side, whole-stage-codegen'd,
    re-derivable in the DuckDB oracle; column-pruned scans read only
    (id, text)."""
    return df.select(
        F.col(id_col).alias("id"),
        html_title(text_col).alias("title"),
        html_meta(text_col, "description").alias("description"),
        html_lang(text_col).alias("html_lang"),
        html_canonical(text_col).alias("canonical_url"),
        html_noindex(text_col).alias("noindex"),
    )


def parse_robots_txt(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt bodies → one rule per row: ``(host, agent, allow,
    pattern)``. Consecutive ``User-agent`` lines form a group whose
    Allow/Disallow rules fan out to every agent in it; rules before
    any ``User-agent`` line are ignored (RFC 9309 §2.2.1); an empty
    ``Disallow:`` (or Allow) carries no restriction and emits nothing;
    comments (#) and unknown directives (Sitemap, Crawl-delay, …) are
    skipped. Agents lower-case; patterns verbatim."""
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            hosts, agents_out, allows, pats = [], [], [], []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                if text is None or host is None:
                    continue
                agents: list[str] = []
                rules_started = False
                for raw in str(text).splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, val = line.split(":", 1)
                    key, val = key.strip().lower(), val.strip()
                    if key == "user-agent":
                        if rules_started:
                            agents, rules_started = [], False
                        if val:
                            agents.append(val.lower())
                    elif key in ("allow", "disallow"):
                        rules_started = True
                        if not val or not agents:
                            continue
                        for a in agents:
                            hosts.append(host)
                            agents_out.append(a)
                            allows.append(key == "allow")
                            pats.append(val)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "agent": pd.Series(agents_out, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "pattern": pd.Series(pats, dtype="object"),
                }
            )

    return df.select(host_col, text_col).mapInPandas(
        kern, "host string, agent string, allow boolean, pattern string"
    )


def _robots_group(rules: DataFrame, agent: str) -> DataFrame:
    """Per host, the ONE group that applies to ``agent``: rules whose
    agent token the crawler's token starts with, keeping only the
    longest such token per host; the ``*`` group only when no specific
    group matched (RFC 9309 §2.2.1 most-specific-group rule)."""
    ours = agent.lower()
    scored = rules.withColumn(
        "__m",
        F.when(F.col("agent") == "*", F.lit(0))
        .when(
            F.lit(ours).startswith(F.lower(F.col("agent"))),
            F.length("agent"),
        )
        .otherwise(F.lit(-1)),
    ).filter(F.col("__m") >= 0)
    best = scored.groupBy("host").agg(F.max("__m").alias("__best"))
    return (
        scored.join(F.broadcast(best), "host")
        .filter(F.col("__m") == F.col("__best"))
        .select("host", "allow", "pattern")
    )


def _robots_pattern_regex(pattern: F.Column) -> F.Column:
    """REP pattern → anchored Java/RE2 regex: metachars escaped,
    ``*`` → ``.*``, a trailing ``$`` stays an anchor."""
    esc = F.regexp_replace(pattern, r"([\\^$.|?+()\[\]{}])", r"\\$1")
    rx = F.regexp_replace(esc, r"\*", ".*")
    # Java replacement syntax: "\$" injects a literal dollar (bare "$"
    # would be a group reference and throws)
    rx = F.regexp_replace(rx, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), rx)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    out: str = "allowed",
) -> DataFrame:
    """``urls`` plus a boolean ``out`` column: may ``agent`` fetch this
    URL under the ``rules`` table (from :func:`parse_robots_txt`)?
    RFC 9309 decision rule: among the applicable group's rules whose
    pattern matches the URL's path+query, the LONGEST pattern wins and
    allow wins length ties; no matching rule — or no robots.txt for
    the host at all — means allowed.

    Matching is over the path as extracted from the URL — no
    percent-encoding normalization is applied, so a rule written as
    ``/caf%C3%A9/`` only matches URLs carrying the same encoded
    spelling (RFC 9309 matches over the percent-encoded octets;
    canonicalize both sides upstream if your corpus mixes encodings).

    Scale shape: each host's group folds to ONE broadcast row holding
    its rule array, so the corpus side is a single map-only pass — no
    fan-out, no row-id, no verdict shuffle; the winner is picked by a
    higher-order ``filter``/``array_max`` over the (tiny, per-host)
    rule array. The per-element regex match is the cost of REP
    wildcards. Deterministic under task retry by construction (no
    ``monotonically_increasing_id``)."""
    for c in ("__path", "__host", "__rules", "__matched"):
        if c in urls.columns:
            raise ValueError(f"urls already has a {c!r} column")
    group = _robots_group(rules, agent).withColumn(
        "__rx", _robots_pattern_regex(F.col("pattern"))
    )
    # one row per host: the applicable group's rules as an array of
    # (plen, allow, rx) structs — per-host config, broadcast-small
    host_rules = group.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("pattern").alias("plen"),
                F.col("allow").alias("allow"),
                F.col("__rx").alias("rx"),
            )
        ).alias("__rules")
    )
    path = F.coalesce(
        F.nullif(url_path(url_col), F.lit("")), F.lit("/")
    )
    q = url_query(url_col)
    pathq = F.when(q == "", path).otherwise(
        F.concat(path, F.lit("?"), q)
    )
    keyed = urls.withColumn("__host", url_host(url_col)).withColumn(
        "__path", pathq
    )
    j = keyed.join(
        F.broadcast(host_rules),
        keyed["__host"] == host_rules["host"],
        "left",
    ).drop(host_rules["host"])
    # matching rules, reduced to (plen, allow); array_max's struct
    # ordering IS the RFC rule: longest pattern first, and on a length
    # tie true > false so allow wins
    j = j.withColumn(
        "__matched",
        F.expr(
            "transform(filter(__rules, r -> __path rlike r.rx),"
            " r -> struct(r.plen AS plen, r.allow AS allow))"
        ),
    )
    verdict = F.when(
        F.col("__matched").isNull() | (F.size("__matched") == 0),
        F.lit(True),
    ).otherwise(F.array_max("__matched")["allow"])
    return j.withColumn(out, verdict).drop(
        "__host", "__path", "__rules", "__matched"
    )


def filter_robots_disallowed(
    df: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Split into ``(fetchable, disallowed)`` under the rules — the
    frontier gate, one call."""
    flagged = robots_allowed(df, rules, agent, url_col, out="__ok")
    return (
        flagged.filter(F.col("__ok")).drop("__ok"),
        flagged.filter(~F.col("__ok")).drop("__ok"),
    )
