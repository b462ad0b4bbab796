"""Edit-distance fuzzy matching via symmetric-delete blocking.

The reference has no fuzzy matching; its nearest surface is the exact
duplicate-group count (``profile_engine.py:100-123``). Entity
resolution over a 100 TB corpus (near-identical titles, author names,
URLs differing by a typo) needs *bounded* edit-distance joins that
never go all-pairs.

Design (Spark-first):
- **Symmetric-delete blocking** (the SymSpell idea, public domain):
  if ``lev(a, b) <= d`` then deleting at most ``d`` characters from
  each side can produce a *common* string — every substitution deletes
  one char from both, every insertion/deletion deletes one char from
  one side. So the set of "delete up to d chars" variants is an EXACT
  blocking key: hash-join on the variant, then verify with
  ``levenshtein``. Candidate generation is ``O(rows × variants)``
  shuffle — never a cartesian product, and Catalyst plans a plain
  shuffled hash/sort-merge equi-join on the variant key.
- Variant generation is pure built-in expressions
  (``transform``/``sequence``/``substr``/``flatten``) — JVM-side,
  whole-stage codegen, no Python UDFs.
- Verification uses ``levenshtein(l, r, threshold)`` (Spark >= 3.5),
  which early-exits the DP once the threshold is exceeded.

Cost model: a string of length L has L one-deletion variants and
O(L^2/2) two-deletion variants, so the operator targets SHORT strings
(names, titles, codes, hosts — the entity-resolution case). ``max_len``
(default 64) bounds the fan-out; longer strings either raise
(``long_strategy="error"``, the exactness-preserving default) or are
keyed on their first ``max_len`` characters
(``long_strategy="truncate"`` — may miss pairs whose prefix edit
distance exceeds ``max_edits``; the verify step still guarantees zero
false positives).

Skew: degenerate variants (e.g. the empty string from 1-char inputs,
or a mass-duplicated title) create hot join keys. ``max_bucket``
mirrors ``lsh_candidate_pairs``: keys hotter than the cap are dropped
from blocking (recall trade-off, opt-in, default off = exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _del1(s: F.Column) -> F.Column:
    """array<string> of every one-character-deletion variant of ``s``.

    Empty strings yield an empty array (guarded: ``sequence(1, 0)``
    would otherwise produce a *descending* [1, 0] sequence).
    """
    variants = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s)),
        ),
    )
    empty = F.slice(F.array(F.lit("")), 1, 0)  # typed empty array<string>
    return F.when(F.length(s) > 0, variants).otherwise(empty)


def deletion_keys(s: F.Column, max_edits: int) -> F.Column:
    """All distinct strings reachable from ``s`` by <= ``max_edits``
    character deletions (including ``s`` itself), as array<string>."""
    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    keys = F.array(s)
    level = F.array(s)
    for _ in range(max_edits):
        level = F.array_distinct(F.flatten(F.transform(level, _del1)))
        keys = F.array_union(keys, level)  # array_union dedups
    return keys


def _keyed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edits: int,
    max_len: int,
    long_strategy: str,
) -> DataFrame:
    """(id, s, key) — one row per deletion variant."""
    if long_strategy not in ("error", "truncate"):
        raise ValueError(
            f"long_strategy must be 'error' or 'truncate', got {long_strategy!r}"
        )
    # A compact input would otherwise run the whole explode + join
    # probe + levenshtein chain in a single task (this plan's only
    # join is a broadcast — no shuffle ever spreads the work). No-op
    # at scale; measured sf0.1: 5.4 s → 1.1 s on the self-pair bench
    # query.
    from sparvi_core_spark.plans.fanout import fan_out_compact

    df = fan_out_compact(df)
    s = F.col(text_col)
    if long_strategy == "error":
        # Fail loudly at execution time rather than silently losing
        # recall: raise_error inside a when() only fires on violation.
        basis = F.when(
            F.length(s) > max_len,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fuzzy: string longer than max_len={max_len} "
                        "(pass long_strategy='truncate' or raise max_len): "
                    ),
                    F.substr(s, F.lit(1), F.lit(80)),
                )
            ),
        ).otherwise(s)
    else:
        basis = F.substr(s, F.lit(1), F.lit(max_len))
    return df.select(
        F.col(id_col).alias("id"),
        s.alias("s"),
        F.explode(deletion_keys(basis, max_edits)).alias("key"),
    )


def _cap_hot_keys(keyed: DataFrame, max_bucket: int | None) -> DataFrame:
    if max_bucket is None:
        return keyed
    hot = (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("key")
    )
    return keyed.join(F.broadcast(hot), "key", "left_anti")


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edits: int = 1,
    max_len: int = 64,
    long_strategy: str = "error",
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with ``levenshtein <= max_edits``.

    Returns ``id_a, id_b, edit_distance``. Exact (no false positives,
    no false negatives) when every string fits ``max_len`` and
    ``max_bucket`` is off.
    """
    keyed = _cap_hot_keys(
        _keyed(df, id_col, text_col, max_edits, max_len, long_strategy),
        max_bucket,
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    # verify BEFORE the dedup shuffle: the threshold levenshtein is
    # codegen-cheap per candidate, and filtering first means the
    # distinct (a pair can collide on several variants) shuffles only
    # true pairs of (long, long, int) instead of every candidate with
    # both strings attached
    dist = F.levenshtein(F.col("a.s"), F.col("b.s"), max_edits)
    return (
        a.join(b, (F.col("a.key") == F.col("b.key")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)  # threshold form returns -1 above d
        .distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id",
    left_text: str = "text",
    right_id: str = "id",
    right_text: str = "text",
    max_edits: int = 1,
    max_len: int = 64,
    long_strategy: str = "error",
    max_bucket: int | None = None,
) -> DataFrame:
    """Entity-resolution join: rows of ``left`` matched to rows of
    ``right`` within ``max_edits`` edit distance on the text columns.

    Returns ``left_id, right_id, left_text, right_text,
    edit_distance`` (column names taken from the inputs; a ``_l``/
    ``_r`` suffix is added when the two sides share a name). Same
    blocking/verification as :func:`fuzzy_self_pairs`; broadcast is
    left to Catalyst/AQE since either side may be large.
    """
    if left_id == right_id:
        left_id_out, right_id_out = left_id + "_l", right_id + "_r"
    else:
        left_id_out, right_id_out = left_id, right_id
    if left_text == right_text:
        left_text_out, right_text_out = left_text + "_l", right_text + "_r"
    else:
        left_text_out, right_text_out = left_text, right_text
    lk = _keyed(left, left_id, left_text, max_edits, max_len, long_strategy)
    rk = _keyed(right, right_id, right_text, max_edits, max_len, long_strategy)
    if max_bucket is not None:
        # cap on the combined key frequency so one hot key on either
        # side can't blow up the join
        both = lk.select("key").unionByName(rk.select("key"))
        hot = (
            both.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("key")
        )
        lk = lk.join(F.broadcast(hot), "key", "left_anti")
        rk = rk.join(F.broadcast(hot), "key", "left_anti")
    # verify-first for the same reason as fuzzy_self_pairs: only true
    # matches reach the dedup shuffle
    dist = F.levenshtein(F.col("a.s"), F.col("b.s"), max_edits)
    return (
        lk.alias("a")
        .join(rk.alias("b"), F.col("a.key") == F.col("b.key"))
        .select(
            F.col("a.id").alias(left_id_out),
            F.col("b.id").alias(right_id_out),
            F.col("a.s").alias(left_text_out),
            F.col("b.s").alias(right_text_out),
            dist.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
        .distinct()
    )
