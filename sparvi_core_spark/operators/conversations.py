"""Conversation (chat/SFT) data preparation — the instruction-tuning
half of a training-data pipeline. Pre-training operators treat a
document as one text blob; SFT corpora are JSON message lists
(``[{"role": ..., "content": ...}, ...]``) that every pipeline must
parse, schema-validate (roles known, alternation holds, nothing
empty), profile (turn counts, per-role token mass), and finally render
back into a single training string under a fixed template.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Design decisions that matter:

- **Typed parse, permissive failure.** ``parse_conversations`` uses
  ``from_json`` against a fixed ``array<struct<role,content>>``
  schema: malformed JSON (or a JSON value that is not a message list)
  yields NULL turns plus ``parse_ok=false`` — one corrupt row never
  aborts a corpus scan, and the validator counts it instead.
- **Alternation is checked after dropping ``system`` turns** (system
  prompts legitimately precede either speaker), as a single
  ``zip_with(body[:-1], body[1:], !=)`` + ``forall`` — the standard
  "no two consecutive turns from the same speaker" SFT contract.
- **Rendering is deterministic** and purely positional: a
  conversation always renders to the same training string, so
  downstream exact-dedup over rendered text is meaningful.

Scale design (the part that matters at 100 TB):

- Every operator here is map-only built-in expressions
  (``from_json`` / ``transform`` / ``filter`` / ``aggregate`` /
  ``zip_with`` inside whole-stage codegen): zero Python on the
  executors, zero shuffles, no state — the scan parallelism IS the
  operator's parallelism. ``conversation_report`` adds exactly one
  map-side-combined global aggregation.
- Per-row cost is bounded by the message count of that row; nothing
  joins, nothing skews, and a 100×-wider corpus is 100× more of the
  same map tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# The wire schema every operator in this module speaks. Extra JSON
# keys are ignored by from_json; missing keys surface as NULLs (and
# the validator flags them).
CHAT_TURNS_TYPE = "array<struct<role:string,content:string>>"

#: roles the validator accepts by default (the OpenAI-style trio that
#: public SFT corpora converged on)
KNOWN_ROLES = ("system", "user", "assistant")


def _roles(turns: Column) -> Column:
    return F.transform(turns, lambda t: t["role"])


def _token_count(text: Column) -> Column:
    """Whitespace token count; empty/NULL → 0 (split('') is [''])."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def _alternates(turns: Column) -> Column:
    """True when no two CONSECUTIVE non-system turns share a role.

    System turns are excluded before the check (a leading system
    prompt — or an injected mid-conversation one — does not break
    user/assistant alternation). ≤1 remaining turn is trivially
    alternating. NULL turns (parse failure) → NULL, so callers can
    fold it into parse_ok instead of miscounting."""
    body = F.filter(_roles(turns), lambda r: r != F.lit("system"))
    n = F.size(body)
    pairs = F.zip_with(
        F.slice(body, 1, n - 1),
        F.slice(body, 2, n - 1),
        lambda a, b: a != b,
    )
    return F.when(turns.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.when(n <= 1, F.lit(True)).otherwise(F.forall(pairs, lambda x: x))
    )


def parse_conversations(
    df: DataFrame,
    json_col: str = "messages",
    turns_col: str = "turns",
    drop_raw: bool = True,
) -> DataFrame:
    """Parse a JSON message-list column into typed ``turns``
    (``array<struct<role,content>>``) plus ``parse_ok``.

    ``parse_ok`` is false when the JSON is malformed (``from_json``
    returns NULL) or the input is NULL. One Spark quirk, kept as-is
    and pinned in tests: a bare JSON OBJECT parses as a singleton
    list (``from_json`` wraps a single element when given an array
    schema) rather than failing — the validator's rule flags are
    where such rows get policed. Map-only."""
    turns = F.from_json(F.col(json_col), CHAT_TURNS_TYPE)
    out = df.withColumn(turns_col, turns).withColumn(
        "parse_ok", F.col(turns_col).isNotNull()
    )
    return out.drop(json_col) if drop_raw else out


def conversation_stats(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-conversation profile: one row per input row with

    - ``n_turns`` / ``n_system`` / ``n_user`` / ``n_assistant`` /
      ``n_other`` (role counts; other = any role outside
      ``KNOWN_ROLES``),
    - ``first_role`` / ``last_role``,
    - ``alternates_ok`` (see :func:`_alternates`),
    - ``n_empty`` (turns whose content is NULL or whitespace-only),
    - ``total_chars`` (summed content length),
    - ``user_tokens`` / ``assistant_tokens`` (whitespace tokens).

    NULL ``turns`` (parse failures) produce NULL stats — count them
    via ``parse_ok``, don't average them. Map-only, zero shuffle."""
    turns = F.col(turns_col)
    roles = _roles(turns)

    def role_n(r: str) -> Column:
        return F.size(F.filter(roles, lambda x: x == F.lit(r)))

    def tok_sum(role: str) -> Column:
        return F.aggregate(
            F.filter(turns, lambda t: t["role"] == F.lit(role)),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + _token_count(t["content"]).cast("bigint"),
        )

    n = F.size(turns)
    return df.select(
        F.col(id_col),
        F.when(turns.isNull(), F.lit(None).cast("int"))
        .otherwise(n)
        .alias("n_turns"),
        role_n("system").alias("n_system"),
        role_n("user").alias("n_user"),
        role_n("assistant").alias("n_assistant"),
        F.size(
            F.filter(
                roles,
                lambda x: x.isNull()
                | ~x.isin([F.lit(r) for r in KNOWN_ROLES]),
            )
        ).alias("n_other"),
        F.try_element_at(roles, F.lit(1)).alias("first_role"),
        F.try_element_at(roles, F.lit(-1)).alias("last_role"),
        _alternates(turns).alias("alternates_ok"),
        F.size(
            F.filter(
                turns,
                lambda t: t["content"].isNull()
                | (F.trim(t["content"]) == ""),
            )
        ).alias("n_empty"),
        F.aggregate(
            turns,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc
            + F.coalesce(F.length(t["content"]), F.lit(0)).cast("bigint"),
        ).alias("total_chars"),
        tok_sum("user").alias("user_tokens"),
        tok_sum("assistant").alias("assistant_tokens"),
    )


def validate_conversations(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
    first_roles: tuple[str, ...] = ("system", "user"),
    last_role: str | None = "assistant",
    known_roles: tuple[str, ...] = KNOWN_ROLES,
) -> DataFrame:
    """Per-conversation rule flags + the conjunction ``valid``.

    Rules (each its own boolean column, so a report can count every
    failure mode independently):

    - ``parse_ok``    — turns parsed (non-NULL, carried through if
      :func:`parse_conversations` already added it)
    - ``has_turns``   — at least one turn
    - ``roles_known`` — every role ∈ ``known_roles``
    - ``first_role_ok`` — opening role ∈ ``first_roles``
    - ``alternates_ok`` — non-system roles alternate
    - ``nonempty_ok`` — no NULL/whitespace-only content
    - ``last_role_ok`` — closing role == ``last_role`` (skipped when
      ``last_role=None``)

    A parse failure fails every downstream rule (NULL-safe: flags are
    coalesced to false), so ``valid`` is false, never NULL. Map-only."""
    turns = F.col(turns_col)
    roles = _roles(turns)
    ok = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    flags = {
        "parse_ok": (
            F.col("parse_ok")
            if "parse_ok" in df.columns
            else turns.isNotNull()
        ),
        "has_turns": ok(F.size(turns) >= 1),
        "roles_known": ok(
            F.forall(
                roles,
                lambda x: x.isin([F.lit(r) for r in known_roles]),
            )
        ),
        "first_role_ok": ok(
            F.try_element_at(roles, F.lit(1)).isin(
                [F.lit(r) for r in first_roles]
            )
        ),
        "alternates_ok": ok(_alternates(turns)),
        "nonempty_ok": ok(
            F.forall(
                turns,
                lambda t: t["content"].isNotNull()
                & (F.trim(t["content"]) != ""),
            )
        ),
    }
    if last_role is not None:
        flags["last_role_ok"] = ok(
            F.try_element_at(roles, F.lit(-1)) == F.lit(last_role)
        )
    valid = None
    for c in flags.values():
        valid = c if valid is None else (valid & c)
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in flags.items()],
        valid.alias("valid"),
    )


def conversation_report(flags: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus-level rollup of :func:`validate_conversations` output:
    one row — total conversations, valid count, and a failure count
    per rule column. One map-side-combined aggregation."""
    rule_cols = [c for c in flags.columns if c != id_col]
    return flags.agg(
        F.count(F.lit(1)).alias("n_conversations"),
        *[
            F.count_if(~F.col(c)).alias(f"fail_{c}")
            for c in rule_cols
            if c != "valid"
        ],
        F.count_if(F.col("valid")).alias("n_valid"),
    )


def render_conversations(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
    out_col: str = "text",
    style: str = "tags",
    turn_sep: str = "\n",
) -> DataFrame:
    """Flatten each conversation into ONE deterministic training
    string: ``(id, text)``.

    - ``style="tags"``  → ``<|role|>\\ncontent`` per turn
    - ``style="plain"`` → ``role: content`` per turn

    joined by ``turn_sep``. NULL content renders as the empty string
    (the validator is where emptiness is policed — rendering never
    drops a turn, so token-offset bookkeeping downstream stays aligned
    with ``n_turns``). NULL turns render NULL. Map-only."""
    if style == "tags":
        fmt = lambda t: F.concat(  # noqa: E731
            F.lit("<|"), t["role"], F.lit("|>\n"),
            F.coalesce(t["content"], F.lit("")),
        )
    elif style == "plain":
        fmt = lambda t: F.concat(  # noqa: E731
            t["role"], F.lit(": "), F.coalesce(t["content"], F.lit("")),
        )
    else:
        raise ValueError(f"unknown style {style!r} (tags|plain)")
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(F.col(turns_col), fmt), turn_sep).alias(
            out_col
        ),
    )
