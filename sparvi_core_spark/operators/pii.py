"""PII detection and redaction — the privacy-scrub stage every
pre-training corpus pipeline runs before release (emails, phone
numbers, IP addresses, SSN-shaped ids, credit-card numbers). Detection
counts VERIFIED hits per document (credit-card candidates are
Luhn-checked, not just shape-matched); redaction replaces every
candidate with a typed placeholder.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Design decisions that matter:

- **Patterns are RE2-compatible** (no lookarounds): they run
  unchanged in Spark (Java regex) AND in the DuckDB oracle, so every
  count is SQL-parity-testable. The cost is slightly blunter
  boundaries (``\\b`` instead of lookarounds) — documented per type.
- **Detection verifies, redaction over-removes.** ``detect_pii``
  Luhn-checks card candidates (an expression-only checksum — digit
  array → doubled-every-second-from-right → mod 10, no UDF), so
  reported counts are real cards modulo the test-number space.
  ``redact_pii`` replaces EVERY card-shaped candidate, checksum or
  not: for privacy the false-positive direction is the safe one, and
  a conditional-replace would need a per-match callback (Python in
  the hot path). The asymmetry is deliberate and documented.
- **Redaction order is fixed** (email → ipv4 → ssn → card → phone):
  longer/stricter shapes first, so a phone pattern can never eat the
  middle of a card number before the card rule sees it.

Scale design (the part that matters at 100 TB):

- Everything is built-in expressions — ``regexp_extract_all`` /
  ``regexp_replace`` / array folds run inside whole-stage codegen;
  zero Python on the executors, zero shuffles (map-only over the
  corpus). ``pii_summary`` adds one map-side-combined global agg.
- Per-row cost is bounded by text length × pattern count; there is no
  join, no state, and nothing to skew — the scan parallelism IS the
  operator's parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RE2-compatible (and Java-regex-compatible) patterns. \b works in
# both; no lookbehind/lookahead anywhere.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the pragmatic form (full RFC 5322 is not a
    # regex); dots/plus tags in the local part included
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # dotted quad with per-octet range check (no 999.1.1.1 hits)
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
    ),
    # US SSN shape: AAA-GG-SSSS (dashed form only — bare 9-digit runs
    # collide with too much real text to report as PII)
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # 13-19 digits with optional single space/dash separators — the
    # PAN candidate shape; detect_pii Luhn-verifies each candidate
    "credit_card": r"\b[0-9](?:[ \-]?[0-9]){12,18}\b",
    # international-ish phone: optional +CC, optional area group,
    # 7-11 national digits with ./-/space separators
    "phone": (
        r"\b\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ]?"
        r"[0-9]{3}[-. ]?[0-9]{4}\b"
    ),
}

# longer/stricter shapes first so e.g. the phone rule never consumes
# the middle of a card number
REDACT_ORDER = ["email", "ipv4", "ssn", "credit_card", "phone"]


def _luhn_valid(cand: Column) -> Column:
    """Expression-only Luhn checksum over a candidate string (digits
    with optional space/dash separators): strip separators, double
    every second digit from the RIGHT (subtracting 9 above 9), sum
    mod 10 == 0. Stays inside codegen — no UDF."""
    digits = F.regexp_replace(cand, r"[ \-]", "")
    n = F.length(digits)
    # i runs 1..n over the REVERSED string so "every second from the
    # right" is simply even i
    rev = F.reverse(digits)
    total = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(
                i % 2 == 0,
                # doubled digit, minus 9 when it overflows
                F.when(
                    F.substring(rev, i, F.lit(1)).cast("int") * 2 > 9,
                    F.substring(rev, i, F.lit(1)).cast("int") * 2 - 9,
                ).otherwise(F.substring(rev, i, F.lit(1)).cast("int") * 2),
            ).otherwise(F.substring(rev, i, F.lit(1)).cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (total % 10 == 0) & (n >= 13)


def detect_pii(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """``df`` + one ``n_<type>`` count column per requested type +
    ``pii_total``. Counts are per document; NULL text counts as zero
    everywhere. ``credit_card`` counts only Luhn-VALID candidates
    (shape matches that fail the checksum are phone numbers, ids,
    timestamps — not cards); every other type counts pattern matches.
    Map-only, expression-only."""
    types = list(PII_PATTERNS) if types is None else list(types)
    for t in types:
        if t not in PII_PATTERNS:
            raise ValueError(
                f"unknown PII type {t!r}; known: {sorted(PII_PATTERNS)}"
            )
    col = F.coalesce(F.col(text_col), F.lit(""))
    # phone counts run on card-stripped text: a 16-digit PAN contains
    # phone-shaped substrings, and double-counting a card as a phone
    # would inflate the report (residual overlaps — e.g. a phone
    # number inside an URL path — are the pattern tier's known noise)
    phone_base = F.regexp_replace(col, PII_PATTERNS["credit_card"], " ")
    out = df
    total = F.lit(0)
    for t in types:
        src = phone_base if t == "phone" else col
        matches = F.regexp_extract_all(src, F.lit(PII_PATTERNS[t]), 0)
        if t == "credit_card":
            cnt = F.size(F.filter(matches, _luhn_valid))
        else:
            cnt = F.size(matches)
        out = out.withColumn(f"n_{t}", cnt.cast("long"))
        total = total + F.col(f"n_{t}")
    return out.withColumn("pii_total", total.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
    out_col: str | None = None,
    placeholder_fmt: str = "[{}]",
) -> DataFrame:
    """Replace every PII candidate with a typed placeholder
    (``[EMAIL]``, ``[CREDIT_CARD]``, …) in ``out_col`` (defaults to
    overwriting ``text_col``). Card-shaped candidates are redacted
    WITHOUT the Luhn check — over-removal is the privacy-safe
    direction (see module docstring). Application order is
    ``REDACT_ORDER`` regardless of the order of ``types``.
    Idempotent: placeholders match no pattern. NULL text stays NULL."""
    types = list(PII_PATTERNS) if types is None else list(types)
    for t in types:
        if t not in PII_PATTERNS:
            raise ValueError(
                f"unknown PII type {t!r}; known: {sorted(PII_PATTERNS)}"
            )
    dest = text_col if out_col is None else out_col
    col = F.col(text_col)
    for t in REDACT_ORDER:
        if t in types:
            col = F.regexp_replace(
                col,
                PII_PATTERNS[t],
                placeholder_fmt.format(t.upper()),
            )
    return df.withColumn(dest, col)


def pii_summary(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """One-row corpus report: ``n_docs``, ``docs_with_pii``, and the
    total count per type — the release-gate number ("how much PII is
    left after the scrub"). One map-only detect pass + one
    map-side-combined global agg."""
    types = list(PII_PATTERNS) if types is None else list(types)
    detected = detect_pii(df, text_col=text_col, types=types)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("pii_total") > 0).cast("long")).alias("docs_with_pii"),
    ] + [F.sum(f"n_{t}").alias(f"total_{t}") for t in types]
    return detected.agg(*aggs)
