"""Text normalization — the unicode-hygiene stage a web corpus passes
through before tokenization (C4/CCNet-style): strip control and
zero-width characters, straighten curly punctuation, collapse
whitespace, NFC/NFKC-normalize, and score/repair the classic
UTF-8-read-as-Latin-1 mojibake.

No analog in the reference engine (profiling/validation surface only —
``/root/reference/sparvi/profiler/profile_engine.py:17``; SURVEY.md
§2.8): part of the training-data-pipeline extension surface.

Two tiers, priced separately:

- **Expression tier** (``strip_control_chars`` /
  ``normalize_punctuation`` / ``collapse_whitespace`` — and their
  composition ``clean_text_col``): pure ``regexp_replace`` /
  ``translate`` chains inside whole-stage codegen. Map-only, zero
  Python, zero shuffles — run on everything, always.
- **Kernel tier** (``unicode_normalize`` / ``fix_mojibake``): the JVM
  has no exposed NFC/NFKC expression, so canonical normalization is
  an Arrow-batched ``mapInPandas`` kernel over ``unicodedata`` (the
  same must-use-Python class as the codec kernels in
  ``operators.multimodal``). Cost is per-row Python INSIDE Arrow
  batches — no per-row serialization — and the kernel is oracle-pinned
  against DuckDB's ``nfc_normalize`` and Python's ``unicodedata``
  twin. Text already in NFC (the overwhelming majority of real text)
  round-trips unchanged, so running it is idempotent and safe.

Mojibake: ``mojibake_score`` counts the signature byte-pair artifacts
of UTF-8 decoded as Latin-1/Windows-1252 (``Ã©`` for ``é``,
``â€™`` for ``'``, …) as a pure expression;
``fix_mojibake`` repairs by the inverse transform (re-encode as
CP1252/Latin-1, re-decode as UTF-8) ONLY on rows the score flags —
correct text is never touched, and the repair is idempotent (repaired
text scores 0).

Scale: both tiers are map-only over the corpus; the expression tier
adds no Python, the kernel tier ships no model and keeps no state —
the scan's parallelism is the operator's parallelism. All character
classes below are written as explicit escapes: invisible characters
in source literals are exactly the bug class this module removes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# C0 controls minus \t\n\r, plus DEL and the C1 range
_CONTROL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-]"
# zero-width space/non-joiner/joiner, word joiner, BOM, soft hyphen
_ZERO_WIDTH = "[​‌‍⁠﻿­]"
# typographic → ASCII, strictly 1:1 (from/to MUST stay equal-length —
# Spark's translate DELETES from-chars past the end of the to-string)
_PUNCT_FROM = (
    "‘’‚′"  # curly/low-9 single quotes, prime → '
    "“”„″"  # curly/low-9 double quotes, d-prime → "
    "–—―"        # en/em/horizontal-bar dash → -
    "     "  # nbsp + space family → ' '
)
_PUNCT_TO = "''''\"\"\"\"---     "
# UTF-8 lead byte decoded as Latin-1/CP1252 (Â Ã â) followed by a
# continuation-byte image: Latin-1 gives U+0080-00BF; CP1252 maps
# 0x80-0x9F to this punctuation set instead (0x81 8D 8F 90 9D are
# undefined and usually passed through, covered by the Latin-1 range)
_CONT = (
    "[-¿"
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ]"
)
_MOJIBAKE = "[ÂÃâ]" + _CONT


def strip_control_chars(col) -> Column:
    """Remove C0/C1 control characters (keeping tab/newline/CR) and
    zero-width/invisible code points. Pure expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, _CONTROL, ""), _ZERO_WIDTH, ""
    )


def normalize_punctuation(col) -> Column:
    """Straighten typographic punctuation to ASCII: curly single and
    double quotes, primes, en/em/horizontal-bar dashes, ellipsis, NBSP
    and the unicode space family. 1:1 maps go through ``translate``
    (one pass); the 1:n ellipsis through a replace. Pure expression."""
    c = F.col(col) if isinstance(col, str) else col
    one_to_one = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    return F.regexp_replace(one_to_one, "…", "...")


def collapse_whitespace(col) -> Column:
    """Runs of whitespace → one space, trimmed. Pure expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def clean_text_col(col) -> Column:
    """The composed expression tier: strip controls → straighten
    punctuation → collapse whitespace. Idempotent."""
    return collapse_whitespace(
        normalize_punctuation(strip_control_chars(col))
    )


def mojibake_score(col) -> Column:
    """Count of UTF-8-as-Latin-1/CP1252 artifact sequences in the
    text (0 = clean). Pure expression — gates :func:`fix_mojibake`
    and doubles as a corpus-quality signal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(_MOJIBAKE), 0)
    ).cast("long")


def unicode_normalize(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Canonical unicode normalization (NFC/NFKC/NFD/NFKD) of
    ``text_col`` into ``out_col`` (default: in place). Arrow-batched
    kernel over ``unicodedata`` — the JVM exposes no normalizer
    expression (see module docstring); NULLs pass through. Idempotent
    for NFC/NFKC. Oracle-pinned against DuckDB ``nfc_normalize`` and
    the Python twin in tests."""
    import pandas as pd

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    dest = text_col if out_col is None else out_col
    from pyspark.sql import types as T

    fields = [f for f in df.schema.fields if f.name != dest]
    out_schema = T.StructType(
        fields + [T.StructField(dest, T.StringType(), True)]
    )
    names = [f.name for f in out_schema.fields]

    def kern(batches):
        import unicodedata

        for pdf in batches:
            norm = pd.Series(
                [
                    None if s is None else unicodedata.normalize(form, s)
                    for s in pdf[text_col]
                ],
                index=pdf.index,
                dtype="object",
            )
            out = pdf.drop(columns=[dest], errors="ignore")
            out[dest] = norm
            yield out[names]

    return df.mapInPandas(kern, out_schema)


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_score: int = 1,
) -> DataFrame:
    """Repair UTF-8-as-Latin-1/CP1252 mojibake: rows whose
    :func:`mojibake_score` ≥ ``min_score`` are re-encoded and
    re-decoded as UTF-8; every other row passes through UNTOUCHED, so
    correct text can never be damaged. The re-encode is CP1252 with
    Latin-1 passthrough PER CHARACTER (``â€`` artifacts decoded
    through CP1252's punctuation page, while CP1252's five undefined
    slots — 0x81 8D 8F 90 9D — and pure-Latin-1 decodes surface as raw
    U+00XX codepoints; one codec alone round-trips neither mix). A
    flagged row that fails the round-trip (not actually mojibake,
    e.g. organic emoji) keeps its original. Idempotent: repaired text
    scores 0. Arrow-batched kernel."""
    import pandas as pd

    dest = text_col if out_col is None else out_col
    from pyspark.sql import types as T

    fields = [f for f in df.schema.fields if f.name != dest]
    out_schema = T.StructType(
        fields + [T.StructField(dest, T.StringType(), True)]
    )
    names = [f.name for f in out_schema.fields]
    src_df = df.withColumn("__mscore", mojibake_score(text_col))

    def _repair(s: str) -> str:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                o = ord(ch)
                if o > 0xFF:
                    return s  # genuine non-Latin text: not mojibake
                out.append(o)  # Latin-1 passthrough (incl. 81 8D 8F 90 9D)
        try:
            return out.decode("utf-8")
        except UnicodeDecodeError:
            return s

    def kern(batches):
        for pdf in batches:
            hit = pdf["__mscore"] >= min_score
            vals = [
                s if (s is None or not h) else _repair(s)
                for s, h in zip(pdf[text_col], hit)
            ]
            out = pdf.drop(columns=["__mscore"]).drop(
                columns=[dest], errors="ignore"
            )
            out[dest] = pd.Series(vals, index=pdf.index, dtype="object")
            yield out[names]

    return src_df.mapInPandas(kern, out_schema)
