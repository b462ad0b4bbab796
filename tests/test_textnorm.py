"""Text normalization (`functions/textnorm.py`): hand-checked
expression-tier transforms, NFC kernel parity against BOTH DuckDB's
nfc_normalize and the Python unicodedata twin over the real corpus,
mojibake score/repair round-trips (Latin-1 AND CP1252 paths), and the
never-touch-correct-text + idempotence contracts."""

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.functions.textnorm import (
    clean_text_col,
    collapse_whitespace,
    fix_mojibake,
    mojibake_score,
    normalize_punctuation,
    strip_control_chars,
    unicode_normalize,
)

SF_DIR = "/root/testdata/sf0.001"


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("out")).first()["out"]


def test_expression_tier_hand_checked(spark):
    assert (
        _one(spark, "“curly” ‘q’", normalize_punctuation("text"))
        == "\"curly\" 'q'"
    )
    assert (
        _one(spark, "a – b — c …", normalize_punctuation("text"))
        == "a - b - c ..."
    )
    assert (
        _one(spark, "nb sp and thin space", normalize_punctuation("text"))
        == "nb sp and thin space"
    )
    assert (
        _one(spark, "a\x07b\x00c​d­e", strip_control_chars("text"))
        == "abcde"
    )
    # tab/newline survive the control strip (collapse owns them)
    assert _one(spark, "a\tb\nc", strip_control_chars("text")) == "a\tb\nc"
    assert _one(spark, "  a\t\t b \n c  ", collapse_whitespace("text")) == "a b c"
    assert (
        _one(spark, " “x” \x07 – y… ", clean_text_col("text"))
        == '"x" - y...'
    )
    # idempotent
    once = _one(spark, " “x” \x07 – y… ", clean_text_col("text"))
    assert _one(spark, once, clean_text_col("text")) == once


def test_nfc_kernel_matches_duckdb_and_python(spark):
    """NFC parity three ways on composed/decomposed fixtures plus the
    real documents corpus: Spark kernel == DuckDB nfc_normalize ==
    Python unicodedata."""
    fixtures = [
        (1, "café decomposed"),          # e + combining acute
        (2, "café composed"),
        (3, "Å ring and Å angstrom"),  # Å two ways
        (4, None),
        (5, ""),
        (6, "plain ascii stays"),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    con = duckdb.connect()
    for frame, src in ((df, None), (docs, f"{SF_DIR}/documents.parquet")):
        got = {
            r["doc_id"]: r["text"]
            for r in unicode_normalize(frame, "text").collect()
        }
        rows = frame.collect()
        for r in rows:
            want_py = (
                None
                if r["text"] is None
                else unicodedata.normalize("NFC", r["text"])
            )
            assert got[r["doc_id"]] == want_py, r["doc_id"]
        if src:
            duck = {
                r[0]: r[1]
                for r in con.execute(
                    f"SELECT doc_id, nfc_normalize(text) FROM '{src}'"
                ).fetchall()
            }
        else:
            duck = {
                r["doc_id"]: (
                    None
                    if r["text"] is None
                    else con.execute(
                        "SELECT nfc_normalize(?)", [r["text"]]
                    ).fetchone()[0]
                )
                for r in rows
            }
        assert got == duck
    # NFC idempotent; NFKC reachable; bad form refused
    twice = unicode_normalize(unicode_normalize(df, "text"), "text")
    assert {r["doc_id"]: r["text"] for r in twice.collect()} == {
        r["doc_id"]: r["text"]
        for r in unicode_normalize(df, "text").collect()
    }
    nfkc = unicode_normalize(df, "text", form="NFKC").collect()
    assert len(nfkc) == 6
    with pytest.raises(ValueError, match="unknown normalization form"):
        unicode_normalize(df, "text", form="NFX")


def _lenient_cp1252(b: bytes) -> str:
    """What real-world tooling produces when it reads UTF-8 bytes as
    Windows-1252: defined bytes through the codec, the five undefined
    slots (81 8D 8F 90 9D) passed through as raw codepoints."""
    out = []
    for x in b:
        try:
            out.append(bytes([x]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(x))
    return "".join(out)


def test_mojibake_score_and_repair(spark):
    latin1_moj = "café résumé".encode("utf-8").decode("latin-1")
    cp1252_moj = _lenient_cp1252("it’s “fine” — ok".encode("utf-8"))
    rows = [
        (1, latin1_moj),
        (2, cp1252_moj),
        (3, "clean café text"),        # real accents, score 0
        (4, "plain ascii"),
        (5, None),
        (6, "emoji \U0001f600 stays"),      # non-latin1, untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", mojibake_score("text").alias("s")
        ).collect()
    }
    assert scores[1] >= 3 and scores[2] >= 3
    assert scores[3] == 0 and scores[4] == 0 and scores[5] == 0
    fixed = {r["doc_id"]: r["text"] for r in fix_mojibake(df).collect()}
    assert fixed[1] == "café résumé"
    assert fixed[2] == "it’s “fine” — ok"
    # unflagged rows bit-identical, NULL preserved
    assert fixed[3] == "clean café text"
    assert fixed[4] == "plain ascii" and fixed[5] is None
    assert fixed[6] == "emoji \U0001f600 stays"
    # idempotent: repaired corpus scores 0 everywhere, second pass no-op
    refixed = {
        r["doc_id"]: r["text"]
        for r in fix_mojibake(fix_mojibake(df)).collect()
    }
    assert refixed == fixed
    rescored = (
        fix_mojibake(df)
        .select(F.sum(mojibake_score("text")).alias("s"))
        .first()["s"]
    )
    assert rescored == 0


def test_real_corpus_is_left_alone(spark):
    """The organic documents corpus is clean ASCII-ish text: the whole
    normalization stack must pass it through unchanged (the
    do-no-harm contract for the 99% case)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = fix_mojibake(
        unicode_normalize(docs, "text"), "text"
    ).withColumn("clean", clean_text_col("text"))
    n_changed = out.filter(
        (F.col("text") != F.col("clean"))
        | F.col("text").isNull() != F.col("clean").isNull()
    ).count()
    assert n_changed == 0
    before = {r["doc_id"]: r["text"] for r in docs.collect()}
    after = {r["doc_id"]: r["text"] for r in out.collect()}
    assert before == after