"""Corpus-level boilerplate line removal."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.boilerplate import (
    line_doc_frequencies,
    remove_boilerplate_lines,
)

FOOTER = "copyright 2024 example corp all rights reserved"
NAV = "home | products | about | contact"


@pytest.fixture(scope="module")
def pages(spark):
    rows = []
    for i in range(20):
        body = f"unique article body number {i} with its own words"
        rows.append((i, f"{NAV}\n{body}\n\n{FOOTER}", f"src{i % 2}"))
    # one page that is ONLY boilerplate
    rows.append((100, f"{NAV}\n{FOOTER}", "src0"))
    # one page with no boilerplate at all
    rows.append((101, "a fully original page\nwith two lines", "src1"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_line_doc_frequencies(spark, pages):
    freqs = {
        r["line"]: r["doc_freq"]
        for r in line_doc_frequencies(pages).collect()
    }
    assert freqs[FOOTER] == 21
    assert freqs[NAV] == 21
    assert freqs["unique article body number 3 with its own words"] == 1
    assert "" not in freqs  # blank lines never counted


def test_remove_boilerplate_lines(spark, pages):
    out = remove_boilerplate_lines(pages, min_docs=10)
    assert out.count() == pages.count()  # row count invariant
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    # boilerplate stripped, body + blank line structure preserved
    assert texts[3] == "unique article body number 3 with its own words\n"
    assert texts[100] == ""  # fully-boilerplate page survives as empty
    assert texts[101] == "a fully original page\nwith two lines"
    # other columns carried through
    assert {r["source"] for r in out.filter("doc_id = 100").collect()} == {"src0"}


def test_threshold_not_reached_keeps_everything(spark, pages):
    out = remove_boilerplate_lines(pages, min_docs=50)
    orig = {r["doc_id"]: r["text"] for r in pages.collect()}
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == orig


def test_min_frac_threshold(spark, pages):
    # 22 docs; min_frac=0.9 -> ceil(19.8)=20 <= 21 occurrences: stripped
    out = remove_boilerplate_lines(pages, min_docs=2, min_frac=0.9)
    assert FOOTER not in out.filter("doc_id = 0").first()["text"]
    # min_frac=1.0 -> threshold 22 > 21: kept
    out2 = remove_boilerplate_lines(pages, min_docs=2, min_frac=1.0)
    assert FOOTER in out2.filter("doc_id = 0").first()["text"]


def test_min_line_chars_floor(spark):
    df = spark.createDataFrame(
        [(i, "ok\nthis is a long repeated boilerplate line") for i in range(5)],
        "doc_id long, text string",
    )
    out = remove_boilerplate_lines(df, min_docs=3, min_line_chars=10)
    t = out.first()["text"]
    assert t == "ok"  # short line protected, long repeated line stripped


def test_validation(spark, pages):
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(pages, min_docs=1)
    with pytest.raises(ValueError, match="min_frac"):
        remove_boilerplate_lines(pages, min_frac=0.0)
