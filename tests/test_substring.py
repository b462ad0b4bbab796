"""Cross-document duplicated-span detection."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.substring import (
    duplicated_spans,
    substring_dup_stats,
)


def _words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


@pytest.fixture(scope="module")
def corpus(spark):
    shared = _words("s", 12)  # a 12-token span shared verbatim
    rows = [
        # docs 1 and 2 embed the shared span at different offsets
        (1, _words("a", 5) + " " + shared + " " + _words("b", 4)),
        (2, _words("c", 3) + " " + shared + " " + _words("d", 7)),
        # doc 3: entirely unique
        (3, _words("e", 25)),
        # doc 4: shorter than the window
        (4, _words("f", 4)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_found_and_merged(spark, corpus):
    spans = {
        r["id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(corpus, window=8, min_docs=2).collect()
    }
    # doc 1: shared tokens occupy positions 5..16 → windows 5..9 merge
    # into one maximal span [5, 17)
    assert spans[1] == (5, 17)
    # doc 2: shared at positions 3..14 → [3, 15)
    assert spans[2] == (3, 15)
    assert 3 not in spans and 4 not in spans


def test_substring_dup_stats_all_docs_present(spark, corpus):
    stats = {
        r["id"]: r.asDict()
        for r in substring_dup_stats(corpus, window=8, min_docs=2).collect()
    }
    assert set(stats) == {1, 2, 3, 4}
    assert stats[1]["dup_spans"] == 1 and stats[1]["dup_tokens"] == 12
    assert stats[1]["n_tokens"] == 21
    assert stats[1]["dup_token_frac"] == pytest.approx(12 / 21, abs=1e-6)
    assert stats[2]["dup_tokens"] == 12
    assert stats[3]["dup_spans"] == 0 and stats[3]["dup_token_frac"] == 0.0
    assert stats[4]["dup_tokens"] == 0  # too short to window


def test_two_disjoint_spans_stay_separate(spark):
    sh1, sh2 = _words("x", 9), _words("y", 9)
    rows = [
        (1, sh1 + " " + _words("m", 10) + " " + sh2),
        (2, sh1 + " " + _words("n", 30) + " " + sh2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicated_spans(df, window=9, min_docs=2)
    per_doc = {
        r["id"]: r["c"]
        for r in spans.groupBy("id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert per_doc == {1: 2, 2: 2}


def test_min_docs_threshold(spark, corpus):
    assert duplicated_spans(corpus, window=8, min_docs=3).count() == 0
    with pytest.raises(ValueError, match="window"):
        duplicated_spans(corpus, window=1)
    with pytest.raises(ValueError, match="min_docs"):
        duplicated_spans(corpus, min_docs=1)


def test_within_doc_repetition_not_flagged(spark):
    """A span repeated twice INSIDE one doc but present in no other doc
    is not cross-document duplication (doc frequency 1)."""
    rep = _words("r", 10)
    df = spark.createDataFrame(
        [(1, rep + " " + rep), (2, _words("z", 30))],
        "doc_id long, text string",
    )
    assert duplicated_spans(df, window=10, min_docs=2).count() == 0


def test_remove_duplicated_spans_trims_and_passes_through(spark):
    from sparvi_core_spark.operators.substring import (
        remove_duplicated_spans,
    )

    shared = " ".join(f"dup{i}" for i in range(6))   # 6-token shared span
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"start {shared} finish line here"),
        (3, "totally unrelated    text with   odd spacing"),  # untouched
        (4, shared),                                  # fully covered
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r.asDict()
        for r in remove_duplicated_spans(df, window=6, min_docs=2).collect()
    }
    assert out[1]["text"] == "alpha beta gamma delta"
    assert out[1]["n_tokens_removed"] == 6
    assert out[2]["text"] == "start finish line here"
    assert out[2]["n_tokens_removed"] == 6
    # untouched doc: BYTE-identical text, odd spacing preserved
    assert out[3]["text"] == rows[2][1]
    assert out[3]["n_tokens_removed"] == 0
    # fully covered doc: empty string, all tokens removed
    assert out[4]["text"] == ""
    assert out[4]["n_tokens_removed"] == 6
    assert len(out) == 4


def test_remove_duplicated_spans_merged_overlaps_and_python_twin(spark):
    """Windows overlap across a long shared run; removal must excise
    the MERGED span exactly once. Twin recomputes from first
    principles with Python sets of flagged token indexes."""
    from collections import Counter

    from sparvi_core_spark.operators.substring import (
        remove_duplicated_spans,
    )

    run = " ".join(f"w{i}" for i in range(12))  # 12-token shared run
    rows = [
        (1, f"a b c {run} x y z"),
        (2, f"p q {run} r s"),
        (3, "n1 n2 n3 n4 n5 n6 n7 n8"),
    ]
    W = 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r.asDict()
        for r in remove_duplicated_spans(df, window=W, min_docs=2).collect()
    }

    # twin: flag every W-window whose text occurs in >= 2 docs
    toks = {i: t.split() for i, t in rows}
    wins = Counter()
    for i, ts in toks.items():
        seen = {" ".join(ts[p:p + W]) for p in range(len(ts) - W + 1)}
        for wtext in seen:
            wins[wtext] += 1
    for i, ts in toks.items():
        flagged = set()
        for p in range(len(ts) - W + 1):
            if wins[" ".join(ts[p:p + W])] >= 2:
                flagged.update(range(p, p + W))
        want = " ".join(t for j, t in enumerate(ts) if j not in flagged)
        if flagged:
            assert out[i]["text"] == want, i
            assert out[i]["n_tokens_removed"] == len(flagged), i
        else:
            assert out[i]["text"] == rows[i - 1][1], i
            assert out[i]["n_tokens_removed"] == 0
