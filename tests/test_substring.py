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


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup (round 8)
# ---------------------------------------------------------------------------

from sparvi_core_spark.operators.substring import dedup_paragraphs  # noqa: E402


def test_dedup_paragraphs_first_and_none(spark):
    banner = "accept all cookies to continue reading this site"
    rows = [
        (1, f"unique intro one.\n\n{banner}\n\nunique body one."),
        (2, f"{banner}\n\nunique body two."),
        (3, "totally unique document with no shared paragraphs."),
        (4, None),
        (5, f"unique five.\n\n{banner}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["id"]: r.asDict() for r in dedup_paragraphs(df).collect()}
    # keep="first": the banner survives ONLY in doc 1 (smallest id/pos)
    assert banner in got[1]["text"]
    assert banner not in got[2]["text"] and banner not in got[5]["text"]
    assert got[2]["text"] == "unique body two."
    assert got[5]["text"] == "unique five."
    # untouched docs pass byte-identical
    assert got[3]["text"] == rows[2][1]
    assert got[3]["n_paras_removed"] == 0 and got[3]["n_paras_kept"] == 1
    # NULL stays NULL with zero counts
    assert got[4]["text"] is None and got[4]["n_paras_kept"] == 0
    assert got[1]["n_paras_kept"] == 3 and got[2]["n_paras_removed"] == 1

    # keep="none": every occurrence of the banner goes
    got_n = {r["id"]: r.asDict() for r in dedup_paragraphs(df, keep="none").collect()}
    for i in (1, 2, 5):
        assert banner not in (got_n[i]["text"] or "")
    assert got_n[1]["text"] == "unique intro one.\n\nunique body one."


def test_dedup_paragraphs_min_df_and_guards(spark):
    import pytest

    shared = "this paragraph appears in exactly two documents here"
    rows = [(1, f"{shared}\n\na."), (2, f"{shared}\n\nb."), (3, "c.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_df=3: df=2 paragraph survives everywhere
    out = {r["id"]: r["text"] for r in dedup_paragraphs(df, min_df=3).collect()}
    assert shared in out[1] and shared in out[2]
    with pytest.raises(ValueError, match="min_df"):
        dedup_paragraphs(df, min_df=1)
    with pytest.raises(ValueError, match="keep"):
        dedup_paragraphs(df, keep="last")


def test_dedup_paragraphs_python_twin_on_planted_corpus(spark, views):
    """Independent Python twin over the organic corpus with planted
    shared paragraphs (every 3rd doc gets banner A, every 7th gets
    banner B appended as paragraphs)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    docs = spark.table("documents").filter(F.col("doc_id") < 120)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("\n\nshared banner alpha here")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("\n\nshared banner beta there")).otherwise(F.lit("")),
        ).alias("text"),
    )
    rows = {r["doc_id"]: r["text"] for r in planted.collect()}

    # twin: global (id, pos) occurrence table, df >= 2, keep first
    occ = defaultdict(list)
    split = {}
    for i in sorted(rows):
        paras = [p.strip() for p in rows[i].split("\n\n")]
        paras = [p for p in paras if p]
        split[i] = paras
        for pos, p in enumerate(paras):
            occ[p].append((i, pos))
    removed = set()
    for p, occs in occ.items():
        if len({i for i, _ in occs}) >= 2:
            keeper = min(occs)
            removed |= set(occs) - {keeper}
    want = {}
    for i, paras in split.items():
        kept = [p for pos, p in enumerate(paras) if (i, pos) not in removed]
        n_rem = sum(1 for pos in range(len(paras)) if (i, pos) in removed)
        txt = rows[i] if n_rem == 0 else "\n\n".join(kept)
        want[i] = (txt, len(paras) - n_rem, n_rem)

    got = {
        r["id"]: (r["text"], r["n_paras_kept"], r["n_paras_removed"])
        for r in dedup_paragraphs(planted).collect()
    }
    assert got == want
