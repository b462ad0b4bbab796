"""Text analysis: language ID, quality features, token counts, fingerprints."""

import pytest

from sparvi_core_spark.functions.text import (
    fingerprints,
    language_id,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat and the dog are in the house for a while"),
        (1, "le chat et le chien sont dans la maison des amis"),
        (2, "el gato y la casa de los perros es una historia"),
        (3, "der hund und die katze sind ein team von hier"),
        (4, "xyzzy plugh qwerty"),                      # no stopwords
        (5, "word word word!!! ??? ,,, ..."),           # heavy punctuation
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(texts):
    got = {
        r["id"]: r["predicted_lang"]
        for r in language_id(texts, strategy="stopword").collect()
    }
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "und"


def test_language_id_default_is_ngram(spark):
    """The API default is the ngram tier (round 9): a default-path call
    on unsegmented Chinese — the input the stopword tier is blind to —
    must return 'zh', proving no caller gets the dead-on-zh gate
    without asking for it."""
    df = spark.createDataFrame(
        [(0, "这是一个没有任何空格的中文句子所以按词匹配永远失败"),
         (1, None)],
        "doc_id long, text string",
    )
    got = {r["id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert got[0] == "zh"
    assert got[1] == "und"


@pytest.mark.slow
def test_language_id_ngram_recovers_planted_languages(spark):
    """The char-n-gram NB tier recovers the language of UNSEEN
    sentences in every seeded script — including unsegmented Chinese
    and Japanese, which the stopword tier is structurally blind to —
    and routes empty/NULL docs to 'und'."""
    planted = [
        (0, "the quick brown fox jumps over the lazy dog near the river", "en"),
        (1, "le chien dort sous la table pendant que le chat regarde la rue", "fr"),
        (2, "el perro duerme bajo la mesa mientras el gato mira la calle", "es"),
        (3, "der hund schlaeft unter dem tisch waehrend die katze zusieht", "de"),
        (4, "il cane dorme sotto il tavolo mentre il gatto guarda la strada", "it"),
        (5, "o cachorro dorme debaixo da mesa enquanto o gato olha a rua", "pt"),
        (6, "de hond slaapt onder de tafel terwijl de kat naar buiten kijkt", "nl"),
        (7, "собака спит под столом пока кошка смотрит в окно на улицу", "ru"),
        (8, "الكلب ينام تحت الطاولة بينما القطة تنظر الى الشارع", "ar"),
        # unsegmented zh/ja: NO spaces at all — the regression the
        # stopword tier can never pass
        (9, "小狗在桌子下面睡觉而猫咪正看着外面的街道", "zh"),
        (10, "犬はテーブルの下で眠り猫は外の通りを見ています", "ja"),
        (11, "강아지는 테이블 아래에서 자고 고양이는 거리를 본다", "ko"),
        (12, "", "und"),
        (13, None, "und"),
        (14, "   \n\t ", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in planted], "doc_id long, text string"
    )
    got = {
        r["id"]: r["predicted_lang"]
        for r in language_id(df, strategy="ngram").collect()
    }
    for i, _, want in planted:
        assert got[i] == want, (i, got[i], want)


@pytest.mark.slow
def test_langid_eval_macro_accuracy_floor(spark):
    """The acceptance bar for seed/featurizer changes: macro accuracy
    on the built-in held-out corpus (disjoint from the seeds, weighted
    toward the close pairs pt/es, nl/de, es/it) must stay >= 0.95, and
    NO confusion may ever cross scripts (a Latin/CJK/Cyrillic/Arabic
    mixup would mean the featurizer itself broke, not just a close
    pair). Measured at round 9: 0.9792 (one pt->it miss); recorded in
    COVERAGE.md."""
    from sparvi_core_spark.functions.text import langid_eval

    r = langid_eval(spark)
    assert r["n"] == 48
    assert r["macro_accuracy"] >= 0.95, r
    script = {
        "en": "latin", "fr": "latin", "es": "latin", "de": "latin",
        "it": "latin", "pt": "latin", "nl": "latin",
        "ru": "cyrillic", "ar": "arabic",
        "zh": "cjk", "ja": "cjk", "ko": "hangul",
    }
    cross = [
        (t, p, n) for t, p, n in r["confusions"]
        if script[t] != script.get(p, "?")
    ]
    assert not cross, cross


def test_langid_public_corpus_recipe(spark):
    """The data recipe end-to-end on the checked-in 28-language sample
    (data/langid_sample): train_langid_from_dir on train/, langid_eval
    on heldout/ (disjoint, n=8 per language — one sentence is a 0.125
    step, not 0.25).  Pins: >= 25 languages, macro accuracy >= 0.95,
    and zero CROSS-SCRIPT confusions (close-pair misses inside a
    script — pt/it, da/de/nl/sv, cs/pl — are the honest residual of a
    tiny parallel corpus; a Latin/CJK/Cyrillic mixup would mean the
    featurizer broke).  Measured at round 10: macro 0.9821 (4 misses /
    224: da->de, da->nl, pt->it, cs->it); round 11 added one
    function-word-heavy training sentence each to da/pt/cs and
    measured macro 0.9955 (1 miss / 224: da->de) — this corpus is now
    the DEFAULT language_id model, so the floors below gate the
    no-model path every user gets."""
    import os

    from sparvi_core_spark.functions.text import (
        LANGID_SAMPLE_DIR,
        langid_eval,
        load_langid_corpus,
        train_langid_from_dir,
    )

    heldout = load_langid_corpus(os.path.join(LANGID_SAMPLE_DIR, "heldout"))
    assert len(heldout) >= 25
    assert all(len(v) >= 8 for v in heldout.values())
    model = train_langid_from_dir(
        spark, os.path.join(LANGID_SAMPLE_DIR, "train")
    )
    r = langid_eval(spark, heldout=heldout, model=model)
    assert r["n"] == sum(len(v) for v in heldout.values())
    assert r["macro_accuracy"] >= 0.95, r
    script = {
        "en": "latin", "es": "latin", "fr": "latin", "de": "latin",
        "it": "latin", "pt": "latin", "nl": "latin", "pl": "latin",
        "cs": "latin", "ro": "latin", "hu": "latin", "fi": "latin",
        "sv": "latin", "da": "latin", "tr": "latin", "id": "latin",
        "vi": "latin", "sw": "latin",
        "ru": "cyrillic", "uk": "cyrillic",
        "ar": "arabic", "he": "hebrew", "el": "greek", "th": "thai",
        "hi": "devanagari", "zh": "cjk", "ja": "cjk", "ko": "hangul",
    }
    cross = [
        (t, p, n) for t, p, n in r["confusions"]
        if script[t] != script.get(p, "?")
    ]
    assert not cross, cross
    # the close pairs the parallel corpus exists to stress stay usable
    # (da was the round-10 0.75 cell; its targeted training sentence
    # lifted it to the same floor as the rest)
    for lang in ("pt", "es", "it", "da", "sv", "cs", "pl", "ru", "uk"):
        assert r["per_lang"][lang] >= 0.875, (lang, r["per_lang"][lang])


def test_load_langid_corpus_shape(tmp_path):
    """Loader contract: stem = label, one sentence per line, comments
    and blanks skipped, text lowercased, non-txt files ignored."""
    from sparvi_core_spark.functions.text import load_langid_corpus

    (tmp_path / "xx.txt").write_text(
        "# a comment\nFirst Sentence\n\n  second one  \n", encoding="utf-8"
    )
    (tmp_path / "notes.md").write_text("ignored", encoding="utf-8")
    got = load_langid_corpus(str(tmp_path))
    assert got == {"xx": ["first sentence", "second one"]}
    import pytest as _pytest

    (tmp_path / "empty").mkdir()
    with _pytest.raises(ValueError, match="no .*language files"):
        load_langid_corpus(str(tmp_path / "empty"))


def test_language_id_stopword_zh_limitation_documented(spark):
    """The stopword tier's documented blind spot: unsegmented zh falls
    to 'und'; the ngram tier on the SAME doc returns 'zh'."""
    df = spark.createDataFrame(
        [(0, "这是一个没有任何空格的中文句子所以按词匹配永远失败")],
        "doc_id long, text string",
    )
    stop = language_id(df, strategy="stopword").collect()[0]["predicted_lang"]
    ngram = language_id(df, strategy="ngram").collect()[0]["predicted_lang"]
    assert stop == "und"
    assert ngram == "zh"


def test_quality_features(texts):
    got = {r["id"]: r for r in quality_features(texts).collect()}
    assert got[0]["n_tokens"] == 12
    assert got[0]["punct_ratio"] == 0.0
    assert got[0]["stopword_ratio"] > 0.3
    assert got[5]["punct_ratio"] > 0.2
    # clean english text scores above punctuation soup
    assert got[0]["quality_score"] > got[5]["quality_score"]


def test_token_counts(texts):
    got = {r["id"]: r for r in token_counts(texts).collect()}
    assert got[0]["ws_tokens"] == 12
    assert got[0]["bpe_ish_tokens"] == 12  # plain words
    # punctuation expands under BPE-ish tokenization
    assert got[5]["bpe_ish_tokens"] > got[5]["ws_tokens"]


def test_whitespace_tokenization_newline_boundary(spark):
    """Words separated by newlines/tabs are separate tokens (the
    published Gopher/C4 whitespace contract — regression for the round-7
    single-space split that merged them across line boundaries)."""
    from sparvi_core_spark.functions.text import gopher_quality_flags

    df = spark.createDataFrame(
        [(0, "foo\nbar baz"), (1, "a\tb\r\nc   d")],
        "doc_id long, text string",
    )
    toks = {r["id"]: r for r in token_counts(df).collect()}
    assert toks[0]["ws_tokens"] == 3
    assert toks[1]["ws_tokens"] == 4
    feats = {r["id"]: r for r in quality_features(df).collect()}
    assert feats[0]["n_tokens"] == 3
    # avg_token_len excludes ALL whitespace: "foobarbaz" / 3 tokens
    assert feats[0]["avg_token_len"] == 3.0
    g = {r["id"]: r for r in gopher_quality_flags(df).collect()}
    assert g[0]["n_words"] == 3
    assert g[0]["mean_word_len"] == 3.0


def test_fingerprints_stability(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # identical
        (2, "totally different words in this one right here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert len(got[0]) == 32


def test_quality_features_empty_doc(spark):
    """Empty / whitespace-only docs get zeroed features, not a
    divide-by-zero error (ANSI mode)."""
    from sparvi_core_spark.functions.text import quality_features

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the cat sat")], "doc_id long, text string"
    )
    got = {r["id"]: r.asDict() for r in quality_features(df).collect()}
    assert got[1]["n_tokens"] == 0
    assert got[1]["avg_token_len"] == 0.0
    assert got[1]["stopword_ratio"] == 0.0
    assert got[2]["n_tokens"] == 0
    assert got[3]["n_tokens"] == 3


def test_histogram_empty_input(spark):
    """All-null / empty column → empty histogram frame with the output
    schema, instead of a TypeError on float(None)."""
    from sparvi_core_spark.functions.stats import histogram

    empty = spark.createDataFrame([], "x double")
    out = histogram(empty, "x", bins=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["bin", "bin_lo", "bin_hi", "count"]

    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    assert histogram(allnull, "x", bins=5).count() == 0


def test_redact_pii(spark):
    from sparvi_core_spark.functions.text import redact_documents

    rows = [
        (0, "mail me at jane.doe+spam@example.co.uk or call +15551234567"),
        (1, "server 192.168.0.1 failed; backup at 10.0.255.254 ok"),
        (2, "ssn 123-45-6789 phone 555-123-4567 and 555.123.4567"),
        (3, "no pii here, just 3.14 and v1.2 and a-b-c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["text"] for r in redact_documents(df).collect()}
    assert got[0] == "mail me at <EMAIL> or call <PHONE>"
    assert got[1] == "server <IP> failed; backup at <IP> ok"
    assert got[2] == "ssn <SSN> phone <PHONE> and <PHONE>"
    assert got[3] == rows[3][1]  # untouched


def test_repetition_stats(spark):
    from sparvi_core_spark.functions.text import repetition_stats

    doc0 = "spam spam spam spam"                      # one line, top gram "spam spam" x3
    doc1 = "a b\nc d\na b\n\n  \nc d\na b"            # 5 non-empty lines: a b x3, c d x2
    doc2 = "unique words only here"                   # no repetition
    doc3 = ""                                         # empty
    df = spark.createDataFrame(
        list(enumerate([doc0, doc1, doc2, doc3])), "doc_id long, text string"
    )
    got = {r["id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert len(got) == 4

    assert got[0]["n_lines"] == 1
    assert got[0]["dup_line_frac"] == 0.0
    assert got[0]["top_gram"] == "spam spam"
    assert got[0]["top_gram_count"] == 3
    # 3 occurrences x 9 chars / 19 chars total
    assert got[0]["top_gram_char_frac"] == round(27 / 19, 4)

    # doc1: 5 line occurrences, 2 distinct -> 3 beyond-first
    assert got[1]["n_lines"] == 5
    assert got[1]["dup_line_frac"] == round(3 / 5, 4)
    # beyond-first chars: 2x"a b" + 1x"c d" = 9 of 15 line chars
    assert got[1]["dup_line_char_frac"] == round(9 / 15, 4)

    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_gram_count"] == 1

    assert got[3]["n_lines"] == 0
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_gram"] is None
    assert got[3]["top_gram_char_frac"] == 0.0


def test_equi_height_histogram_crafted(spark):
    """Heavy-tailed data: equal-width would put ~all mass in bin 0;
    equi-height must spread it evenly. Exact counts pinned."""
    from sparvi_core_spark.functions.stats import equi_height_histogram

    # 1..80 plus 4 extreme outliers
    vals = list(range(1, 81)) + [10_000, 20_000, 30_000, 40_000]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = equi_height_histogram(df, "x", bins=4).orderBy("bin").collect()
    assert [r["bin"] for r in out] == [0, 1, 2, 3]
    assert sum(r["count"] for r in out) == 84
    assert max(r["count"] for r in out) - min(r["count"] for r in out) <= 1
    assert out[0]["bin_lo"] is None and out[-1]["bin_hi"] is None
    # boundaries ascend and interior edges agree between adjacent bins
    assert out[1]["bin_lo"] == out[0]["bin_hi"]
    assert out[2]["bin_lo"] == out[1]["bin_hi"]


def test_equi_height_histogram_empty_and_approx(spark):
    from sparvi_core_spark.functions.stats import equi_height_histogram

    allnull = spark.createDataFrame([(None,)], "x double")
    assert equi_height_histogram(allnull, "x", bins=5).count() == 0

    df = spark.range(10_000).selectExpr("cast(id as double) as x")
    out = equi_height_histogram(df, "x", bins=10, approx=True).collect()
    assert sum(r["count"] for r in out) == 10_000
    # GK sketch rank error ~1/accuracy → each bin within a tight band
    assert all(abs(r["count"] - 1000) <= 50 for r in out)


def test_psi_drift_semantics(spark):
    from sparvi_core_spark.functions.stats import psi_drift

    ref = spark.range(10_000).selectExpr("cast(id % 1000 as double) as x")
    same = spark.range(5_000).selectExpr("cast(id % 1000 as double) as x")
    shifted = spark.range(10_000).selectExpr(
        "cast(500 + (id % 1000) * 2 as double) as x"
    )
    stable = psi_drift(ref, same, "x", bins=10).first()
    assert stable["psi"] < 0.01 and stable["n_ref"] == 10_000 and stable["n_cur"] == 5_000
    drifted = psi_drift(ref, shifted, "x", bins=10).first()
    assert drifted["psi"] > 0.25

    allnull = spark.createDataFrame([(None,)], "x double")
    assert psi_drift(allnull, ref, "x").count() == 0


def test_psi_drift_report_matches_per_column(spark):
    """The batched multi-column report must equal per-column psi_drift
    exactly (same boundaries, same smoothing, same rounding)."""
    from sparvi_core_spark.functions.stats import psi_drift, psi_drift_report

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cur = li.filter("l_discount > 0.05")
    cols = ["l_extendedprice", "l_quantity", "l_discount"]
    report = {
        r["column"]: (r["psi"], r["n_ref"], r["n_cur"])
        for r in psi_drift_report(li, cur, columns=cols, bins=8).collect()
    }
    assert set(report) == set(cols)
    for c in cols:
        single = psi_drift(li, cur, c, bins=8).first()
        assert report[c] == (single["psi"], single["n_ref"], single["n_cur"]), c


def test_psi_drift_report_defaults_and_empty(spark):
    from sparvi_core_spark.functions.stats import psi_drift_report

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "s string, x double")
    rep = psi_drift_report(df, df).collect()
    assert [r["column"] for r in rep] == ["x"]  # string col skipped
    assert rep[0]["psi"] == 0.0

    strings_only = df.select("s")
    assert psi_drift_report(strings_only, strings_only).count() == 0


def test_ks_drift_semantics(spark):
    from sparvi_core_spark.functions.stats import ks_drift

    ref = spark.range(20_000).selectExpr("cast(id % 1000 as double) as x")
    same = spark.range(10_000).selectExpr("cast(id % 1000 as double) as x")
    stable = ks_drift(ref, same, "x", bins=100).first()
    assert stable["ks"] < 0.02

    # shift by half the range: exact KS = 0.5; binned reads ~0.5
    shifted = spark.range(10_000).selectExpr(
        "cast(500 + id % 1000 as double) as x"
    )
    moved = ks_drift(ref, shifted, "x", bins=100).first()
    assert 0.45 <= moved["ks"] <= 0.52, moved["ks"]

    allnull = spark.createDataFrame([(None,)], "x double")
    assert ks_drift(allnull, ref, "x").count() == 0


def test_mutual_information_semantics(spark):
    from sparvi_core_spark.functions.stats import mutual_information
    import math

    # independent: x = id%4, y = (id//4)%4 over a full factorial grid
    ind = spark.range(1600).selectExpr(
        "cast(id % 4 as string) as x", "cast((id div 4) % 4 as string) as y"
    )
    r = mutual_information(ind, "x", "y").first()
    assert abs(r["mi"]) < 1e-9
    assert abs(r["h_x"] - math.log(4)) < 1e-6

    # functional: y = f(x) → MI = H(x) = H(y)
    fn = spark.range(1000).selectExpr(
        "cast(id % 5 as string) as x", "cast((id % 5) * 2 as string) as y"
    )
    r2 = mutual_information(fn, "x", "y").first()
    assert abs(r2["mi"] - r2["h_x"]) < 1e-6
    assert abs(r2["mi"] - math.log(5)) < 1e-6

    # nulls on either side excluded
    withnull = spark.createDataFrame(
        [("a", "p"), ("a", None), (None, "q"), ("b", "q")], "x string, y string"
    )
    assert mutual_information(withnull, "x", "y").first()["n"] == 2


def test_chi2_independence_semantics(spark):
    from sparvi_core_spark.functions.stats import chi2_independence

    # perfectly independent factorial grid → chi2 exactly 0
    ind = spark.range(1600).selectExpr(
        "cast(id % 4 as string) as x", "cast((id div 4) % 4 as string) as y"
    )
    r = chi2_independence(ind, "x", "y").first()
    assert r["chi2"] == 0.0 and r["dof"] == 9 and r["n"] == 1600

    # y = x (perfect association): chi2 = n * (k-1); includes the
    # zero-observed off-diagonal cells (missing-cell accounting)
    fn = spark.range(900).selectExpr(
        "cast(id % 3 as string) as x", "cast(id % 3 as string) as y"
    )
    r2 = chi2_independence(fn, "x", "y").first()
    assert abs(r2["chi2"] - 900 * 2) < 1e-6 and r2["dof"] == 4


def test_strip_markup_hand_checked(spark):
    from sparvi_core_spark.functions.text import extract_text

    rows = [
        (1, "<html><body><p>Hello <b>world</b></p></body></html>"),
        (2, "before<script type=\"text/js\">var x = '<p>';\nalert(1)</script>after"),
        (3, "<style>p { color: red; }</style>Styled"),
        (4, "<!-- note\nspanning lines -->kept"),
        (5, "Tom &amp; Jerry &lt;3 &quot;quotes&quot; &#39;s&nbsp;end"),
        (6, "no markup at all"),
        (7, "broken <tag never closes"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r["extracted"] for r in extract_text(df).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "before after"
    assert got[3] == "Styled"
    assert got[4] == "kept"
    assert got[5] == "Tom & Jerry <3 \"quotes\" 's end"
    assert got[6] == "no markup at all"
    # malformed tag: never-closed '<tag ...' has no '>' so the tag
    # regex can't match — content kept (the documented bias)
    assert got[7] == "broken <tag never closes"


def test_vocab_coverage_hand_checked(spark):
    from sparvi_core_spark.functions.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], ["doc_id", "text"]
    )
    # counts: a=4, b=3, c=1, d=1 (tie c<d) — total 9
    rows = {r["k"]: r for r in vocab_coverage(df, [1, 2, 3, 10]).collect()}
    assert rows[1]["covered_tokens"] == 4
    assert rows[2]["covered_tokens"] == 7
    assert rows[3]["covered_tokens"] == 8
    assert rows[10]["covered_tokens"] == 9
    assert rows[10]["vocab_terms"] == 4  # vocab smaller than k
    assert rows[2]["coverage"] == pytest.approx(7 / 9, abs=1e-6)
    with pytest.raises(ValueError):
        vocab_coverage(df, [])


# ---------------------------------------------------------------------------
# Gopher / MassiveText quality rules
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from sparvi_core_spark.functions.text import (  # noqa: E402
    GOPHER_BULLETS,
    GOPHER_REQUIRED_WORDS,
    gopher_quality_flags,
)


def _py_gopher_stats(text):
    """Independent Python twin of the raw statistics (unrounded)."""
    import re as _re

    words = text.split()  # any-whitespace split, empties dropped (= \s+)
    wd = max(len(words), 1)
    mean_wl = sum(len(w) for w in words) / wd
    hashes = text.count("#")
    ellipses = len(_re.findall(r"\.\.\.|…", text))
    symbol_ratio = (hashes + ellipses) / wd
    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln != ""]
    ld = max(len(lines), 1)
    bullet = sum(1 for ln in lines if ln[:1] in GOPHER_BULLETS) / ld
    ell = sum(1 for ln in lines if ln.endswith("...") or ln.endswith("…")) / ld
    alpha = sum(1 for w in words if _re.search("[A-Za-z]", w)) / wd
    req = len({w.lower() for w in words} & set(GOPHER_REQUIRED_WORDS))
    return {
        "n_words": len(words),
        "mean_word_len": mean_wl,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet,
        "ellipsis_line_frac": ell,
        "alpha_word_frac": alpha,
        "required_word_hits": req,
    }


def test_gopher_matches_python_twin_on_corpus(spark, views):
    """Parity on the organic documents corpus with planted suffixes
    that exercise every rule's numerator."""
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.lit("\n- bullet item\n* another"))
            .when(F.col("doc_id") % 4 == 1, F.lit(" ### ### trailing..."))
            .when(F.col("doc_id") % 4 == 2, F.lit("\nends with dots...\n…"))
            .otherwise(F.lit(" the of and that")),
        ).alias("text"),
    )
    got = {r["id"]: r.asDict() for r in gopher_quality_flags(planted).collect()}
    rows = planted.collect()
    assert len(got) == len(rows)
    for r in rows:
        want = _py_gopher_stats(r["text"])
        g = got[r["doc_id"]]
        assert g["n_words"] == want["n_words"]
        assert g["required_word_hits"] == want["required_word_hits"]
        for k in (
            "mean_word_len",
            "symbol_word_ratio",
            "bullet_line_frac",
            "ellipsis_line_frac",
            "alpha_word_frac",
        ):
            assert abs(g[k] - want[k]) <= 6e-5, (r["doc_id"], k)


def test_gopher_flags_consistent_with_emitted_stats(spark, views):
    """Booleans are exactly reproducible from the emitted (rounded)
    stats with the default thresholds."""
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    for g in gopher_quality_flags(docs).collect():
        assert g["ok_word_count"] == (50 <= g["n_words"] <= 100_000)
        assert g["ok_mean_word_len"] == (3.0 <= g["mean_word_len"] <= 10.0)
        assert g["ok_symbol_ratio"] == (g["symbol_word_ratio"] <= 0.10)
        assert g["ok_bullet_lines"] == (g["bullet_line_frac"] <= 0.10)
        assert g["ok_ellipsis_lines"] == (g["ellipsis_line_frac"] <= 0.30)
        assert g["ok_alpha_words"] == (g["alpha_word_frac"] >= 0.80)
        assert g["ok_required_words"] == (g["required_word_hits"] >= 2)
        assert g["passes_gopher"] == all(
            g[k]
            for k in (
                "ok_word_count",
                "ok_mean_word_len",
                "ok_symbol_ratio",
                "ok_bullet_lines",
                "ok_ellipsis_lines",
                "ok_alpha_words",
                "ok_required_words",
            )
        )


def test_gopher_rule_fixtures(spark):
    """Each rule trips on a document engineered to fail exactly it."""
    good = (
        "the quick brown fox jumps with the dog and that they have to be "
        "of note here today " * 5
    ).strip()
    cases = [
        (1, good, True),
        (2, "the of and that have", False),  # too few words
        (3, good + " " + "x" * 2000, False),  # mean word len > 10
        (4, good + " ###" * 20, False),  # symbol ratio
        (5, good + "\n" + "\n".join("- b" for _ in range(40)), False),
        (6, good + "\n" + "\n".join("x..." for _ in range(40)), False),
        (7, good + " " + "123 456 789 " * 30, False),  # alpha frac
        (8, ("cat dog bird fish " * 20).strip(), False),  # required words
    ]
    df = spark.createDataFrame(cases, ["doc_id", "text", "want"])
    got = {
        r["id"]: r["passes_gopher"]
        for r in gopher_quality_flags(df).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, i


def test_gopher_null_and_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "short text only")], ["doc_id", "text"]
    )
    rows = {r["id"]: r for r in gopher_quality_flags(df).collect()}
    assert rows[1]["passes_gopher"] is None  # NULL text -> NULL flags
    assert df.count() == 2
    # a NULL never survives a filter
    assert (
        gopher_quality_flags(df).filter("passes_gopher").count() == 0
    )
    # loosened thresholds flip the short doc to passing
    loose = gopher_quality_flags(
        df,
        min_words=1,
        min_required_words=0,
        min_alpha_word_frac=0.0,
    ).filter("passes_gopher")
    assert [r["id"] for r in loose.collect()] == [2]


# ---------------------------------------------------------------------------
# Gopher repetition table
# ---------------------------------------------------------------------------

from sparvi_core_spark.functions.text import (  # noqa: E402
    GOPHER_REPETITION_THRESHOLDS,
    gopher_repetition_flags,
)


def _py_rep_stats(text):
    """Independent Python twin (unrounded, pre-cap) of the repetition
    statistics."""
    from collections import Counter

    chars = max(len(text), 1)
    words = text.split()  # any-whitespace split, empties dropped (= \s+)

    def unit_fracs(sep):
        units = [u.strip() for u in text.split(sep)]
        units = [u for u in units if u]
        c = Counter(units)
        occ = sum(c.values())
        dup_occ = sum(v - 1 for v in c.values())
        dup_chars = sum((v - 1) * len(k) for k, v in c.items())
        all_chars = sum(v * len(k) for k, v in c.items())
        return dup_occ / max(occ, 1), dup_chars / max(all_chars, 1)

    out = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = unit_fracs("\n")
    out["dup_para_frac"], out["dup_para_char_frac"] = unit_fracs("\n\n")
    for n in range(2, 11):
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        c = Counter(grams)
        if n <= 4:
            key = f"top_{n}gram_char_frac"
            if c:
                cnt, gchars, _ = max(
                    (v, v * len(k), k) for k, v in c.items()
                )
                # gchars == cnt*len(gram): the top gram's character mass
                out[key] = min(gchars / chars, 1.0) if cnt >= 2 else 0.0
            else:
                out[key] = 0.0
        else:
            dup = sum(v * len(k) for k, v in c.items() if v > 1)
            out[f"dup_{n}gram_char_frac"] = min(dup / chars, 1.0)
    return out


def test_repetition_matches_python_twin_on_corpus(spark, views):
    docs = spark.table("documents").filter(F.col("doc_id") < 150)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit("\nrepeated line\nrepeated line\nrepeated line"))
            .when(F.col("doc_id") % 5 == 1,
                   F.lit(" spam phrase here " * 8))
            .when(F.col("doc_id") % 5 == 2,
                   F.lit("\n\nsame para\n\nsame para"))
            .when(F.col("doc_id") % 5 == 3,
                   F.lit(" one two three four five six " * 3))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    got = {r["id"]: r.asDict() for r in gopher_repetition_flags(planted).collect()}
    for r in planted.collect():
        want = _py_rep_stats(r["text"])
        g = got[r["doc_id"]]
        for k, v in want.items():
            assert g[k] == pytest.approx(v, abs=6e-5), (r["doc_id"], k)
        # flags reproducible from emitted stats
        for k, th in GOPHER_REPETITION_THRESHOLDS.items():
            assert g[f"ok_{k}"] == (g[k] <= th), (r["doc_id"], k)
        assert g["passes_repetition"] == all(
            g[f"ok_{k}"] for k in GOPHER_REPETITION_THRESHOLDS
        )


def test_repetition_fixtures(spark):
    rows = [
        (1, "the striped cat sat on the little mat with some dignity"),
        (2, "x\n" * 50),                       # dup lines
        (3, ("chunk of text\n\n" * 10).strip()),  # dup paras (and lines)
        (4, "a b c d e f g h i j " * 10),      # dup 5..10-grams
        (5, None),
        (6, ""),
        (7, "one two"),                        # too short for most grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in gopher_repetition_flags(df).collect()}
    assert got[1]["passes_repetition"] is True
    assert got[1]["top_2gram_char_frac"] == 0.0  # nothing repeats
    assert got[2]["dup_line_frac"] == pytest.approx(49 / 50)
    assert got[2]["passes_repetition"] is False
    assert got[3]["dup_para_frac"] > 0.3 and not got[3]["ok_dup_para_frac"]
    assert got[4]["dup_5gram_char_frac"] == 1.0  # capped
    assert got[4]["passes_repetition"] is False
    assert got[5]["passes_repetition"] is None
    assert got[6]["passes_repetition"] is True   # empty: nothing repeats
    assert got[7]["dup_10gram_char_frac"] == 0.0


def test_repetition_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, "x\nx\ny\nz")], "doc_id long, text string"
    )
    strict = gopher_repetition_flags(df, thresholds={"dup_line_frac": 0.1})
    assert strict.collect()[0]["ok_dup_line_frac"] is False
    loose = gopher_repetition_flags(df, thresholds={"dup_line_frac": 0.9})
    assert loose.collect()[0]["ok_dup_line_frac"] is True
    with pytest.raises(ValueError):
        gopher_repetition_flags(df, thresholds={"nope": 0.5})


def test_repetition_single_scan_plan(spark):
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = (
        gopher_repetition_flags(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # all 11 granularities reduce inside ONE Arrow kernel pass
    # (round 11): the corpus relation appears once, and no corpus-wide
    # explode exists at all — only per-doc integers leave the kernel
    assert plan.count("LogicalRDD [doc_id") == 1
    assert plan.count("Generate explode") == 0
    assert "MapInPandas" in plan or "mapInPandas" in plan


# ---------------------------------------------------------------------------
# C4 cleaning rules
# ---------------------------------------------------------------------------

from sparvi_core_spark.functions.text import C4_TERMINALS, c4_clean  # noqa: E402


def _py_c4(text, min_wpl=5, min_sent=3, banned=("lorem ipsum", "{"),
           banned_words=("javascript",), badwords=None):
    if text is None:
        return None
    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    kept = []
    for ln in lines:
        toks = ln.split()
        low = ln.lower().split()
        if (
            any(ln.endswith(t) for t in C4_TERMINALS)
            and len(toks) >= min_wpl
            and not (set(low) & set(banned_words))
        ):
            kept.append(ln)
    cleaned = "\n".join(kept)
    import re as _re

    sent = len(_re.findall(r"[.!?]", cleaned))
    ok_sent = sent >= min_sent
    # page-level ban applies to the ORIGINAL text (as published)
    ok_banned = all(s not in text.lower() for s in banned)
    if badwords:
        toks = [t for t in _re.split(r"\s+", cleaned.lower()) if t]
        ok_bad = not (set(toks) & {w.lower() for w in badwords})
    else:
        ok_bad = True
    return {
        "text": cleaned,
        "n_lines_kept": len(kept),
        "n_lines_dropped": len(lines) - len(kept),
        "ok_sentences": ok_sent,
        "ok_banned": ok_banned,
        "ok_badwords": ok_bad,
        "passes_c4": ok_sent and ok_banned and ok_bad,
    }


def test_c4_fixtures(spark):
    good = (
        "This is a perfectly reasonable first sentence here.\n"
        "Here is another sentence with enough words too!\n"
        "And a third one to clear the sentence minimum?"
    )
    rows = [
        (1, good, True),
        (2, good + "\nshort line.\nno terminal punctuation here at all", True),
        (3, good + "\nEnable javascript to view this page today.", True),
        (4, good.replace("another", "lorem ipsum"), False),
        # a "{" anywhere in the ORIGINAL page kills it, even on a line
        # the line filter drops (published C4 behavior)
        (5, good + "\nfunction() { return 1; }", False),
        (6, "One sentence only, not enough of them here.", False),
        (7, None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {r["id"]: r.asDict() for r in c4_clean(df).collect()}
    for i, t, want in rows:
        assert got[i]["passes_c4"] is want, (i, got[i])
        twin = _py_c4(t)
        if twin is None:
            assert got[i]["text"] is None
            continue
        for k, v in twin.items():
            assert got[i][k] == v, (i, k)
    # the javascript line was dropped from doc 3's cleaned text
    assert "javascript" not in got[3]["text"]
    assert got[3]["n_lines_dropped"] == 1


def test_c4_matches_python_twin_on_corpus(spark, views):
    docs = spark.table("documents").filter(F.col("doc_id") < 150)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.lit(".\nGood closing line with plenty of words here."))
            .when(F.col("doc_id") % 4 == 1, F.lit("\nEnable javascript now please thanks."))
            .when(F.col("doc_id") % 4 == 2, F.lit(" lorem ipsum dolor."))
            .otherwise(F.lit(" { end")),
        ).alias("text"),
    )
    got = {r["id"]: r.asDict() for r in c4_clean(planted).collect()}
    for r in planted.collect():
        twin = _py_c4(r["text"])
        g = got[r["doc_id"]]
        for k, v in twin.items():
            assert g[k] == v, (r["doc_id"], k)


def test_c4_badwords_and_overrides(spark):
    good = (
        "The first sentence is long enough to survive easily.\n"
        "The second sentence also has the needed words.\n"
        "The third sentence closes out the minimum count."
    )
    df = spark.createDataFrame(
        [(1, good), (2, good + "\nThis line mentions zorblax quite clearly.")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in c4_clean(df, badwords=["zorblax"]).collect()}
    assert out[1]["passes_c4"] is True
    assert out[2]["passes_c4"] is False and out[2]["ok_badwords"] is False
    # loosened sentence minimum
    one = spark.createDataFrame(
        [(1, "Just one full sentence with enough words here.")],
        "doc_id long, text string",
    )
    assert c4_clean(one, min_sentences=1).collect()[0]["passes_c4"] is True


def test_c4_map_only_plan(spark):
    df = spark.createDataFrame([(1, "a.")], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_gopher_fuzz_bounds(spark):
    """Seeded fuzz over random text shapes: every emitted fraction
    stays in [0, 1] (the dup/top caps included) and counts are
    non-negative, across both Gopher bundles."""
    import random

    rng = random.Random(11)
    pieces = ["word", "the", "###", "...", "•", "-", "…", "\n", "\n\n",
              "a", "{", "xyzzy", "1234", "!"]
    rows = []
    for i in range(200):
        n = rng.randint(0, 60)
        rows.append((i, " ".join(rng.choice(pieces) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for g in gopher_quality_flags(df).collect():
        assert g["n_words"] >= 0 and g["required_word_hits"] >= 0
        for k in ("symbol_word_ratio",):
            assert g[k] >= 0.0
        for k in ("bullet_line_frac", "ellipsis_line_frac",
                  "alpha_word_frac"):
            assert 0.0 <= g[k] <= 1.0, (g["id"], k)
    for r in gopher_repetition_flags(df).collect():
        for k, v in r.asDict().items():
            if k.endswith("_frac"):
                assert 0.0 <= v <= 1.0, (r["id"], k, v)


def test_language_id_ngram_hashed_features(spark):
    """The hashing-trick mode (the 100 TB model-size bound) recovers
    the same languages on clearly-separated scripts."""
    from sparvi_core_spark.functions.text import language_id, train_langid

    model = train_langid(spark, num_features=1 << 15)
    df = spark.createDataFrame(
        [(0, "the dog sleeps under the table while the cat watches"),
         (1, "собака спит под столом пока кошка смотрит в окно"),
         (2, "犬はテーブルの下で眠り猫は外を見ています")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["predicted_lang"]
           for r in language_id(df, strategy="ngram", model=model).collect()}
    assert got[0] == "en" and got[1] == "ru" and got[2] == "ja"


# ---------------------------------------------------------------------------
# main_content (block-level link-density extraction)
# ---------------------------------------------------------------------------


def test_main_content_drops_chrome_keeps_prose(spark):
    from sparvi_core_spark.functions.text import main_content

    prose = ("This is the real article body with plenty of sentences and "
             "no links at all, long enough to clear the size floor easily.")
    half_links = ('Short menu <a href="/a">one</a> <a href="/b">two</a> '
                  '<a href="/c">three four five six</a>')
    html = (
        "<html><head><script>var x = 1 + 2;</script>"
        "<style>.x{color:red}</style></head><body>"
        '<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>'
        f"<div>{prose}</div>"
        f"<p>{half_links}</p>"
        '<p>Tiny.</p>'
        "<!-- a comment with enough text to pass the floor if leaked -->"
        '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    out = df.select(main_content("text").alias("m")).first()["m"]
    assert out == prose  # nav, link-dense menu, tiny block, footer, comment: gone


def test_main_content_entities_and_inline_links(spark):
    from sparvi_core_spark.functions.text import main_content

    html = ("<p>Fish &amp; chips are mostly prose here with one "
            '<a href="x">inline link</a> and enough surrounding text '
            "that the density stays low overall.</p>")
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    out = df.select(main_content("text").alias("m")).first()["m"]
    assert out.startswith("Fish & chips")
    assert "inline link" in out  # anchor TEXT survives; only density gates


def test_main_content_null_and_linkfarm(spark):
    from sparvi_core_spark.functions.text import main_content

    farm = "".join(f'<a href="/{i}">click here now please {i}</a> '
                   for i in range(20))
    df = spark.createDataFrame(
        [(1, None), (2, f"<div>{farm}</div>")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["m"]
            for r in df.select("doc_id",
                               main_content("text").alias("m")).collect()}
    assert rows[1] is None
    assert rows[2] == ""  # long but ~100% link chars -> dropped


def test_main_content_hard_wrapped_prose_is_one_block(spark):
    """Literal newlines in the HTML source (hard-wrapped prose,
    pretty-printed markup) are rendering whitespace, NOT block
    boundaries: a paragraph hard-wrapped into short source lines must
    survive as one block, and link density must be scored per block,
    not per source line (round-9 ADVICE fix)."""
    from sparvi_core_spark.functions.text import main_content

    # every source line is < 25 chars, so per-line splitting would
    # drop the whole paragraph; as one block it clears the floor
    wrapped = ("<p>The quick brown\nfox jumps over\nthe lazy dog and\n"
               "keeps on running\nacross the field.</p>")
    # pretty-printed markup: newlines between tags, one real paragraph
    pretty = ("<div>\n  <p>\n    A single real paragraph that is "
              "plenty long enough to keep.\n  </p>\n</div>")
    # a \x1e in the input must not fabricate a block boundary
    ctl = ("<p>Control char \x1e inside prose does not split this "
           "long-enough paragraph in two.</p>")
    df = spark.createDataFrame(
        [(1, wrapped), (2, pretty), (3, ctl)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["m"]
            for r in df.select("doc_id",
                               main_content("text").alias("m")).collect()}
    assert rows[1] == ("The quick brown fox jumps over the lazy dog and "
                       "keeps on running across the field.")
    assert rows[2] == ("A single real paragraph that is plenty long "
                       "enough to keep.")
    assert "\n" not in rows[3] and rows[3].startswith("Control char")
