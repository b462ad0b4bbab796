"""Naive Bayes classifier: hand-checked scores, planted-separation
predictions (exact + hashed features), tie/empty-doc semantics,
min_count pruning, and the broadcast-model plan pin. DuckDB value
parity lives in tests/test_oracle_parity.py::test_local_nb_parity."""

from __future__ import annotations

import math

import pytest

from sparvi_core_spark.operators.classify import (
    classify_nb,
    nb_filter,
    score_nb,
    train_nb,
)


@pytest.fixture(scope="module")
def seeds(spark):
    rows = [
        (1, "spam spam offer", "bad"),
        (2, "spam offer now", "bad"),
        (3, "paper results method", "good"),
        (4, "method results", "good"),
        (5, "results paper", "good"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_hand_checked_scores(spark, seeds):
    model = train_nb(seeds, "label")
    counts = {
        (r["label"], r["feature"]): r["n"] for r in model.counts.collect()
    }
    assert counts == {
        ("bad", "spam"): 3,
        ("bad", "offer"): 2,
        ("bad", "now"): 1,
        ("good", "paper"): 2,
        ("good", "results"): 3,
        ("good", "method"): 2,
    }
    classes = {r["label"]: r for r in model.classes.collect()}
    assert classes["bad"]["total"] == 6 and classes["bad"]["n_docs"] == 2
    assert classes["good"]["total"] == 7 and classes["good"]["n_docs"] == 3
    dims = model.dims.first()
    assert dims["d"] == 6 and dims["n_docs_all"] == 5

    probe = spark.createDataFrame([(10, "spam method")], ["doc_id", "text"])
    scored = {
        r["label"]: r["score"] for r in score_nb(probe, model, add_k=1.0).collect()
    }
    # bad: ln(2/5) + ln((3+1)/(6+6)) + ln((0+1)/(6+6))
    exp_bad = math.log(2 / 5) + math.log(4 / 12) + math.log(1 / 12)
    # good: ln(3/5) + ln((0+1)/(7+6)) + ln((2+1)/(7+6))
    exp_good = math.log(3 / 5) + math.log(1 / 13) + math.log(3 / 13)
    assert scored["bad"] == pytest.approx(exp_bad, abs=1e-6)
    assert scored["good"] == pytest.approx(exp_good, abs=1e-6)


def test_planted_separation_exact_and_hashed(spark, seeds):
    probes = spark.createDataFrame(
        [
            (10, "totally new spam offer text"),
            (11, "new paper with results"),
        ],
        ["doc_id", "text"],
    )
    for num_features in (None, 1 << 14):
        model = train_nb(seeds, "label", num_features=num_features)
        preds = {
            r["doc_id"]: r for r in classify_nb(probes, model).collect()
        }
        assert preds[10]["label"] == "bad"
        assert preds[11]["label"] == "good"
        assert preds[10]["margin"] > 0 and preds[11]["margin"] > 0


def test_empty_null_and_tie_docs(spark, seeds):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    probes = spark.createDataFrame([(20, ""), (21, None)], schema)
    model = train_nb(seeds, "label")
    preds = {r["doc_id"]: r for r in classify_nb(probes, model).collect()}
    # empty/NULL docs score on the prior alone: good has 3/5 of docs
    for did in (20, 21):
        assert preds[did]["label"] == "good"
        assert preds[did]["score"] == pytest.approx(math.log(3 / 5), abs=1e-6)
        assert preds[did]["margin"] == pytest.approx(
            math.log(3 / 5) - math.log(2 / 5), abs=1e-6
        )
    # a perfect tie breaks on label ascending: equal priors, empty doc
    even = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], ["doc_id", "text", "label"]
    )
    tied = classify_nb(
        spark.createDataFrame([(30, "")], schema), train_nb(even, "label")
    ).first()
    assert tied["label"] == "a" and tied["margin"] == 0.0


def test_min_count_prunes_but_keeps_totals(spark, seeds):
    model = train_nb(seeds, "label", min_count=2)
    feats = {r["feature"] for r in model.counts.collect()}
    assert "now" not in feats and "spam" in feats
    # totals were computed pre-prune: still 6/7
    classes = {r["label"]: r["total"] for r in model.classes.collect()}
    assert classes == {"bad": 6, "good": 7}
    # a pruned token scores as unseen for BOTH classes — not an error
    probe = spark.createDataFrame([(40, "now now")], ["doc_id", "text"])
    rows = score_nb(probe, model).collect()
    assert len(rows) == 2 and all(r["score"] is not None for r in rows)


def test_nb_filter_keeps_wanted_class(spark, seeds):
    corpus = spark.createDataFrame(
        [
            (50, "great spam offer deal"),
            (51, "the paper presents results and method"),
            (52, "results of the new method paper"),
        ],
        ["doc_id", "text"],
    )
    model = train_nb(seeds, "label")
    kept = nb_filter(corpus, model, "good").select("doc_id", "label").collect()
    assert {r["doc_id"] for r in kept} == {51, 52}
    assert all(r["label"] == "good" for r in kept)
    # margin threshold can empty the result without erroring
    none_kept = nb_filter(corpus, model, "good", min_margin=1e9)
    assert none_kept.count() == 0


def test_null_labels_dropped_and_broadcast_plan(spark, seeds):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("label", T.StringType()),
        ]
    )
    with_null = spark.createDataFrame(
        [(99, "spam spam spam", None)], schema
    ).union(seeds)
    model = train_nb(with_null, "label")
    assert {r["label"] for r in model.classes.collect()} == {"bad", "good"}
    # the unlabeled row trained nothing: spam count unchanged
    spam = {
        r["label"]: r["n"]
        for r in model.counts.filter("feature = 'spam'").collect()
    }
    assert spam == {"bad": 3}

    # broadcast_model=True with exact features runs the Arrow scoring
    # kernel — specifically MapInPandas with NO join of any kind; a
    # silent fallback to a join shape (or the reverse) must fail here,
    # not just a sort-merge
    plan = score_nb(
        seeds, model, broadcast_model=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan
    # the hashed-feature path scores through the kernel too (round 12:
    # NumPy xxhash64 twin); only over-cap or non-broadcast models keep
    # the join shape
    hashed = train_nb(with_null, "label", num_features=16)
    plan_h = score_nb(
        seeds, hashed, broadcast_model=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_h
    assert "Join" not in plan_h
    plan_nb = score_nb(
        seeds, hashed, broadcast_model=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_nb


def test_hashed_model_is_bounded(spark, seeds):
    model = train_nb(seeds, "label", num_features=8)
    # 8 buckets × 2 classes bounds the model regardless of vocabulary
    assert model.counts.count() <= 16
    assert model.dims.first()["d"] == 8
    # collisions change scores, never break scoring
    probe = spark.createDataFrame([(60, "spam offer spam")], ["doc_id", "text"])
    assert classify_nb(probe, model).count() == 1


def test_zero_class_model_scores_empty(spark, seeds):
    """A model trained on zero labeled rows has no classes: score_nb
    returns zero rows (the old crossJoin-with-no-labels result) and
    classify_nb returns its typed empty frame — neither may raise
    (the label-wide pivot's agg over zero label columns would)."""
    from pyspark.sql import functions as F

    unlabeled = seeds.withColumn(
        "label", F.lit(None).cast("string")
    )
    model = train_nb(unlabeled, "label")
    probe = spark.createDataFrame([(80, "anything at all")], ["doc_id", "text"])
    assert score_nb(probe, model).collect() == []
    preds = classify_nb(probe, model, with_tokens=True)
    assert preds.collect() == []
    assert preds.columns == ["doc_id", "label", "score", "margin", "n_tokens"]


def test_add_k_guard(seeds):
    model = train_nb(seeds, "label")
    with pytest.raises(ValueError, match="add_k"):
        score_nb(seeds, model, add_k=0)


@pytest.mark.slow
def test_merge_equals_joint_retrain(spark, seeds):
    from sparvi_core_spark.operators.classify import merge_nb_models

    half_a = seeds.filter("doc_id <= 2")
    half_b = seeds.filter("doc_id > 2")
    for num_features in (None, 1 << 10):
        merged = merge_nb_models(
            train_nb(half_a, "label", num_features=num_features),
            train_nb(half_b, "label", num_features=num_features),
        )
        joint = train_nb(seeds, "label", num_features=num_features)
        probe = spark.createDataFrame(
            [(70, "spam paper results now")], ["doc_id", "text"]
        )
        got = {
            r["label"]: r["score"] for r in score_nb(probe, merged).collect()
        }
        want = {
            r["label"]: r["score"] for r in score_nb(probe, joint).collect()
        }
        assert got == want
    # mismatched feature spaces refuse loudly
    with pytest.raises(ValueError, match="feature spaces"):
        merge_nb_models(
            train_nb(half_a, "label"),
            train_nb(half_b, "label", num_features=8),
        )


# ---------------------------------------------------------------------------
# char-n-gram analyzer (round 8 — the language-ID featurizer)
# ---------------------------------------------------------------------------


def test_char_analyzer_features_hand_checked(spark):
    """Char grams over the normalized text: lowercase, whitespace runs
    collapsed to one space, overlapping grams of every requested size."""
    from sparvi_core_spark.operators.classify import _features
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "Ab  c"), (2, ""), (3, None)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", _features("text", None, "char", (1, 2)).alias("f")
    ).collect()}
    # normalized "ab c": 1-grams a,b,' ',c then 2-grams ab,'b ',' c'
    assert got[1] == ["a", "b", " ", "c", "ab", "b ", " c"]
    assert got[2] == []
    assert got[3] is None


def test_char_analyzer_separates_unsegmented_scripts(spark):
    """A char-gram model separates spaceless zh from en — the word
    analyzer cannot (every zh doc is a single unseen token)."""
    rows = [
        (1, "the cat sat on the mat near the door", "en"),
        (2, "a dog ran in the park with the kids", "en"),
        (3, "这是一个中文句子没有空格", "zh"),
        (4, "中文文本通常不使用空格分词", "zh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    model = train_nb(df, "label", analyzer="char", char_n=(1, 2))
    test = spark.createDataFrame(
        [(10, "the cat ran in the park"), (11, "另一个没有空格的中文例子")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["label"] for r in classify_nb(test, model).collect()}
    assert got[10] == "en" and got[11] == "zh"


def test_char_analyzer_guards(spark, seeds):
    from sparvi_core_spark.operators.classify import _features, merge_nb_models

    with pytest.raises(ValueError, match="analyzer"):
        _features("text", None, "bogus")
    with pytest.raises(ValueError, match="char_n"):
        _features("text", None, "char", (0,))
    with pytest.raises(ValueError, match="featurizers"):
        merge_nb_models(
            train_nb(seeds, "label", analyzer="char", char_n=2),
            train_nb(seeds, "label", analyzer="word"),
        )
