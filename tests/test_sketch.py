"""KMV bottom-k set sketches (`operators/sketch.py`).

Pinned from both ends: BELOW saturation every number (distinct,
Jaccard, containment) must be EXACT against a pure-Python set twin
and a DuckDB oracle on the real documents table; ABOVE saturation the
estimators must land inside the published ~1/√k error envelope on a
corpus 40× the sketch size. Merge ≡ joint build value-for-value
(partition-order independence comes free from the set semantics),
salt mismatch refuses comparison, NULL keys are not members.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.sketch import (
    KMVSketch,
    corpus_overlap,
    kmv_jaccard,
    kmv_overlap_report,
    kmv_sketch,
    merge_kmv,
)


@pytest.fixture(scope="module")
def two_corpora(spark):
    """Key sets with known overlap: A = 0..599, B = 400..999 →
    |A|=600, |B|=600, |A∩B|=200, |A∪B|=1000, J=0.2."""
    a = spark.range(0, 600).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    b = spark.range(400, 1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    return a, b


def test_exact_regime_matches_sets(spark, two_corpora):
    a_df, b_df = two_corpora
    a = kmv_sketch(a_df, "key", k=4096)
    b = kmv_sketch(b_df, "key", k=4096)
    assert not a.saturated and not b.saturated
    assert a.distinct_estimate() == 600.0
    assert b.distinct_estimate() == 600.0
    assert kmv_jaccard(a, b) == pytest.approx(0.2)
    rep = kmv_overlap_report(a, b)
    assert rep["distinct_union"] == 1000.0
    assert rep["distinct_intersection"] == pytest.approx(200.0)
    assert rep["containment_a_in_b"] == pytest.approx(200 / 600)
    assert rep["containment_b_in_a"] == pytest.approx(200 / 600)


def test_exact_regime_duckdb_oracle(spark, sf_dir):
    """corpus_overlap on the real documents table (en slice vs short
    docs) ≡ DuckDB exact set arithmetic, value-for-value in the
    unsaturated regime."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a_df = docs.filter(F.col("lang") == "en")
    b_df = docs.filter(F.length("text") < 600)
    got = {
        c: round(v, 9)
        for c, v in corpus_overlap(a_df, b_df, "doc_id", k=1 << 20)
        .collect()[0]
        .asDict()
        .items()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    da, db, inter, union = con.execute(
        """
        WITH a AS (SELECT DISTINCT doc_id FROM documents WHERE lang='en'),
             b AS (SELECT DISTINCT doc_id FROM documents
                   WHERE length(text) < 600)
        SELECT (SELECT count(*) FROM a),
               (SELECT count(*) FROM b),
               (SELECT count(*) FROM a WHERE doc_id IN (SELECT * FROM b)),
               (SELECT count(*) FROM (SELECT * FROM a UNION
                                      SELECT * FROM b))
        """
    ).fetchone()
    assert got["distinct_a"] == da
    assert got["distinct_b"] == db
    assert got["distinct_union"] == union
    assert got["distinct_intersection"] == pytest.approx(inter)
    assert got["jaccard"] == pytest.approx(inter / union)


def test_saturated_estimates_within_envelope(spark):
    """k=512 over 20k distinct keys: rel. std err ≈ 1/√510 ≈ 4.4%;
    assert 4σ-ish headroom (deterministic — hashes are seeded by the
    salt, so this is a fixed number, not a flaky draw)."""
    a_df = spark.range(0, 12000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("key")
    )
    b_df = spark.range(8000, 20000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("key")
    )
    a = kmv_sketch(a_df, "key", k=512)
    b = kmv_sketch(b_df, "key", k=512)
    assert a.saturated and b.saturated
    assert a.distinct_estimate() == pytest.approx(12000, rel=0.18)
    j = kmv_jaccard(a, b)  # true J = 4000/20000 = 0.2
    assert abs(j - 0.2) < 0.08
    rep = kmv_overlap_report(a, b)
    assert rep["distinct_union"] == pytest.approx(20000, rel=0.18)
    assert rep["distinct_intersection"] == pytest.approx(4000, rel=0.35)


def test_merge_equals_joint_build(spark, two_corpora):
    a_df, b_df = two_corpora
    a = kmv_sketch(a_df, "key", k=256)
    b = kmv_sketch(b_df, "key", k=256)
    joint = kmv_sketch(a_df.unionByName(b_df), "key", k=256)
    merged = merge_kmv(a, b)
    assert merged.values == joint.values
    assert merged.k == joint.k
    assert merged.n_rows == 1200


def test_merge_is_partitioning_independent(spark, two_corpora):
    a_df, _ = two_corpora
    one = kmv_sketch(a_df.repartition(1), "key", k=128)
    many = kmv_sketch(a_df.repartition(7), "key", k=128)
    assert one.values == many.values


def test_null_keys_skipped_and_multi_column(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3), ("b", None), ("a", 1)],
        ["s", "n"],
    )
    sk = kmv_sketch(df, ["s", "n"], k=64)
    assert sk.n_rows == 3  # two NULL-component rows skipped
    assert len(sk.values) == 2  # ("a",1) duplicate collapsed


def test_salt_mismatch_refuses(spark, two_corpora):
    a_df, b_df = two_corpora
    a = kmv_sketch(a_df, "key", k=64, salt="s1")
    b = kmv_sketch(b_df, "key", k=64, salt="s2")
    with pytest.raises(ValueError, match="salt"):
        kmv_jaccard(a, b)
    with pytest.raises(ValueError, match="salt"):
        merge_kmv(a, b)


def test_disjoint_and_identical_extremes(spark):
    a_df = spark.range(0, 500).select(F.col("id").alias("k"))
    b_df = spark.range(500, 1000).select(F.col("id").alias("k"))
    a = kmv_sketch(a_df, "k", k=64)
    b = kmv_sketch(b_df, "k", k=64)
    assert kmv_jaccard(a, b) == 0.0
    assert kmv_jaccard(a, a) == 1.0


def test_k_validation(spark, two_corpora):
    a_df, _ = two_corpora
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(a_df, "key", k=1)


def test_sketch_is_tiny_and_picklable(spark, two_corpora):
    import pickle

    a_df, _ = two_corpora
    sk = kmv_sketch(a_df, "key", k=256)
    blob = pickle.dumps(sk)
    assert len(blob) < 64 * 1024
    assert pickle.loads(blob) == sk


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _zipf_rows(n=4000, keys=200, seed=4):
    import random

    rnd = random.Random(seed)
    rows = []
    for _ in range(n):
        k = min(int(rnd.paretovariate(1.2)), keys)
        rows.append((f"k{k}",))
    return rows


def test_cms_never_underestimates_and_bounds_error(spark):
    from collections import Counter

    from sparvi_core_spark.operators.sketch import cms_build

    rows = _zipf_rows()
    true = Counter(r[0] for r in rows)
    df = spark.createDataFrame(rows, "key string")
    sk = cms_build(df, "key", depth=5, width=512)
    assert sk.n_items == len(rows)
    excesses = [sk.estimate(k) - c for k, c in true.items()]
    assert all(e >= 0 for e in excesses)  # the one-sided guarantee
    bound = sk.error_bound()
    within = sum(1 for e in excesses if e <= bound)
    assert within / len(excesses) >= 0.95


def test_cms_exact_when_wide(spark):
    from sparvi_core_spark.operators.sketch import cms_build

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3 + [("c",)], "key string"
    )
    sk = cms_build(df, "key", depth=4, width=4096)
    assert sk.estimate("a") == 7
    assert sk.estimate("b") == 3
    assert sk.estimate("c") == 1


def test_cms_merge_equals_union_build(spark):
    from sparvi_core_spark.operators.sketch import cms_build, merge_cms

    rows = _zipf_rows(n=1000)
    a = spark.createDataFrame(rows[:600], "key string")
    b = spark.createDataFrame(rows[600:], "key string")
    u = spark.createDataFrame(rows, "key string")
    sk = merge_cms(
        cms_build(a, "key", depth=3, width=128),
        cms_build(b, "key", depth=3, width=128),
    )
    want = cms_build(u, "key", depth=3, width=128)
    assert sk.counts == want.counts and sk.n_items == want.n_items


def test_cms_weighted_and_multicol(spark):
    from sparvi_core_spark.operators.sketch import cms_build

    df = spark.createDataFrame(
        [("a", "x", 5), ("a", "x", 2), ("a", "y", 1), (None, "x", 9)],
        "k1 string, k2 string, w long",
    )
    sk = cms_build(df, ["k1", "k2"], depth=4, width=1024, weight_col="w")
    assert sk.estimate("a", "x") == 7
    assert sk.estimate("a", "y") == 1
    assert sk.n_items == 8  # NULL-key row skipped


def test_cms_score_matches_driver_estimate(spark):
    """The Spark scoring path and the no-Spark Python path agree on
    every key — the md5-position parity that makes the sketch
    cross-engine-checkable."""
    from sparvi_core_spark.operators.sketch import cms_build, cms_score

    rows = _zipf_rows(n=1500, keys=80)
    df = spark.createDataFrame(rows, "key string")
    sk = cms_build(df, "key", depth=3, width=64)
    scored = {
        r["key"]: r["est"]
        for r in cms_score(df.select("key"), sk, "key").collect()
    }
    assert scored  # distinct keys collapse to one row each
    for k, est in scored.items():
        assert est == sk.estimate(k)


def test_cms_guards(spark):
    import pytest as _pytest

    from sparvi_core_spark.operators.sketch import cms_build, merge_cms

    df = spark.createDataFrame([("a",)], "key string")
    with _pytest.raises(ValueError, match="depth"):
        cms_build(df, "key", depth=0)
    a = cms_build(df, "key", depth=2, width=32)
    b = cms_build(df, "key", depth=2, width=64)
    with _pytest.raises(ValueError, match="mergeable"):
        merge_cms(a, b)


def test_cms_stream_store_equals_batch_build(spark, tmp_path):
    """Two-trigger streamed store merges to EXACTLY cms_build over the
    concatenated batches; a batch-range read isolates one batch."""
    from sparvi_core_spark.operators.sketch import cms_build
    from sparvi_core_spark.streaming.cms_stream import (
        cms_from_store,
        cms_stream_batches,
    )

    r1 = _zipf_rows(n=800, seed=5)
    r2 = _zipf_rows(n=700, seed=6)
    b1 = spark.createDataFrame(r1, "key string")
    b2 = spark.createDataFrame(r2, "key string")
    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2.coalesce(1).write.parquet(str(src / "b2"))

    store = str(tmp_path / "cms_store")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = cms_stream_batches(
        stream, "key", store, depth=3, width=128,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    merged = cms_from_store(spark, store)
    want = cms_build(
        spark.createDataFrame(r1 + r2, "key string"),
        "key", depth=3, width=128,
    )
    assert merged.counts == want.counts and merged.n_items == want.n_items

    only_b2 = cms_from_store(spark, store, min_batch_id=1)
    want_b2 = cms_build(b2, "key", depth=3, width=128)
    assert only_b2.counts == want_b2.counts

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stored batches"):
        cms_from_store(spark, store, min_batch_id=99)
