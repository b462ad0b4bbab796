"""Packed binary sketches + Hamming search
(operators/binary_sketch.py). No reference analog — training-data
extension surface. The cross-engine DuckDB parity for the search
kernel is the demoted pair ``hamming_topk`` in
tests/test_oracle_parity.py; here: engine equivalence, the NumPy
oracle, distance exactness, recall tripwires, and plan pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.binary_sketch import (
    binarize_embeddings,
    hamming_distance,
    hamming_near_pairs,
    hamming_topk,
    hamming_topk_rerank,
)
from sparvi_core_spark.operators.similarity import cosine_topk, srp_planes

DIM = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """120 vectors in 6 tight clusters (20 each) — near-neighbors are
    unambiguous, so recall assertions are stable, not luck."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, DIM)) * 4
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, [float(x) for x in c + rng.normal(size=DIM) * 0.2]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def test_engines_bit_identical_and_numpy_oracle(clustered):
    ex = {
        r["vec_id"]: r["sketch"]
        for r in binarize_embeddings(
            clustered, bits=128, seed=7, engine="expr"
        ).collect()
    }
    bl = {
        r["vec_id"]: r["sketch"]
        for r in binarize_embeddings(
            clustered, bits=128, seed=7, engine="blas"
        ).collect()
    }
    assert ex == bl
    planes = np.asarray(srp_planes(128, DIM, 7))
    vecs = {
        r["vec_id"]: np.array(r["embedding"]) for r in clustered.collect()
    }
    for vid, v in vecs.items():
        want = (
            np.packbits((v @ planes.T) >= 0, bitorder="little")
            .view("<i8")
            .tolist()
        )
        assert ex[vid] == want


def test_null_vector_sketches_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * DIM), (2, None)], f"vec_id long, embedding array<double>"
    )
    for eng in ("expr", "blas"):
        rows = {
            r["vec_id"]: r["sketch"]
            for r in binarize_embeddings(
                df, bits=64, seed=1, engine=eng, dim=DIM
            ).collect()
        }
        assert rows[1] is not None and rows[2] is None, eng


def test_auto_dispatch_and_guards(clustered):
    # small bits×dim → expr (no Python stage); large → blas (MapInPandas)
    small = binarize_embeddings(clustered, bits=64, seed=1, engine="auto")
    big = binarize_embeddings(clustered, bits=4096, seed=1, engine="auto")
    assert "MapInPandas" not in small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in big._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="multiple of 64"):
        binarize_embeddings(clustered, bits=100)
    with pytest.raises(ValueError, match="engine"):
        binarize_embeddings(clustered, bits=64, engine="gpu")
    with pytest.raises(ValueError, match="rerank"):
        hamming_topk_rerank(clustered, clustered, k=10, rerank=5)


def test_hamming_distance_exact(clustered):
    sk = binarize_embeddings(clustered, bits=128, seed=7).cache()
    words = {r["vec_id"]: r["sketch"] for r in sk.collect()}
    got = (
        sk.alias("a")
        .join(F.broadcast(sk.alias("b")), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.col("a.vec_id") < 4)
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            hamming_distance(F.col("a.sketch"), F.col("b.sketch")).alias("d"),
        )
        .collect()
    )
    assert got
    for r in got:
        want = sum(
            bin((x ^ y) & ((1 << 64) - 1)).count("1")
            for x, y in zip(words[r["ia"]], words[r["ib"]])
        )
        assert r["d"] == want


def test_topk_contract_and_cluster_recovery(clustered):
    sk = binarize_embeddings(clustered, bits=256, seed=7).cache()
    qs = sk.filter(F.col("vec_id").isin([0, 25, 50, 115]))
    res = hamming_topk(sk, qs, k=10).collect()
    assert len(res) == 40
    by_q = {}
    for r in res:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, hits in by_q.items():
        ranks = sorted(h["rank"] for h in hits)
        assert ranks == list(range(1, 11))
        dists = [h["distance"] for h in sorted(hits, key=lambda h: h["rank"])]
        assert dists == sorted(dists)
        # tight clusters: every top-10 neighbor is a same-cluster member
        for h in hits:
            assert h["neighbor_id"] // 20 == q // 20, (q, h)


@pytest.mark.slow
def test_rerank_recall_vs_exact_and_monotone_bits(clustered):
    qs_ids = [0, 21, 45, 66, 88, 101]
    exact = {}
    for r in cosine_topk(
        clustered, clustered.filter(F.col("vec_id").isin(qs_ids)), k=10
    ).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(bits):
        sk = binarize_embeddings(clustered, bits=bits, seed=7).cache()
        qs = sk.filter(F.col("vec_id").isin(qs_ids))
        got = {}
        for r in hamming_topk_rerank(sk, qs, k=10, rerank=40).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)

    r64, r256 = recall(64), recall(256)
    assert r256 >= 0.9, r256
    assert r256 >= r64 - 1e-9, (r64, r256)


def test_rerank_equals_exact_when_pool_covers_corpus(clustered):
    """rerank = corpus size → the binary pre-rank cannot drop a true
    neighbor, so the result must EQUAL brute-force cosine_topk."""
    sub = clustered.filter(F.col("vec_id") < 40).cache()
    sk = binarize_embeddings(sub, bits=64, seed=3).cache()
    qs = sk.filter(F.col("vec_id").isin([0, 39]))
    got = sorted(
        map(tuple, hamming_topk_rerank(sk, qs, k=5, rerank=40).collect())
    )
    want = sorted(
        map(
            tuple,
            cosine_topk(sub, sub.filter(F.col("vec_id").isin([0, 39])), k=5)
            .collect(),
        )
    )
    assert got == want


def test_plans(clustered):
    sk = binarize_embeddings(clustered, bits=128, seed=7)
    assert (
        "Exchange"
        not in sk._jdf.queryExecution().executedPlan().toString()
    )
    plan = (
        hamming_topk(sk, sk.limit(2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def _sketch_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, sketch array<bigint>"
    )


def test_near_pairs_exact_vs_bruteforce(spark):
    """THE exactness pin: for max_dist < n_words the pigeonhole
    blocking must return exactly the brute-force pair set, including
    pairs differing in bits spread across several (but not all)
    words."""
    import itertools
    import random

    rng = random.Random(9)
    rows = []
    base = rng.getrandbits(63)
    for i in range(30):
        # clusters of 3 around shared prototypes, plus noise rows
        proto = base ^ rng.getrandbits(8) if i % 3 == 0 else None
        if proto is not None:
            last = [proto, proto ^ (1 << 7), rng.getrandbits(63)]
        w = [
            rng.getrandbits(63) if i % 3 != 0 else last[i % 3],
            rng.getrandbits(63) if i % 2 else base,
            rng.getrandbits(63) if i % 5 else base ^ 3,
        ]
        rows.append((i, [int(x) for x in w]))
    df = _sketch_df(spark, rows)
    for max_dist in (0, 1, 2):
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in hamming_near_pairs(df, max_dist=max_dist).collect()
        }
        want = set()
        d = dict(rows)
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
            dist = sum(
                bin((x ^ y) & ((1 << 64) - 1)).count("1")
                for x, y in zip(sa, sb)
            )
            if dist <= max_dist:
                want.add((min(ia, ib), max(ia, ib), dist))
        assert got == want, (max_dist, got ^ want)


def test_near_pairs_guarantee_bound_refused(spark):
    df = _sketch_df(spark, [(1, [0, 0]), (2, [1, 1])])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_pairs(df, max_dist=2)  # 2 words -> max_dist <= 1
    with pytest.raises(ValueError, match=">= 0"):
        hamming_near_pairs(df, max_dist=-1)


def test_near_pairs_null_and_cap(spark):
    rows = [
        (1, [7, 7, 7]),
        (2, [7, 7, 6]),   # dist 1 from 1 (word 3 differs by one bit)
        (3, None),
        *[(10 + i, [0, 0, i + 100]) for i in range(6)],  # degenerate
    ]
    df = _sketch_df(spark, rows)
    got = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_pairs(df, max_dist=1).collect()
    }
    assert (1, 2) in got  # NULL never pairs
    assert not any(3 in p for p in got)
    # the 6 degenerate rows share words 1+2 → bucket of 6; capping at 5
    # drops those buckets and with them their candidates
    capped = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_pairs(df, max_dist=1, max_bucket=5).collect()
    }
    assert capped == {(1, 2)}


@pytest.mark.slow
def test_near_pairs_end_to_end_from_vectors(clustered):
    """Binarize → near-pairs recovers same-cluster near-dup structure:
    every returned pair is within-cluster on the tight fixture."""
    sk = binarize_embeddings(clustered, bits=256, seed=7)
    pairs = hamming_near_pairs(
        sk, max_dist=3, id_col="vec_id"
    ).collect()
    assert pairs, "tight clusters should yield near pairs at dist<=3"
    for r in pairs:
        assert r["id_a"] // 20 == r["id_b"] // 20, r


def test_near_pairs_plan_no_cartesian(spark):
    df = _sketch_df(spark, [(i, [i % 4, i % 3]) for i in range(20)])
    plan = (
        hamming_near_pairs(df, max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
