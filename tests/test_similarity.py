"""Similarity search: brute-force vs numpy ground truth, bucketed variant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_bucketed,
    embedding_near_duplicates,
    with_norm,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = rng.normal(size=8)
        rows.append((i, [float(x) for x in v], int(i % 4)))
    # plant a near-duplicate of vector 0
    v0 = np.array(rows[0][1])
    rows.append((100, [float(x) for x in v0 + 0.001], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"), rows


def _numpy_topk(rows, qid, k):
    mat = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v, _ in rows}
    q = mat[qid]
    scores = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in mat.items()
        if i != qid
    }
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:k]


def test_brute_force_matches_numpy(vectors):
    df, rows = vectors
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=5)
    got = [(r["neighbor_id"], r["cosine"]) for r in out.orderBy("rank").collect()]
    want = [(i, round(s, 4)) for i, s in _numpy_topk(rows, 0, 5)]
    assert got == want
    assert got[0][0] == 100, "planted near-duplicate must rank first"
    assert got[0][1] > 0.999


def test_bucketed_subset_of_brute(vectors):
    df, rows = vectors
    q = df.filter(F.col("vec_id") == 0)
    brute = {
        r["neighbor_id"]
        for r in cosine_topk(df, q, k=100).collect()
    }
    bucketed = cosine_topk_bucketed(df, q, k=100).collect()
    assert {r["neighbor_id"] for r in bucketed} <= brute
    # bucket 0 members only (i % 4 == 0, plus the planted 100)
    assert all(r["neighbor_id"] % 4 == 0 for r in bucketed)


def test_near_duplicates(vectors):
    df, _ = vectors
    pairs = embedding_near_duplicates(df, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_random_hyperplane_buckets(vectors):
    """SRP-LSH: deterministic across calls; a planted near-duplicate
    (cosine > 0.999) collides with its source; scaled copies of a
    vector (cosine 1) collide exactly."""
    from sparvi_core_spark.operators.similarity import random_hyperplane_buckets

    df, _ = vectors
    b1 = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(df).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(df).collect()}
    assert b1 == b2, "seeded hyperplanes must be deterministic"
    assert b1[0] == b1[100], "near-duplicate must share its source's bucket"
    # sign-LSH is scale-invariant: v and 3v bucket identically
    scaled = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(3.0))
    )
    b3 = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(scaled).collect()}
    assert b3 == b1


def test_srp_planes_bounded(vectors):
    from sparvi_core_spark.operators.similarity import random_hyperplane_buckets

    df, _ = vectors
    with pytest.raises(ValueError, match="planes"):
        random_hyperplane_buckets(df, planes=63)


def test_near_duplicates_via_srp_buckets(vectors):
    """The full no-build scale path: SRP buckets as bucket_col for the
    near-dup join finds the planted pair without the label column."""
    from sparvi_core_spark.operators.similarity import random_hyperplane_buckets

    df, _ = vectors
    bucketed = random_hyperplane_buckets(df, planes=8)
    pairs = embedding_near_duplicates(
        bucketed, threshold=0.99, bucket_col="bucket"
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_with_norm(vectors):
    df, rows = vectors
    got = {r["vec_id"]: r["norm"] for r in with_norm(df).collect()}
    for i, v, _ in rows[:5]:
        assert abs(got[i] - float(np.linalg.norm(np.array(v, dtype=np.float32).astype(np.float64)))) < 1e-6


def test_kmeans_fit_recovers_planted_clusters(spark):
    """Three well-separated planted clusters: Lloyd iterations must
    converge and the final assignment must match the ground truth."""
    import random

    from sparvi_core_spark.operators.similarity import ivf_assign, kmeans_fit

    rnd = random.Random(7)
    centers = [(10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)]
    rows = []
    for i in range(90):
        cx = centers[i % 3]
        rows.append((i, [c + rnd.gauss(0, 0.3) for c in cx]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents, info = kmeans_fit(df, k=3, max_iter=15, tol=1e-6, seed=1)
    assert info["converged"], info
    assigned = ivf_assign(df, cents)
    got = {r["id"]: r["bucket"] for r in assigned.collect()}
    # every planted cluster maps to exactly one learned bucket
    for g in range(3):
        buckets = {got[i] for i in range(90) if i % 3 == g}
        assert len(buckets) == 1, (g, buckets)
    assert len({got[i] for i in (0, 1, 2)}) == 3  # and they differ


def test_kmeans_fit_deterministic(spark):
    import random

    from sparvi_core_spark.operators.similarity import kmeans_fit

    rnd = random.Random(3)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1, i1 = kmeans_fit(df, k=4, max_iter=5, seed=9)
    c2, i2 = kmeans_fit(df.repartition(7), k=4, max_iter=5, seed=9)
    assert i1 == i2
    p1 = {r["bucket"]: r["centroid"] for r in c1.collect()}
    p2 = {r["bucket"]: r["centroid"] for r in c2.collect()}
    assert p1.keys() == p2.keys()
    for b in p1:
        assert p1[b] == pytest.approx(p2[b], abs=1e-9)
    with pytest.raises(ValueError, match="k must"):
        kmeans_fit(df, k=0)


def test_semantic_dedup_planted_groups(spark):
    """Three planted semantic groups (tight copies around separated
    centers) + noise singletons: exactly one survivor per group, every
    singleton kept, min-id survivor by default."""
    import random

    from sparvi_core_spark.operators.similarity import semantic_dedup

    rnd = random.Random(11)
    centers = [(10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)]
    rows = []
    # ids 0-14: five near-copies of each center (cosine ≈ 1 within)
    for g, cx in enumerate(centers):
        for j in range(5):
            rows.append(
                (g * 5 + j, [c + rnd.gauss(0, 0.01) for c in cx])
            )
    # ids 100+: well-separated singletons (mixed-sign corners)
    for i, corner in enumerate([(7, 7, -7), (-7, 7, 7), (7, -7, 7)]):
        rows.append((100 + i, [float(c) for c in corner]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    survivors, report = semantic_dedup(
        df, threshold=0.999, n_clusters=3, seed=5
    )
    kept = sorted(r["vec_id"] for r in survivors.collect())
    assert kept == [0, 5, 10, 100, 101, 102]
    assert report["kmeans"]["iterations"] >= 1
    # every planted group collapsed to its min id
    labels = {r["id"]: r["cluster"] for r in report["clusters"].collect()}
    for g in range(3):
        ids = [g * 5 + j for j in range(5)]
        assert {labels[i] for i in ids if i in labels} <= {g * 5}


def test_semantic_dedup_quality_survivor(spark):
    import random

    from sparvi_core_spark.operators.similarity import semantic_dedup

    rnd = random.Random(2)
    rows = [
        (i, [10.0 + rnd.gauss(0, 0.01), 0.0, 0.0], float(i))
        for i in range(4)
    ]
    rows.append((50, [0.0, 10.0, 0.0], 0.5))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, quality double"
    )
    survivors, _ = semantic_dedup(
        df, threshold=0.999, n_clusters=2, score_col="quality", seed=3
    )
    kept = sorted(r["vec_id"] for r in survivors.collect())
    # highest quality in the near-dup group is id 3; singleton 50 stays
    assert kept == [3, 50]


@pytest.mark.slow
def test_semantic_dedup_repartition_invariant(spark):
    import random

    from sparvi_core_spark.operators.similarity import semantic_dedup

    rnd = random.Random(4)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(4)]) for i in range(30)
    ]
    for i in range(5):  # plant copies of row 0
        rows.append((200 + i, list(rows[0][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    s1, _ = semantic_dedup(df, threshold=0.999, n_clusters=4, seed=8)
    s2, _ = semantic_dedup(
        df.repartition(7), threshold=0.999, n_clusters=4, seed=8
    )
    assert sorted(r["vec_id"] for r in s1.collect()) == sorted(
        r["vec_id"] for r in s2.collect()
    )


def test_ivf_assign_probes_topn(spark):
    """Multi-probe assignment: probe 0 matches ivf_assign's argmin,
    probe 1 is the second-nearest centroid; plan is shuffle-free."""
    from sparvi_core_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_probes,
    )

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])],
        "bucket int, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [9.0, 1.0]), (3, [4.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    probes = ivf_assign_probes(vecs, cents, nprobe=2)
    assert "Exchange" not in probes._jdf.queryExecution().executedPlan().toString()
    got = {(r["id"], r["probe"]): r["bucket"] for r in probes.collect()}
    base = {r["id"]: r["bucket"] for r in ivf_assign(vecs, cents).collect()}
    for vid in (1, 2, 3):
        assert got[(vid, 0)] == base[vid]
    assert got[(1, 1)] in (1, 2)  # second-nearest is a real centroid
    assert got[(2, 1)] == 0

    import pytest

    with pytest.raises(ValueError, match="nprobe"):
        ivf_assign_probes(vecs, cents, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_assign_probes(vecs, cents, nprobe=4)


@pytest.mark.slow
def test_semantic_dedup_nprobe_recovers_boundary_pair(spark):
    """A planted near-dup pair straddling the k-means boundary:
    nprobe=1 misses it (the documented SemDeDup recall loss), nprobe=2
    finds it via the shared second-choice cluster — and adds no
    spurious pairs beyond the planted one."""
    from sparvi_core_spark.operators.similarity import semantic_dedup

    rows = []
    # blob A along e1, blob B along e2 (slight jitter keeps k-means
    # seeds distinct); the two blobs are the natural k=2 clustering
    for j in range(8):
        rows.append((j, [10.0, 0.1 * j, 0.0, 0.0]))
        rows.append((100 + j, [0.1 * j, 10.0, 0.0, 0.0]))
    # boundary pair: nearly parallel (cosine ≈ 0.9994) but on opposite
    # sides of the A/B midplane -> different nearest centroids
    rows.append((500, [5.1, 4.9, 0.0, 0.0]))
    rows.append((501, [4.9, 5.1, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairset(nprobe):
        _, rep = semantic_dedup(
            df, threshold=0.999, n_clusters=2, seed=5, nprobe=nprobe
        )
        return {
            (r["id_a"], r["id_b"])
            for r in rep["pairs"].collect()
            if r["id_a"] >= 500 or r["id_b"] >= 500
        }

    assert pairset(1) == set()  # boundary pair split across clusters
    assert pairset(2) == {(500, 501)}  # recovered, nothing spurious

    survivors, _ = semantic_dedup(
        df, threshold=0.999, n_clusters=2, seed=5, nprobe=2
    )
    kept = {r["vec_id"] for r in survivors.collect()}
    assert 500 in kept and 501 not in kept  # min-id survivor


def test_random_hyperplane_probes_recovers_boundary_pair(spark):
    """Multi-probe SRP: a pair reflected across its lowest-margin
    hyperplane sits in buckets one bit apart — nprobe=1 misses it,
    nprobe=2 probes the flipped bit and recovers it. The fixture is
    found deterministically with the SAME seeded planes the operator
    uses (srp_planes is public for exactly this)."""
    from sparvi_core_spark.operators.similarity import (
        embedding_near_duplicates,
        random_hyperplane_buckets,
        random_hyperplane_probes,
        srp_planes,
    )

    PLANES, DIM, SEED = 8, 6, 42
    planes = srp_planes(PLANES, DIM, SEED)

    def py_bucket(v):
        b = 0
        for i, h in enumerate(planes):
            if sum(a * c for a, c in zip(v, h)) >= 0:
                b |= 1 << i
        return b

    import random

    rnd = random.Random(7)
    fixture = None
    while fixture is None:
        u = [rnd.gauss(0, 1) for _ in range(DIM)]
        dots = [sum(a * c for a, c in zip(u, h)) for h in planes]
        j = min(range(PLANES), key=lambda i: abs(dots[i]))
        hj = planes[j]
        nrm = sum(c * c for c in hj)
        w = [a - 2 * dots[j] * c / nrm for a, c in zip(u, hj)]
        cos = sum(a * b for a, b in zip(u, w)) / (
            sum(a * a for a in u) ** 0.5 * sum(b * b for b in w) ** 0.5
        )
        if py_bucket(u) ^ py_bucket(w) == (1 << j) and cos >= 0.999:
            fixture = (u, w)

    u, w = fixture
    df = spark.createDataFrame(
        [(1, u), (2, w)], "vec_id long, embedding array<double>"
    )

    def pairs(frame, bucket_col):
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                frame, threshold=0.999, bucket_col=bucket_col
            )
            .distinct()
            .collect()
        }

    single = random_hyperplane_buckets(df, planes=PLANES, seed=SEED)
    assert pairs(single, "bucket") == set()  # one bit apart -> missed

    probed = random_hyperplane_probes(df, planes=PLANES, nprobe=2, seed=SEED)
    assert pairs(probed, "bucket") == {(1, 2)}  # flipped-bit probe hits


def test_random_hyperplane_probes_nprobe1_matches_base(spark):
    from sparvi_core_spark.operators.similarity import (
        random_hyperplane_buckets,
        random_hyperplane_probes,
    )

    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {
        r["vec_id"]: r["bucket"]
        for r in random_hyperplane_buckets(df, planes=10, seed=9).collect()
    }
    p1 = random_hyperplane_probes(df, planes=10, nprobe=1, seed=9).collect()
    assert len(p1) == 40  # exactly one probe per vector
    assert {r["vec_id"]: r["bucket"] for r in p1} == base

    # nprobe=3: every vector appears <= 3 times, base bucket included
    p3 = random_hyperplane_probes(df, planes=10, nprobe=3, seed=9).collect()
    from collections import defaultdict

    got = defaultdict(set)
    for r in p3:
        got[r["vec_id"]].add(r["bucket"])
    assert all(base[i] in bs and 1 <= len(bs) <= 3 for i, bs in got.items())

    import pytest

    with pytest.raises(ValueError, match="nprobe"):
        random_hyperplane_probes(df, planes=10, nprobe=12)


def test_cosine_topk_ivf_query_probes_raise_recall(spark):
    """A query whose true cosine-nearest neighbor lives in its
    SECOND-nearest IVF cell (large-norm vector: L2 cell assignment and
    cosine direction disagree): single-probe bucketed search returns
    the wrong neighbor, cosine_topk_ivf(nprobe=2) finds the true one."""
    from sparvi_core_spark.operators.similarity import (
        cosine_topk_bucketed,
        cosine_topk_ivf,
        ivf_assign,
    )

    cents = spark.createDataFrame(
        [(0, [100.0, 0.0]), (1, [0.0, 10.0])],
        "bucket int, centroid array<double>",
    )
    # id 1: exactly the query's direction, norm so large its L2 cell
    # is cell 0; id 2: a weaker cosine match sitting in cell 1
    vectors = spark.createDataFrame(
        [(1, [94.5, 115.5]), (2, [1.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [9.0, 11.0])], "vec_id long, embedding array<double>"
    )

    # sanity: the fixture puts query and its true neighbor in
    # different cells
    cells = {
        r["id"]: r["bucket"]
        for r in ivf_assign(
            vectors.unionByName(queries), cents
        ).collect()
    }
    assert cells[100] == 1 and cells[1] == 0 and cells[2] == 1

    va = ivf_assign(vectors, cents).select(
        F.col("id").alias("vec_id"), F.col("bucket").alias("label")
    )
    qa = ivf_assign(queries, cents).select(
        F.col("id").alias("vec_id"), F.col("bucket").alias("label")
    )
    single = cosine_topk_bucketed(
        vectors.join(va, "vec_id"), queries.join(qa, "vec_id"), k=1
    ).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in single] == [(100, 2)]

    probed = cosine_topk_ivf(vectors, queries, cents, k=1, nprobe=2).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in probed] == [(100, 1)]
    assert probed[0]["cosine"] >= 0.999  # the true (parallel) neighbor


def test_near_dup_salt_and_cap(spark):
    """salt_buckets changes ONLY the plan: identical pair set at any
    salt. max_bucket drops oversized buckets from the pair search."""
    import random

    from sparvi_core_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    rnd = random.Random(5)
    rows = []
    # bucket 0: 40 members incl. 3 planted twins; bucket 1: 200 members
    # (the "mega" bucket) incl. 2 planted twins
    for i in range(40):
        rows.append((i, 0, [rnd.gauss(0, 1) for _ in range(6)]))
    for j in range(3):
        rows.append((1000 + j, 0, list(rows[j][2])))
    for i in range(200):
        rows.append((2000 + i, 1, [rnd.gauss(0, 1) for _ in range(6)]))
    for j in range(2):
        rows.append((3000 + j, 1, list(rows[43 + j][2])))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )

    base = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(df, threshold=0.9999).collect()
    }
    assert len(base) >= 5  # all five planted twins found
    for salt in (2, 7):
        salted = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_duplicates(
                df, threshold=0.9999, salt_buckets=salt
            ).collect()
        }
        assert salted == base

    capped = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, threshold=0.9999, max_bucket=100
        ).collect()
    }
    # bucket 1 (202 members) dropped; bucket 0's twins remain
    assert capped == {(a, b) for a, b, _ in base if b < 2000}


def test_blas_engine_matches_expr(spark):
    """engine='blas' returns the identical pair set (ids AND rounded
    cosines, away from rounding boundaries) as the expression join,
    handles zero vectors, and rejects unbucketed use."""
    import random

    from sparvi_core_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    rnd = random.Random(9)
    rows = []
    for i in range(60):
        rows.append((i, i % 3, [rnd.gauss(0, 1) for _ in range(8)]))
    for j in range(4):  # planted twins across buckets
        rows.append((500 + j, j % 3, list(rows[j * 7][2])))
    rows.append((900, 0, [0.0] * 8))  # zero vector: must match nothing
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    expr = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(df, threshold=0.999).collect()
    }
    blas = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(
            df, threshold=0.999, engine="blas"
        ).collect()
    }
    assert blas == expr and len(blas) >= 4
    assert all(900 not in (a, b) for a, b, _ in blas)

    import pytest

    with pytest.raises(ValueError, match="engine"):
        embedding_near_duplicates(df, engine="gpu")
    with pytest.raises(ValueError, match="bucket_col"):
        embedding_near_duplicates(df, bucket_col=None, engine="blas")


def test_topk_blas_engine_matches_expr(spark):
    """cosine_topk_bucketed(engine='blas') reproduces the expression
    engine's exact ranking (ids, ranks, cosines within rounding), incl.
    through the multi-probe cosine_topk_ivf path and with zero
    vectors present."""
    import random

    from sparvi_core_spark.operators.similarity import (
        cosine_topk_bucketed,
        cosine_topk_ivf,
    )

    rnd = random.Random(21)
    rows = [
        (i, i % 4, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(120)
    ]
    rows.append((900, 0, [0.0] * 8))  # zero vector: excluded both engines
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    qs = df.filter("vec_id % 17 = 0")

    def result(engine):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 3))
            for r in cosine_topk_bucketed(df, qs, k=5, engine=engine).collect()
        }

    expr, blas = result("expr"), result("blas")
    assert blas == expr and len(expr) > 20
    assert all(900 not in (q, v[0]) for (q, _), v in blas.items())

    # multi-probe path: same equality through cosine_topk_ivf
    cents = spark.createDataFrame(
        [(0, [3.0] + [0.0] * 7), (1, [0.0, 3.0] + [0.0] * 6)],
        "bucket int, centroid array<double>",
    )
    clean = df.filter("vec_id < 900")
    ivf_expr = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            clean, qs.filter("vec_id < 900"), cents, k=3, nprobe=2
        ).collect()
    }
    ivf_blas = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            clean, qs.filter("vec_id < 900"), cents, k=3, nprobe=2,
            engine="blas",
        ).collect()
    }
    assert ivf_blas == ivf_expr and len(ivf_expr) > 5

    import pytest

    with pytest.raises(ValueError, match="engine"):
        cosine_topk_bucketed(df, qs, engine="gpu")


def test_pool_embeddings(spark):
    """Chunk → doc pooling: exact mean / weighted mean / max values,
    unit normalization, NULL handling — and the pooled column feeds
    the ANN surface directly."""
    import math

    import pytest

    from sparvi_core_spark.operators.similarity import (
        cosine_topk,
        pool_embeddings,
    )

    rows = [
        (1, 1.0, [2.0, 0.0]),
        (1, 3.0, [6.0, 4.0]),
        (2, 1.0, [0.0, 2.0]),
        (2, 1.0, None),  # ignored
        (3, 1.0, None),  # all-NULL group: drops out
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, w double, embedding array<double>"
    )

    mean = {r["doc_id"]: r["embedding"] for r in pool_embeddings(df).collect()}
    assert set(mean) == {1, 2}
    assert mean[1] == [4.0, 2.0] and mean[2] == [0.0, 2.0]

    wmean = {
        r["doc_id"]: r["embedding"]
        for r in pool_embeddings(df, weight_col="w").collect()
    }
    assert wmean[1] == [5.0, 3.0]  # (1*2 + 3*6)/4, (0 + 3*4)/4

    mx = {
        r["doc_id"]: r["embedding"]
        for r in pool_embeddings(df, mode="max").collect()
    }
    assert mx[1] == [6.0, 4.0]

    unit = {
        r["doc_id"]: r["embedding"]
        for r in pool_embeddings(df, normalize=True).collect()
    }
    for v in unit.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9

    # zero vectors stay zero under normalize
    z = spark.createDataFrame(
        [(9, 1.0, [0.0, 0.0])], "doc_id long, w double, embedding array<double>"
    )
    assert pool_embeddings(z, normalize=True).first()["embedding"] == [0.0, 0.0]

    # pooled output feeds ANN without glue
    pooled = pool_embeddings(df).withColumnRenamed("doc_id", "vec_id")
    got = cosine_topk(pooled, pooled.filter("vec_id = 1"), k=1).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in got] == [(1, 2)]

    with pytest.raises(ValueError, match="mode"):
        pool_embeddings(df, mode="median")
    with pytest.raises(ValueError, match="weight_col"):
        pool_embeddings(df, mode="max", weight_col="w")


def test_ivf_assign_probes_join_matches_literal(spark):
    """strategy='join' (centroids as broadcast DATA, the large-k path)
    produces the identical (id, probe, bucket, distance) set as the
    literal-expression path, with no shuffle on the corpus side; auto
    resolves by centroid count."""
    from sparvi_core_spark.operators.similarity import (
        LITERAL_CENTROID_MAX,
        ivf_assign_probes,
    )

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0]), (3, [7.0, 7.0])],
        "bucket int, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [9.0, 1.0]), (3, [4.0, 4.0]), (4, [6.9, 7.2])],
        "vec_id long, embedding array<double>",
    )

    def rows(strategy, nprobe=3):
        return {
            (r["id"], r["probe"], r["bucket"], r["distance"])
            for r in ivf_assign_probes(
                vecs, cents, nprobe=nprobe, strategy=strategy
            ).collect()
        }

    lit = rows("literal")
    join = rows("join")
    assert join == lit and len(lit) == 12
    assert rows("auto") == lit  # 4 centroids <= LITERAL_CENTROID_MAX
    assert LITERAL_CENTROID_MAX >= 4

    # the corpus never shuffles under the join strategy: the only
    # exchange is the single-row centroid pack (SinglePartition)
    plan = (
        ivf_assign_probes(vecs, cents, nprobe=2, strategy="join")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan

    import pytest

    with pytest.raises(ValueError, match="strategy"):
        ivf_assign_probes(vecs, cents, strategy="window")
    with pytest.raises(ValueError, match="nprobe"):
        ivf_assign_probes(vecs, cents, nprobe=5, strategy="join")


def test_blas_string_ids_match_expr(spark):
    """String doc ids flow through both BLAS kernels (pair search and
    bucketed top-k) with results identical to the expression engine —
    the id output type follows the input schema on both engines."""
    import random

    from sparvi_core_spark.operators.similarity import (
        cosine_topk_bucketed,
        embedding_near_duplicates,
    )

    rnd = random.Random(13)
    rows = [
        (f"doc-{i:03d}", i % 3, [rnd.gauss(0, 1) for _ in range(6)])
        for i in range(40)
    ]
    rows.append(("doc-900", 0, list(rows[0][2])))  # planted twin
    df = spark.createDataFrame(
        rows, "vec_id string, label int, embedding array<double>"
    )

    expr_pairs = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(df, threshold=0.999).collect()
    }
    blas_pairs = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(
            df, threshold=0.999, engine="blas"
        ).collect()
    }
    assert blas_pairs == expr_pairs
    assert ("doc-000", "doc-900") in {(a, b) for a, b, _ in blas_pairs}

    qs = df.limit(5)
    expr_tk = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 3))
        for r in cosine_topk_bucketed(df, qs, k=4).collect()
    }
    blas_tk = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 3))
        for r in cosine_topk_bucketed(df, qs, k=4, engine="blas").collect()
    }
    assert blas_tk == expr_tk and len(expr_tk) == 20
    out = cosine_topk_bucketed(df, qs, k=4, engine="blas")
    assert dict(out.dtypes)["neighbor_id"] == "string"

    # unsupported id types fail loudly, not at Arrow conversion
    import pytest

    bad = df.select(
        F.col("vec_id").cast("double").alias("vec_id"), "label", "embedding"
    )
    with pytest.raises(ValueError, match="blas"):
        embedding_near_duplicates(bad, engine="blas").collect()


def test_blas_null_vectors_match_expr(spark):
    """NULL embeddings are excluded by both engines (the expr engine's
    qnorm/nnorm filter semantics) instead of crashing np.stack."""
    import random

    from sparvi_core_spark.operators.similarity import (
        cosine_topk_bucketed,
        embedding_near_duplicates,
    )

    rnd = random.Random(31)
    rows = [
        (i, i % 2, [rnd.gauss(0, 1) for _ in range(6)]) for i in range(30)
    ]
    rows.append((200, 0, list(rows[0][2])))  # planted twin
    rows.append((300, 0, None))  # NULL vector
    rows.append((301, 1, None))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )

    expr = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(df, threshold=0.999).collect()
    }
    blas = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, threshold=0.999, engine="blas"
        ).collect()
    }
    assert blas == expr and (0, 200) in blas
    assert all(300 not in p and 301 not in p for p in blas)

    qs = df.filter("vec_id in (0, 5, 300)")
    expr_tk = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in cosine_topk_bucketed(df, qs, k=3).collect()
    }
    blas_tk = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in cosine_topk_bucketed(df, qs, k=3, engine="blas").collect()
    }
    assert blas_tk == expr_tk
    assert all(q != 300 for q, _, _ in blas_tk)  # NULL query dropped


def test_ivf_recall_floor_clustered(spark):
    """Regression tripwire for the ANN recall knobs: on a corpus WITH
    cluster structure (IVF's operating assumption) recall@10 must hold
    >= 0.9 at nprobe=2 under BOTH engines. Deterministic seed; 6
    Gaussian blobs whose spread makes some true neighbors straddle
    cluster boundaries, so nprobe=1 measurably loses recall and the
    floor actually exercises the multi-probe path."""
    import random

    from sparvi_core_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        kmeans_fit,
    )

    rnd = random.Random(17)
    dim, blobs = 16, 6
    centers = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(blobs)]
    rows = []
    for i in range(300):
        c = centers[i % blobs]
        rows.append(
            (i, [x + rnd.gauss(0, 0.35) for x in c])
        )
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = vecs.filter("vec_id % 11 = 0")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(vecs, queries, k=10).collect()
    }
    centroids, _ = kmeans_fit(vecs, k=blobs, seed=11)
    for engine in ("expr", "blas"):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_ivf(
                vecs, queries, centroids, k=10, nprobe=2, engine=engine
            ).collect()
        }
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, f"recall@10 {recall:.3f} under {engine}"


def test_ivf_recall_curve_real_fixture(spark, sf_dir):
    """The real embeddings fixture has essentially NO cluster structure
    for NN purposes (measured: only ~14% of true top-10 neighbors share
    the planted label), so an absolute recall floor there would test
    the data, not the operator. What IS invariant: recall must be
    monotone non-decreasing in nprobe, and nprobe = k (probe every
    cell) must reproduce brute force exactly — nothing silently
    dropped."""
    from sparvi_core_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        kmeans_fit,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = vecs.orderBy("vec_id").limit(20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(vecs, queries, k=10).collect()
    }
    centroids, _ = kmeans_fit(vecs, k=4, seed=11)
    recalls = []
    for nprobe in (1, 2, 4):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_ivf(
                vecs, queries, centroids, k=10, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0, "nprobe=k must equal brute force"


def test_ivf_assign_probes_blas_matches_expr_strategies(spark):
    """strategy='blas' (broadcast NumPy centroid matrix + blocked
    matmul) produces the identical (id, probe, bucket, distance) set
    as the literal and join strategies — including tie resolution by
    bucket and nprobe=1 agreement with ivf_assign's argmin; NULL
    vectors get no assignment under ANY strategy; string ids flow
    through."""
    from sparvi_core_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_probes,
    )

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0]), (3, [7.0, 7.0])],
        "bucket int, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.5]),
            (2, [9.0, 1.0]),
            (3, [4.0, 4.0]),
            (4, [6.9, 7.2]),
            (5, [5.0, 5.0]),  # equidistant-ish: exercises tie handling
            (6, None),  # NULL vector: no assignment, no crash
        ],
        "vec_id long, embedding array<double>",
    )

    def rows(strategy):
        return sorted(
            (r["id"], r["probe"], r["bucket"], r["distance"])
            for r in ivf_assign_probes(
                vecs, cents, nprobe=3, strategy=strategy
            ).collect()
        )

    lit = rows("literal")
    assert rows("join") == lit and rows("blas") == lit
    assert len(lit) == 15  # 5 non-NULL vectors x 3 probes
    assert all(i != 6 for i, _, _, _ in lit)

    one = sorted(
        (r["id"], r["bucket"])
        for r in ivf_assign_probes(
            vecs, cents, nprobe=1, strategy="blas"
        ).collect()
    )
    base = sorted(
        (r["id"], r["bucket"]) for r in ivf_assign(vecs, cents).collect()
    )
    assert one == base

    sv = vecs.filter("embedding is not null").select(
        F.concat(F.lit("v-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    sb = sorted(
        (r["id"], r["probe"], r["bucket"])
        for r in ivf_assign_probes(sv, cents, nprobe=2, strategy="blas").collect()
    )
    sl = sorted(
        (r["id"], r["probe"], r["bucket"])
        for r in ivf_assign_probes(
            sv, cents, nprobe=2, strategy="literal"
        ).collect()
    )
    assert sb == sl
    out = ivf_assign_probes(sv, cents, nprobe=2, strategy="blas")
    assert dict(out.dtypes)["id"] == "string"

    import pytest

    with pytest.raises(ValueError, match="nprobe"):
        ivf_assign_probes(vecs, cents, nprobe=5, strategy="blas")
