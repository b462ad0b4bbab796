"""MinHash-LSH dedup index on storage: write → probe-prune → verify,
with probe output EXACTLY equal to the in-memory minhash_dedup_pairs
cross-pairs over the same parameters (same deterministic salts), and
the pruning pinned in the file listing on BOTH stores."""

import random

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.sources.minhash_index import (
    append_minhash_index,
    filter_new_against_index,
    minhash_index_health,
    probe_minhash_index,
    read_minhash_index,
    write_minhash_index,
)

_WORDS = [f"w{i}" for i in range(120)]


def _doc(rnd, n=30):
    return " ".join(rnd.choice(_WORDS) for _ in range(n))


def _mutate(rnd, text, k=2):
    toks = text.split(" ")
    for _ in range(k):
        toks[rnd.randrange(len(toks))] = rnd.choice(_WORDS)
    return " ".join(toks)


def _corpus(spark, n=60, seed=3, offset=0, shorts=0):
    """Docs with planted near-dup structure: every 5th doc is a light
    mutation of its predecessor."""
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 5 == 4 and rows:
            rows.append((offset + i, _mutate(rnd, rows[-1][1])))
        else:
            rows.append((offset + i, _doc(rnd)))
    for j in range(shorts):
        rows.append((offset + n + j, "too short"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_write_read_roundtrip_and_manifest(spark, tmp_path):
    df = _corpus(spark, shorts=2)
    path = str(tmp_path / "mhidx")
    man = write_minhash_index(
        df, path, num_hashes=8, bands=4, n_buckets=32
    )
    rows, rman = read_minhash_index(spark, path)
    assert rman == man
    assert man["format"] == "sparvi-minhash-index/2"
    # snapshot commit: the manifest records both stores' live files
    assert sorted(man["files"]["bands"]) == sorted(man["rows_per_bucket"])
    assert sorted(man["files"]["sigs"]) == sorted(man["sig_rows_per_bucket"])
    assert man["staging_files"] == {"bands": [], "sigs": []}
    assert man["tombstone_files"] == []
    assert man["n_docs"] == 60 and man["dropped_short"] == 2
    assert man["num_hashes"] == 8 and man["bands"] == 4
    # every indexed doc contributes exactly `bands` band rows
    assert rows.count() == 60 * 4
    assert sum(man["rows_per_bucket"].values()) == 60 * 4
    assert all(r["ok"] for r in minhash_index_health(spark, path).collect())


def test_bands_solved_from_threshold(spark, tmp_path):
    from sparvi_core_spark.operators.dedup import solve_lsh_bands

    df = _corpus(spark, n=20)
    path = str(tmp_path / "mhidx")
    man = write_minhash_index(
        df, path, num_hashes=16, threshold=0.7, n_buckets=16
    )
    want_bands, _ = solve_lsh_bands(0.7, 16)
    assert man["bands"] == want_bands


def test_probe_equals_in_memory_cross_pairs(spark, tmp_path):
    """probe(batch) == minhash_dedup_pairs(store ∪ batch) restricted to
    cross pairs — identical ids AND identical est_jaccard, because the
    index reuses the in-memory kernels verbatim."""
    from sparvi_core_spark.operators.dedup import minhash_dedup_pairs

    store = _corpus(spark, n=60, seed=3)
    rnd = random.Random(11)
    # batch: recrawls (mutations of stored docs) + fresh docs
    stored_rows = store.collect()
    batch_rows = [
        (1000 + i, _mutate(rnd, stored_rows[i * 3][1], k=1))
        for i in range(8)
    ] + [(1100 + i, _doc(rnd)) for i in range(10)]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    path = str(tmp_path / "mhidx")
    write_minhash_index(
        store, path, num_hashes=8, bands=4, threshold=0.5, n_buckets=32
    )
    got = sorted(
        (r["index_id"], r["batch_id"], r["est_jaccard"])
        for r in probe_minhash_index(
            spark, path, batch, threshold=0.5, max_bucket=10**6
        ).collect()
    )
    assert got, "planted recrawls must surface as near-dup pairs"

    union = store.union(batch)
    want = sorted(
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_dedup_pairs(
            union, num_hashes=8, bands=4, threshold=0.5
        ).collect()
        if (r["id_a"] < 1000) != (r["id_b"] < 1000)  # cross pairs only
    )
    assert got == want


def _scan_partitions(df):
    from tests.test_binary_index import _scan_metrics

    return _scan_metrics(df)[1]


def test_probe_prunes_both_stores(spark, tmp_path):
    """A small batch's probe lists a strict subset of band buckets and
    of signature buckets (PartitionFilters + Spark scan metrics)."""
    store = _corpus(spark, n=200, seed=3)
    # copies of 4 stored docs, so candidates (and the verification
    # scan) exist — the sig-store prune is part of the pin
    batch = spark.createDataFrame(
        [(5000 + i, r["text"]) for i, r in enumerate(store.collect()[:4])],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mhidx")
    man = write_minhash_index(
        store, path, num_hashes=8, bands=4, n_buckets=64
    )
    n_band_buckets = len(man["rows_per_bucket"])
    assert n_band_buckets >= 32  # 64 possible; hashing fills most

    probed = probe_minhash_index(spark, path, batch, threshold=0.0)
    probed.collect()
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # both stores' scans carry a bucket partition IN-list
    assert plan.count("PartitionFilters: [bucket") >= 2 or (
        "PartitionFilters" in plan and plan.count("bucket#") >= 2
    )
    parts_read = _scan_partitions(probed)
    # 4 docs x 4 bands = at most 16 band buckets + at most 16 sig
    # buckets; far fewer than the index's population on both stores
    assert 0 < parts_read < n_band_buckets


def test_probe_flat_fallback_when_batch_covers_buckets(spark, tmp_path):
    """A batch touching most buckets drops the IN-list (flat scan) and
    still returns the right pairs."""
    store = _corpus(spark, n=40, seed=3)
    path = str(tmp_path / "mhidx")
    write_minhash_index(store, path, num_hashes=8, bands=4, n_buckets=2)
    batch = _corpus(spark, n=40, seed=3, offset=2000)  # same texts, new ids
    hits = probe_minhash_index(spark, path, batch, threshold=0.9)
    # every batch doc is an exact copy of a stored doc -> est 1.0 self
    pairs = {(r["index_id"], r["batch_id"]) for r in hits.collect()}
    assert all((i, i + 2000) in pairs for i in range(0, 40, 5))


def test_append_then_probe_sees_both_generations(spark, tmp_path):
    store = _corpus(spark, n=40, seed=3)
    path = str(tmp_path / "mhidx")
    write_minhash_index(store, path, num_hashes=8, bands=4, n_buckets=16)
    gen2 = _corpus(spark, n=20, seed=8, offset=500, shorts=1)
    man = append_minhash_index(spark, path, gen2)
    assert man["n_docs"] == 60 and man["dropped_short"] == 1
    assert sum(man["rows_per_bucket"].values()) == 60 * 4
    assert all(r["ok"] for r in minhash_index_health(spark, path).collect())

    # a batch copying one doc from EACH generation hits both
    batch = spark.createDataFrame(
        [(9000, store.collect()[0]["text"]), (9001, gen2.collect()[0]["text"])],
        "doc_id long, text string",
    )
    hits = probe_minhash_index(spark, path, batch, threshold=0.9)
    got = {(r["index_id"], r["batch_id"]) for r in hits.collect()}
    assert (0, 9000) in got and (500, 9001) in got


def test_filter_new_against_index(spark, tmp_path):
    store = _corpus(spark, n=40, seed=3)
    path = str(tmp_path / "mhidx")
    write_minhash_index(store, path, num_hashes=8, bands=4, n_buckets=16)
    rnd = random.Random(7)
    dup_text = store.collect()[10]["text"]
    batch = spark.createDataFrame(
        [(8000, dup_text), (8001, _doc(rnd)), (8002, _doc(rnd))],
        "doc_id long, text string",
    )
    kept = filter_new_against_index(spark, path, batch, threshold=0.9)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 8000 not in ids and {8001, 8002} <= ids
    # batch columns pass through untouched
    assert kept.columns == batch.columns


def test_max_bucket_caps_degenerate_keys(spark, tmp_path):
    """A band key held by more stored docs than max_bucket is excluded
    from candidate generation (boilerplate-bucket guard)."""
    boiler = " ".join(f"b{i}" for i in range(20))
    store = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string"
    )
    path = str(tmp_path / "mhidx")
    write_minhash_index(store, path, num_hashes=8, bands=4, n_buckets=8)
    batch = spark.createDataFrame([(900, boiler)], "doc_id long, text string")
    capped = probe_minhash_index(spark, path, batch, threshold=0.5,
                                 max_bucket=10)
    assert capped.count() == 0
    uncapped = probe_minhash_index(spark, path, batch, threshold=0.5,
                                   max_bucket=10**6)
    assert uncapped.count() == 30


def test_guards(spark, tmp_path):
    df = _corpus(spark, n=10)
    path = str(tmp_path / "mhidx")
    with pytest.raises(ValueError, match="divide"):
        write_minhash_index(df, path, num_hashes=8, bands=3)
    with pytest.raises(ValueError, match="n_buckets"):
        write_minhash_index(df, path, n_buckets=0)
    dup = df.union(df.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        write_minhash_index(dup, path)
    write_minhash_index(df, path, num_hashes=8, bands=4, n_buckets=8)
    with pytest.raises(ValueError, match="missing"):
        probe_minhash_index(spark, path, df.select("doc_id"))


def test_novelty_stream_fuzzy_grows_and_screens(spark, tmp_path):
    """Two-trigger run: batch 2's copy of a STORED doc is dropped, its
    copy of a batch-1 SURVIVOR is dropped (the index grew), fresh docs
    land; a replayed batch id is skipped whole."""
    import json

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import MANIFEST
    from sparvi_core_spark.streaming.dedup_stream import novelty_stream_fuzzy

    store = _corpus(spark, n=30, seed=3)
    idx = str(tmp_path / "mhidx")
    write_minhash_index(store, idx, num_hashes=8, bands=4, n_buckets=16)

    rnd = random.Random(21)
    fresh1 = _doc(rnd)
    fresh2 = _doc(rnd)
    stored_text = store.collect()[5]["text"]
    src = tmp_path / "src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(100, fresh1), (101, stored_text)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(200, fresh1), (201, fresh2), (202, stored_text)],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = str(tmp_path / "sink")
    q = novelty_stream_fuzzy(
        stream, idx, sink, threshold=0.9,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    landed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    # 101/202 duplicate the stored corpus; 200 duplicates survivor 100
    # (ordering of the two files is lexicographic: b1 then b2)
    assert landed == {100, 201}
    man = json.loads(_read_text(spark, idx, MANIFEST))
    assert man["n_docs"] == 32  # 30 stored + 2 admitted
    assert man["last_stream_batch_id"] == 1


def test_write_minhash_index_rejects_append_mode(spark, tmp_path):
    """mode='append' on the fresh-index writer is a trap (whole-store
    stats recount, no cross-call id check) — it must raise and point
    at append_minhash_index."""
    docs = _corpus(spark, n=10, seed=3)
    with pytest.raises(ValueError, match="append_minhash_index"):
        write_minhash_index(
            docs, str(tmp_path / "idx"), num_hashes=8, bands=4, mode="append"
        )


def test_stream_replay_window_is_idempotent(spark, tmp_path):
    """The crash window the round-9 ADVICE flagged: sink + index
    append landed, manifest's last_stream_batch_id did NOT.  A replay
    of the same micro-batch must re-land the same sink rows (not
    duplicates) and re-append nothing to the index."""
    import json

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        filter_unindexed_ids,
    )

    idx = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=30, seed=3), idx, num_hashes=8, bands=4, n_buckets=16
    )
    rnd = random.Random(77)
    batch = spark.createDataFrame(
        [(500, _doc(rnd)), (501, _doc(rnd))], "doc_id long, text string"
    )
    sink = str(tmp_path / "sink")

    def run_batch_body():
        # the foreachBatch body of novelty_stream_fuzzy, sans the
        # manifest batch-id commit — i.e. the crash window itself
        unindexed = filter_unindexed_ids(spark, idx, batch).localCheckpoint()
        landed = batch.join(
            unindexed.select("doc_id"), "doc_id", "left_anti"
        )
        survivors = filter_new_against_index(
            spark, idx, unindexed, 0.9
        ).localCheckpoint()
        survivors.unionByName(landed).write.mode("overwrite").parquet(
            f"{sink}/batch_id=0"
        )
        append_minhash_index(spark, idx, survivors)

    run_batch_body()
    landed1 = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    )
    man1 = json.loads(_read_text(spark, idx, MANIFEST))
    assert landed1 == [500, 501]
    assert man1["n_docs"] == 32

    run_batch_body()  # the replay
    landed2 = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    )
    man2 = json.loads(_read_text(spark, idx, MANIFEST))
    assert landed2 == landed1  # sink rewritten, not duplicated
    assert man2["n_docs"] == 32  # index unchanged
    assert man2["rows_per_bucket"] == man1["rows_per_bucket"]
    assert man2["sig_rows_per_bucket"] == man1["sig_rows_per_bucket"]
    # and the screen itself reports nothing left to append
    assert filter_unindexed_ids(spark, idx, batch).count() == 0


def test_stream_replay_keeps_mutual_near_dups(spark, tmp_path):
    """The round-10 ADVICE crash case: a batch whose survivors are
    MUTUAL near-dups of each other (admitted together — batch-internal
    dups are out of scope) crashes after the index append but before
    the manifest commit.  On replay, each would find its PEER's index
    copy and be screened out — unless already-indexed batch rows are
    re-admitted verbatim.  The sink content must be id-stable."""
    import json

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        filter_unindexed_ids,
    )

    idx = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=30, seed=3), idx, num_hashes=8, bands=4, n_buckets=16
    )
    rnd = random.Random(88)
    twin_text = _doc(rnd)  # 600/601 are exact peers → mutual near-dups
    stored_text = _corpus(spark, n=30, seed=3).collect()[4]["text"]
    batch = spark.createDataFrame(
        [(600, twin_text), (601, twin_text), (602, stored_text)],
        "doc_id long, text string",
    )
    sink = str(tmp_path / "sink")

    def run_batch_body():
        # novelty_stream_fuzzy's foreachBatch body, sans the manifest
        # batch-id commit — the crash window itself
        unindexed = filter_unindexed_ids(spark, idx, batch).localCheckpoint()
        landed = batch.join(
            unindexed.select("doc_id"), "doc_id", "left_anti"
        )
        survivors = filter_new_against_index(
            spark, idx, unindexed, 0.9
        ).localCheckpoint()
        survivors.unionByName(landed).write.mode("overwrite").parquet(
            f"{sink}/batch_id=0"
        )
        append_minhash_index(spark, idx, survivors)

    run_batch_body()
    landed1 = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert landed1 == [600, 601]  # peers admitted together; 602 screened
    man1 = json.loads(_read_text(spark, idx, MANIFEST))
    assert man1["n_docs"] == 32

    run_batch_body()  # the replay
    landed2 = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert landed2 == [600, 601]  # NOT screened out via their peers
    man2 = json.loads(_read_text(spark, idx, MANIFEST))
    assert man2["n_docs"] == 32
    assert man2["rows_per_bucket"] == man1["rows_per_bucket"]


@pytest.mark.slow
def test_delete_by_id_lifecycle(spark, tmp_path):
    """The takedown verb: delete is logical + immediate (next probe
    excludes the ids), append of a tombstoned id refuses, compaction
    physically purges (manifest reconciles, health green, tombstones
    cleared), after which the id may be re-appended; reband refuses
    while deletes are pending."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        compact_minhash_index,
        delete_from_minhash_index,
        reband_minhash_index,
    )

    path = str(tmp_path / "mhidx")
    corpus = _corpus(spark, n=40, seed=3)
    write_minhash_index(corpus, path, num_hashes=8, bands=4, n_buckets=8)

    # probe with exact copies of stored docs 0..7 under fresh ids
    batch = spark.createDataFrame(
        [(9000 + r["doc_id"], r["text"]) for r in corpus.collect()[:8]],
        "doc_id long, text string",
    )
    before = {
        (r["batch_id"], r["index_id"])
        for r in probe_minhash_index(spark, path, batch).collect()
    }
    victims = sorted({i for _, i in before})[:2]
    assert victims, "probe must hit before the delete test can mean anything"

    stats = delete_from_minhash_index(spark, path, victims)
    assert stats["requested"] == 2
    assert stats["pending_purge"] == 2
    # idempotent: re-delete changes nothing
    stats2 = delete_from_minhash_index(spark, path, victims)
    assert stats2["tombstones_total"] == 2

    after_del = {
        (r["batch_id"], r["index_id"])
        for r in probe_minhash_index(spark, path, batch).collect()
    }
    assert after_del == {p for p in before if p[1] not in set(victims)}

    # tombstoned ids cannot be re-appended pre-purge
    rnd = random.Random(99)
    readd = spark.createDataFrame(
        [(victims[0], _doc(rnd))], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="tombstoned"):
        append_minhash_index(spark, path, readd)
    # and reband refuses to carry pending deletes forward
    with pytest.raises(ValueError, match="pending deletes"):
        reband_minhash_index(spark, path, str(tmp_path / "idx2"), bands=4)

    out = compact_minhash_index(spark, path)
    assert out["purge"]["sigs"]["rows_dropped"] == 2
    assert out["purge"]["bands"]["rows_dropped"] == 2 * 4  # bands per doc
    man = json.loads(_read_text(spark, path, MANIFEST))
    assert man["n_docs"] == 38
    assert man["purged_total"] == 2
    assert "n_tombstones" not in man and "n_deleted_pending" not in man
    # the purge commit unreferences the tombstone files; the physical
    # store waits for vacuum
    assert man["tombstone_files"] == []
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    vacuum_minhash_index(spark, path)
    tdir = os.path.join(path, "_tombstones")
    assert not os.path.exists(tdir) or not [
        f for f in os.listdir(tdir) if not f.startswith((".", "_"))
    ]
    health = minhash_index_health(spark, path)
    assert health.filter(~F.col("ok")).count() == 0

    # physical answer identical to the logical one
    after_purge = {
        (r["batch_id"], r["index_id"])
        for r in probe_minhash_index(spark, path, batch).collect()
    }
    assert after_purge == after_del

    # the id is free again post-purge
    man2 = append_minhash_index(spark, path, readd)
    assert man2["n_docs"] == 39
    # second compact with no tombstones: no purge block
    assert "purge" not in compact_minhash_index(spark, path)


def test_writer_lock_fences_second_writer(spark, tmp_path):
    """Two writers, one index: the loser fails CLEANLY (naming the
    holder) instead of interleaving file swaps; a crashed same-host
    holder's lock is auto-broken; a foreign-host lock needs the
    explicit break verb; the lock is reentrant in-process and always
    released afterwards."""
    import json
    import os
    import socket

    from sparvi_core_spark.sources.ann_index import (
        break_writer_lock,
        writer_lock,
    )
    from sparvi_core_spark.sources.minhash_index import (
        compact_minhash_index,
    )

    path = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=20, seed=3), path, num_hashes=8, bands=4,
        n_buckets=8,
    )
    rnd = random.Random(5)
    batch = spark.createDataFrame(
        [(700, _doc(rnd))], "doc_id long, text string"
    )
    lockfile = os.path.join(path, "_writer.lock")

    def plant(pid, host):
        with open(lockfile, "w") as f:
            json.dump({"pid": pid, "host": host, "op": "compact",
                       "token": "t"}, f)

    # live holder (pid 1 is always alive) on THIS host → clean refusal
    plant(1, socket.gethostname())
    with pytest.raises(RuntimeError, match="locked by another writer"):
        append_minhash_index(spark, path, batch)
    with pytest.raises(RuntimeError, match="locked by another writer"):
        compact_minhash_index(spark, path)
    assert os.path.exists(lockfile)  # loser must not remove it

    # crashed same-host holder (dead pid) → auto-broken, verb proceeds
    plant(999_999_999, socket.gethostname())
    man = append_minhash_index(spark, path, batch)
    assert man["n_docs"] == 21
    assert not os.path.exists(lockfile)  # released on exit

    # foreign-host lock: never auto-broken, explicit break verb works
    plant(1, "some-other-host")
    with pytest.raises(RuntimeError, match="locked by another writer"):
        compact_minhash_index(spark, path)
    broken = break_writer_lock(spark, path)
    assert broken["host"] == "some-other-host"
    compact_minhash_index(spark, path)  # proceeds now

    # reentrant: a held lock admits this process's own nested verbs
    with writer_lock(spark, path, "outer"):
        batch2 = spark.createDataFrame(
            [(701, _doc(rnd))], "doc_id long, text string"
        )
        append_minhash_index(spark, path, batch2)
        assert os.path.exists(lockfile)  # still held by the outer scope
    assert not os.path.exists(lockfile)


def test_writer_lock_release_checks_ownership(spark, tmp_path):
    """Round-10 ADVICE: if an operator break_writer_lock's a LIVE
    holder and a new writer acquires, the original holder's exit must
    NOT delete the new holder's lock (token mismatch) — deleting it
    would silently re-open the two-writer window the lock exists to
    prevent."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import (
        break_writer_lock,
        writer_lock,
    )

    path = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=10, seed=3), path, num_hashes=8, bands=4,
        n_buckets=8,
    )
    lockfile = os.path.join(path, "_writer.lock")

    with writer_lock(spark, path, "op-a"):
        assert os.path.exists(lockfile)
        break_writer_lock(spark, path)  # operator error on a live holder
        # a second writer (another process) acquires the freed lock
        with open(lockfile, "w") as f:
            json.dump(
                {"pid": 1, "host": "other-host", "op": "append",
                 "token": "theirs"}, f,
            )
    # op-a's exit captured the lock by RENAME, saw a foreign token,
    # and put it straight back (r11: the rename-aside closes the old
    # read-check-delete window) — no release tombstone left behind
    assert os.path.exists(lockfile)
    with open(lockfile) as f:
        assert json.load(f)["token"] == "theirs"
    assert not [
        f for f in os.listdir(path) if f.startswith("_writer.lock.rel-")
    ]
    break_writer_lock(spark, path)  # cleanup
    assert not os.path.exists(lockfile)

    # normal path: own token → released on exit
    with writer_lock(spark, path, "op-b"):
        assert os.path.exists(lockfile)
    assert not os.path.exists(lockfile)


def test_compact_after_appends_preserves_answers(spark, tmp_path):
    """Three appended generations fragment both stores; compaction
    folds each bucket back to one file, the manifest still matches
    disk, and the probe answer is BYTE-IDENTICAL pre/post."""
    import os

    from sparvi_core_spark.sources.minhash_index import (
        compact_minhash_index,
        repair_minhash_index,
    )

    path = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=40, seed=3), path,
        num_hashes=8, bands=4, n_buckets=8,
    )
    for g, seed in enumerate((8, 9, 10), start=1):
        append_minhash_index(
            spark, path, _corpus(spark, n=20, seed=seed, offset=1000 * g)
        )

    def _files(root):
        out = 0
        for dirpath, _, files in os.walk(root):
            if "bucket=" in dirpath:
                out += sum(
                    1 for f in files if not f.startswith((".", "_"))
                )
        return out

    batch = _corpus(spark, n=6, seed=3, offset=90_000)  # copies of gen-0
    before_files = _files(path)
    before = sorted(
        map(tuple, probe_minhash_index(spark, path, batch).collect())
    )
    assert repair_minhash_index(spark, path) == {
        "bands": "clean", "sigs": "clean",
    }
    stats = compact_minhash_index(spark, path)
    assert stats["bands"]["cells_compacted"] > 0
    assert stats["sigs"]["cells_compacted"] > 0
    # replaced files are retired, not deleted in place — the physical
    # count shrinks only after vacuum (pinned probes keep working)
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    vacuum_minhash_index(spark, path)
    after_files = _files(path)
    assert after_files < before_files
    after = sorted(
        map(tuple, probe_minhash_index(spark, path, batch).collect())
    )
    assert after == before and before
    assert all(r["ok"] for r in minhash_index_health(spark, path).collect())
    # second compaction is a no-op
    again = compact_minhash_index(spark, path)
    assert again["bands"]["cells_compacted"] == 0
    assert again["sigs"]["cells_compacted"] == 0


def test_reband_from_signatures_equals_fresh_build(spark, tmp_path):
    """Re-banding from the stored signature store produces an index
    whose probe output is EXACTLY a fresh build's at the new banding —
    without touching any text."""
    import pytest as _pytest

    from sparvi_core_spark.sources.minhash_index import (
        reband_minhash_index,
    )

    docs = _corpus(spark, n=60, seed=3)
    src = str(tmp_path / "src_idx")
    write_minhash_index(docs, src, num_hashes=16, bands=4, n_buckets=16)

    dest = str(tmp_path / "rebanded")
    man = reband_minhash_index(spark, src, dest, threshold=0.5)
    fresh = str(tmp_path / "fresh")
    fman = write_minhash_index(
        docs, fresh, num_hashes=16, bands=man["bands"],
        threshold=0.5, n_buckets=16,
    )
    assert man["bands"] == fman["bands"]
    assert man["rows_per_bucket"] == fman["rows_per_bucket"]
    assert man["n_docs"] == fman["n_docs"] == 60

    batch = _corpus(spark, n=10, seed=3, offset=7000)  # copies
    got = sorted(map(tuple, probe_minhash_index(spark, dest, batch).collect()))
    want = sorted(map(tuple, probe_minhash_index(spark, fresh, batch).collect()))
    assert got == want and got

    with _pytest.raises(ValueError, match="blue/green"):
        reband_minhash_index(spark, src, src, threshold=0.5)
    with _pytest.raises(ValueError, match="threshold or bands"):
        reband_minhash_index(spark, src, dest)


def test_compact_if_trigger_gauges_both_stores(spark, tmp_path):
    """The auto-compaction knob: below the threshold the gauge is a
    pure directory listing (nothing compacts); once small appends push
    some bucket past it, the fold runs and the probe answer is
    unchanged; a repeat call is a no-op again."""
    from sparvi_core_spark.sources.ann_index import store_fragmentation
    from sparvi_core_spark.sources.minhash_index import (
        compact_minhash_index_if,
    )

    path = str(tmp_path / "mhidx")
    corpus = _corpus(spark, n=40, seed=3)
    write_minhash_index(corpus, path, num_hashes=8, bands=4, n_buckets=8)
    for g, seed in enumerate((8, 9, 10), start=1):
        append_minhash_index(
            spark, path, _corpus(spark, n=15, seed=seed, offset=1000 * g)
        )
    frag0 = store_fragmentation(spark, path)
    assert frag0["max_files_per_bucket"] >= 3  # base + 3 appends fragment

    batch = spark.createDataFrame(
        [(9000 + r["doc_id"], r["text"]) for r in corpus.collect()[:8]],
        "doc_id long, text string",
    )
    before = {
        (r["batch_id"], r["index_id"])
        for r in probe_minhash_index(spark, path, batch).collect()
    }

    # high threshold: gauge only, nothing folds
    out = compact_minhash_index_if(spark, path, max_files_per_bucket=64)
    assert out["compacted"] is False and "stats" not in out
    assert set(out["fragmentation"]) == {"bands", "sigs", "staging"}
    assert out["max_files_per_bucket"] == max(
        out["fragmentation"]["bands"]["max_files_per_bucket"],
        out["fragmentation"]["sigs"]["max_files_per_bucket"],
    )

    # low threshold: the fold runs, both stores end at 1 file/bucket
    out2 = compact_minhash_index_if(spark, path, max_files_per_bucket=2)
    assert out2["compacted"] is True
    assert out2["stats"]["bands"]["cells_compacted"] > 0
    # replaced files are retired, not deleted under a possible reader;
    # vacuum brings the physical layout to 1 file/bucket
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    vacuum_minhash_index(spark, path)
    assert store_fragmentation(spark, path)["max_files_per_bucket"] == 1
    assert (
        store_fragmentation(spark, f"{path}/_sigs")["max_files_per_bucket"]
        == 1
    )
    after = {
        (r["batch_id"], r["index_id"])
        for r in probe_minhash_index(spark, path, batch).collect()
    }
    assert after == before

    # already folded: listing no-op
    out3 = compact_minhash_index_if(spark, path, max_files_per_bucket=2)
    assert out3["compacted"] is False

    with pytest.raises(ValueError, match="max_files_per_bucket"):
        compact_minhash_index_if(spark, path, max_files_per_bucket=0)


@pytest.mark.slow
def test_novelty_stream_midstream_delete_and_auto_compact(spark, tmp_path):
    """Takedown between two foreachBatch ticks: the deleted doc (a)
    stops screening new near-dups immediately — the next trigger
    ADMITS a copy of it — and (b) is physically purged by the
    in-stream auto-compact, which also folds the appended small files
    (probe latency stays flat without an operator-scheduled compact)."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import (
        _read_text,
        store_fragmentation,
    )
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        delete_from_minhash_index,
    )
    from sparvi_core_spark.streaming.dedup_stream import novelty_stream_fuzzy

    store = _corpus(spark, n=30, seed=3)
    victim = store.collect()[5]
    idx = str(tmp_path / "mhidx")
    write_minhash_index(store, idx, num_hashes=8, bands=4, n_buckets=16)

    rnd = random.Random(33)
    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(100, _doc(rnd)), (101, victim["text"])], schema
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_stream():
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = novelty_stream_fuzzy(
            stream, idx, sink, threshold=0.9, checkpoint=ckpt,
            auto_compact=1, auto_vacuum=0.0,
        )
        q.awaitTermination(120)

    run_stream()  # trigger 1: 101 duplicates the stored victim
    landed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert landed == {100}

    # takedown between ticks
    delete_from_minhash_index(spark, idx, [victim["doc_id"]])

    b2 = spark.createDataFrame(
        [(200, victim["text"]), (201, _doc(rnd))], schema
    )
    b2.coalesce(1).write.parquet(str(src / "b2"))
    run_stream()  # trigger 2

    landed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    # (a) the deleted doc no longer screens its near-copies: 200 lands
    assert landed == {100, 200, 201}
    # (b) the in-stream auto-compact purged the tombstone: the commit
    # unreferences the tombstone files (physical store waits for vacuum)
    man = json.loads(_read_text(spark, idx, MANIFEST))
    assert man["tombstone_files"] == []
    assert man["purged_total"] == 1
    assert man["last_stream_batch_id"] == 1
    # 30 stored - 1 purged + 3 admitted across both triggers
    assert man["n_docs"] == 32
    # and the appends were folded: both stores' LIVE file sets back at
    # 1 file/bucket (what a probe opens — retired files await vacuum)
    from sparvi_core_spark.sources.ann_index import live_fragmentation

    assert live_fragmentation(man["files"]["bands"])[
        "max_files_per_bucket"
    ] == 1
    assert live_fragmentation(man["files"]["sigs"])[
        "max_files_per_bucket"
    ] == 1
    # vacuum brings the PHYSICAL layout to match
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    vacuum_minhash_index(spark, idx)
    assert store_fragmentation(spark, idx)["max_files_per_bucket"] == 1
    assert (
        store_fragmentation(spark, f"{idx}/_sigs")["max_files_per_bucket"]
        == 1
    )
    health = minhash_index_health(spark, idx)
    assert health.filter(~F.col("ok")).count() == 0


@pytest.mark.slow
def test_staged_append_probe_parity_and_fold(spark, tmp_path):
    """The O(1)-file append path: a staged append creates exactly TWO
    files (one per store), probes/screens/health see staged rows
    transparently (probe == a twin index built with normal appends),
    and compaction folds staging into the bucket partitions with the
    answer byte-identical and the staging tree gone."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        _staging_files,
        compact_minhash_index,
        delete_from_minhash_index,
        filter_unindexed_ids,
    )

    base = _corpus(spark, n=40, seed=3)
    a, b = str(tmp_path / "normal"), str(tmp_path / "staged")
    for p in (a, b):
        write_minhash_index(base, p, num_hashes=8, bands=4, n_buckets=8)
    gens = [
        _corpus(spark, n=12, seed=s, offset=1000 * g)
        for g, s in enumerate((8, 9), start=1)
    ]
    for gen in gens:
        append_minhash_index(spark, a, gen)
        append_minhash_index(spark, b, gen, staged=True)

    # exactly 2 staged files per staged append, zero bucket-dir churn
    assert len(_staging_files(spark, b, "bands")) == 2
    assert len(_staging_files(spark, b, "sigs")) == 2

    man_a = json.loads(_read_text(spark, a, MANIFEST))
    man_b = json.loads(_read_text(spark, b, MANIFEST))
    assert man_a["n_docs"] == man_b["n_docs"] == 64
    assert man_a["rows_per_bucket"] == man_b["rows_per_bucket"]

    batch = spark.createDataFrame(
        [(9000 + r["doc_id"], r["text"])
         for r in base.collect()[:4] + gens[1].collect()[:4]],
        "doc_id long, text string",
    )
    probe_a = sorted(map(tuple, probe_minhash_index(spark, a, batch).collect()))
    probe_b = sorted(map(tuple, probe_minhash_index(spark, b, batch).collect()))
    assert probe_a == probe_b and len(probe_b) >= 8

    # the replay screen sees staged ids
    assert filter_unindexed_ids(spark, b, gens[0]).count() == 0
    assert all(
        r["ok"] for r in minhash_index_health(spark, b).collect()
    )

    # a takedown of a STILL-STAGED id: immediate logically, physically
    # purged by the same compact that folds the staging store
    victim = int(gens[0].collect()[0]["doc_id"])
    delete_from_minhash_index(spark, b, [victim])
    assert not any(
        r["index_id"] == victim
        for r in probe_minhash_index(spark, b, batch).collect()
    )

    out = compact_minhash_index(spark, b)
    assert "staging" in out and out["staging"]["bands"]["rows_folded"] > 0
    assert out["purge"]["sigs"]["rows_dropped"] == 1
    # the fold's commit unreferenced staging; the physical files wait
    # for vacuum (a probe planned pre-fold may still hold them)
    man_fold = json.loads(_read_text(spark, b, MANIFEST))
    assert man_fold["staging_files"] == {"bands": [], "sigs": []}
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    assert vacuum_minhash_index(spark, b)["files_vacuumed"] > 0
    assert not _staging_files(spark, b, "bands")
    probe_b2 = sorted(
        map(tuple, probe_minhash_index(spark, b, batch).collect())
    )
    assert probe_b2 == [p for p in probe_b if p[1] != victim]
    assert all(r["ok"] for r in minhash_index_health(spark, b).collect())
    man_b2 = json.loads(_read_text(spark, b, MANIFEST))
    assert man_b2["n_docs"] == 63 and man_b2["purged_total"] == 1
    # second compact: nothing staged, no staging block
    assert "staging" not in compact_minhash_index(spark, b)


def test_compact_if_triggers_on_staging_and_repair_extra_old(
    spark, tmp_path
):
    """The staging gauge: staged files count as per-bucket fan-in
    (every probe reads all of them), so enough staged appends trip
    compact_minhash_index_if even with clean bucket dirs; and the
    journal's extra_old entries are deleted by repair on roll-forward."""
    import json
    import os

    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        _staging_files,
        compact_minhash_index_if,
    )

    path = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=30, seed=3), path, num_hashes=8, bands=4,
        n_buckets=8,
    )
    for g, s in enumerate((8, 9, 10), start=1):
        append_minhash_index(
            spark, path, _corpus(spark, n=10, seed=s, offset=1000 * g),
            staged=True,
        )
    # bucket dirs are clean (1 file each) — only staging is fragmented
    out = compact_minhash_index_if(spark, path, max_files_per_bucket=64)
    assert out["compacted"] is False
    assert out["fragmentation"]["staging"]["total_files"] == 6
    assert out["fragmentation"]["bands"]["max_files_per_bucket"] == 1
    out2 = compact_minhash_index_if(spark, path, max_files_per_bucket=4)
    # 6 staged files > 4 with clean bucket dirs -> the CHEAP tier:
    # append-shaped staging fold, no store rewrite
    assert out2["folded"] is True and out2["compacted"] is False
    assert out2["stats"]["bands"]["rows_folded"] == 30 * 4  # 30 docs x 4 bands
    # the fold's commit unreferences staging; physical files await vacuum
    man = json.loads(_read_text(spark, path, MANIFEST))
    assert man["staging_files"] == {"bands": [], "sigs": []}
    assert len(_staging_files(spark, path, "bands")) == 3
    out3 = compact_minhash_index_if(spark, path, max_files_per_bucket=4)
    # post-fold each touched bucket is at store+fold = 2 LIVE files <= 4
    assert out3["compacted"] is False and out3["folded"] is False

    # vacuum retires the consumed staging files (and nothing live)
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    out4 = vacuum_minhash_index(spark, path)
    assert out4["files_vacuumed"] >= 6
    assert not _staging_files(spark, path, "bands")
    assert not _staging_files(spark, path, "sigs")

    # a journaled swap whose new file the manifest never referenced is
    # rolled BACK by repair — the half-landed file is deleted, the
    # store untouched (snapshot rule; extra_old staging files are left
    # alone: they are vacuum's, not repair's)
    from sparvi_core_spark.sources.minhash_index import (
        repair_minhash_index,
    )

    cell = sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    )[0]
    b = cell.split("=")[1]
    partial = os.path.join(path, cell, "never-committed.parquet")
    with open(partial, "w") as f:
        f.write("x")
    with open(os.path.join(path, "_compact_journal.json"), "w") as f:
        json.dump(
            {"cells": {b: {"new": ["never-committed.parquet"],
                           "old": []}}},
            f,
        )
    rep = repair_minhash_index(spark, path)
    assert rep["bands"] == "rolled_back"
    assert not os.path.exists(partial)


@pytest.mark.slow
def test_novelty_stream_reemitted_id_and_crash_replay(spark, tmp_path):
    """(a) NORMAL path: an upstream that re-emits an already-indexed
    id (even with changed text) is dropped — not novel, never
    re-appended, its text never bypasses the near-dup screen. (b) A
    crashed attempt — work done, single manifest commit missing —
    leaves its appended rows referenced by NOTHING (snapshot
    commits), so the replay re-runs the identical screen against the
    committed index and appends again; no intent marker, no landed
    split, exactly-once by construction."""
    import json
    import os

    import pytest

    from sparvi_core_spark.sources import writers as W
    from sparvi_core_spark.sources.ann_index import _read_text
    from sparvi_core_spark.sources.minhash_index import (
        MANIFEST,
        _sig_rows,
    )
    from sparvi_core_spark.streaming.dedup_stream import novelty_stream_fuzzy

    idx = str(tmp_path / "mhidx")
    write_minhash_index(
        _corpus(spark, n=30, seed=3), idx, num_hashes=8, bands=4,
        n_buckets=16,
    )
    rnd = random.Random(55)
    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = novelty_stream_fuzzy(
            stream, idx, sink, threshold=0.9, checkpoint=ckpt
        )
        q.awaitTermination(120)

    # batch 0 admits two novel docs
    b1 = spark.createDataFrame(
        [(100, _doc(rnd)), (101, _doc(rnd))], schema
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    run_stream()
    assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {
        100, 101,
    }

    # (a) NORMAL path: batch 1 re-emits id 100 with CHANGED text plus
    # one novel doc — the re-emission is dropped, the novel doc lands,
    # the index never gets a duplicate id
    b2 = spark.createDataFrame(
        [(100, _doc(rnd)), (102, _doc(rnd))], schema
    )
    b2.coalesce(1).write.parquet(str(src / "b2"))
    run_stream()
    assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {
        100, 101, 102,
    }
    man_a = json.loads(_read_text(spark, idx, MANIFEST))
    sigs = _sig_rows(spark, idx, man_a)
    assert sigs.count() == sigs.select("id").distinct().count() == 33

    # (b) crashed-attempt replay through the REAL sink: batch 2's
    # first attempt does all its work but dies at the manifest commit
    b3 = spark.createDataFrame(
        [(200, _doc(rnd)), (201, _doc(rnd))], schema
    )
    b3.coalesce(1).write.parquet(str(src / "b3"))
    real = W._hadoop_write_text

    def boom(sp, dir_path, name, text):
        if name == MANIFEST and json.loads(text).get(
            "last_stream_batch_id"
        ) == 2:
            raise RuntimeError("simulated crash")
        return real(sp, dir_path, name, text)

    W._hadoop_write_text = boom
    try:
        with pytest.raises(Exception, match="simulated crash"):
            run_stream()
    finally:
        W._hadoop_write_text = real
    # work landed physically, commit didn't: readers see NOTHING of it
    man = json.loads(_read_text(spark, idx, MANIFEST))
    assert man["last_stream_batch_id"] == 1
    sigs = _sig_rows(spark, idx, man)
    assert sigs.count() == 33
    assert {
        r["id"] for r in sigs.filter(F.col("id") >= 200).collect()
    } == set()

    run_stream()  # the replay — same screen, same survivors, appended
    assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {
        100, 101, 102, 200, 201,
    }
    man = json.loads(_read_text(spark, idx, MANIFEST))
    assert man["last_stream_batch_id"] == 2
    sigs = _sig_rows(spark, idx, man)
    assert sigs.count() == sigs.select("id").distinct().count() == 35
    # the crashed attempt's orphans are vacuum food
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    out = vacuum_minhash_index(spark, idx)
    assert out["files_vacuumed"] > 0
    sigs2 = _sig_rows(
        spark, idx, json.loads(_read_text(spark, idx, MANIFEST))
    )
    assert sigs2.count() == 35
