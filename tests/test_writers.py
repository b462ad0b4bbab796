"""Partitioned & bucketed sinks: pruning and shuffle-free co-located joins."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.plans import explain_str, pushed_filters
from sparvi_core_spark.sources.writers import write_bucketed, write_partitioned


def test_partitioned_write_prunes(spark, views, tmp_path):
    path = str(tmp_path / "orders_by_status")
    write_partitioned(views["orders"], path, ["o_orderstatus"])
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(df)
    # partition filter shows up as PartitionFilters, not a row filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert df.count() == views["orders"].filter("o_orderstatus = 'F'").count()


def test_bucketed_join_has_no_shuffle(spark, views):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(views["orders"], "b_orders", "o_custkey", 8)
    write_bucketed(views["customer"], "b_customer", "c_custkey", 8)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_training_shards_layout_and_determinism(spark, tmp_path):
    """write_training_shards: exactly one file per shard directory,
    shard membership and within-shard order identical across re-exports
    and input repartitionings."""
    import glob
    import os

    from sparvi_core_spark.sources.writers import write_training_shards

    df = spark.range(500).selectExpr(
        "id AS doc_id", "concat('text ', CAST(id AS STRING)) AS text"
    )
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_training_shards(df, p1, n_shards=8)
    write_training_shards(df.repartition(13), p2, n_shards=8)

    for p in (p1, p2):
        dirs = sorted(os.path.basename(d) for d in glob.glob(f"{p}/shard=*"))
        assert dirs == [f"shard={k}" for k in range(8)]
        for d in glob.glob(f"{p}/shard=*"):
            assert len(glob.glob(f"{d}/part-*.parquet")) == 1

    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    assert r1.count() == 500
    m1 = {r["shard"]: set() for r in r1.select("shard").distinct().collect()}
    for r in r1.collect():
        m1[r["shard"]].add(r["doc_id"])
    m2 = {k: set() for k in m1}
    for r in r2.collect():
        m2[r["shard"]].add(r["doc_id"])
    assert m1 == m2

    # within-shard row order identical across the two exports (read the
    # single part file directly: parquet preserves write order)
    import pyarrow.parquet as pq

    for k in range(8):
        f1 = glob.glob(f"{p1}/shard={k}/part-*.parquet")[0]
        f2 = glob.glob(f"{p2}/shard={k}/part-*.parquet")[0]
        ids1 = pq.read_table(f1, columns=["doc_id"])["doc_id"].to_pylist()
        ids2 = pq.read_table(f2, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids1 == ids2 and len(ids1) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, str(tmp_path / "bad"), n_shards=0)


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_interleave_bits_python_oracle(spark):
    """Morton code vs a pure-Python bit-interleave oracle."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.writers import interleave_bits

    def py_morton(vals, bits):
        z = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * len(vals) + j)
        return z

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85)]
    df = spark.createDataFrame(cases, ["a", "b"])
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r.z == py_morton([r.a, r.b], 8), (r.a, r.b)


def test_interleave_bits_validates(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.writers import interleave_bits

    with _pytest.raises(ValueError, match="63"):
        interleave_bits([F.col("a")] * 8, 8)
    with _pytest.raises(ValueError, match="at least one"):
        interleave_bits([], 8)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The layout claim, measured: a z-ordered table skips files for
    selective predicates on EITHER dimension; a linearly-sorted table
    only skips on its leading sort column."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.writers import (
        skipping_ratio,
        write_zordered,
        zone_map,
    )

    n = 50_000
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id", F.lit("x")), F.lit(1000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit("y")), F.lit(1000)).alias("y"),
        )
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], n_files=32, bits=8)
    (
        df.repartitionByRange(32, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zx = skipping_ratio(zone_map(spark, zpath, ["x", "y"]), "x", 100, 120)
    zy = skipping_ratio(zone_map(spark, zpath, ["x", "y"]), "y", 100, 120)
    lx = skipping_ratio(zone_map(spark, lpath, ["x", "y"]), "x", 100, 120)
    ly = skipping_ratio(zone_map(spark, lpath, ["x", "y"]), "y", 100, 120)

    assert lx > 0.8          # linear layout: leading column skips well
    assert ly < 0.2          # ...but the other dimension barely skips
    assert zx > 0.4 and zy > 0.4   # z-order: BOTH dimensions skip
    # and z-order must beat linear's non-leading dimension decisively
    assert min(zx, zy) > ly + 0.3


def test_zorder_uniform_mode_and_nulls(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparvi_core_spark.sources.writers import write_zordered

    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, None, 5.0), (3, 9.0, None), (4, 4.0, 4.0)],
        "id long, x double, y double",
    )
    p = str(tmp_path / "u")
    write_zordered(df, p, ["x", "y"], n_files=2, bits=4, mode="uniform")
    back = spark.read.parquet(p)
    assert back.count() == 4
    assert set(back.columns) == {"id", "x", "y"}  # __z dropped

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        write_zordered(df, p, ["x"], mode="nope")


def test_hadoop_text_write_is_torn_write_safe(spark, tmp_path):
    """Manifests are the indexes' commit points, so their writer must
    never leave a torn file: (a) a crash mid-tmp-write leaves the OLD
    content readable; (b) a crash between the delete and the rename
    leaves the fully-written tmp, which the reader falls back to AND
    heals; (c) a normal rewrite leaves no tmp behind."""
    import os

    from sparvi_core_spark.sources.writers import (
        _hadoop_read_text,
        _hadoop_write_text,
    )

    d = str(tmp_path / "store")
    os.makedirs(d)
    _hadoop_write_text(spark, d, "_m.json", '{"v": 1}')
    assert _hadoop_read_text(spark, d, "_m.json") == '{"v": 1}'
    assert not os.path.exists(os.path.join(d, "._m.json.tmp"))

    # (a) half-written tmp (the crash happened mid-write): the target
    # still reads the old content; the next full write overwrites the
    # garbage tmp
    with open(os.path.join(d, "._m.json.tmp"), "w") as f:
        f.write('{"v": 2')  # torn
    assert _hadoop_read_text(spark, d, "_m.json") == '{"v": 1}'
    _hadoop_write_text(spark, d, "_m.json", '{"v": 3}')
    assert _hadoop_read_text(spark, d, "_m.json") == '{"v": 3}'
    assert not os.path.exists(os.path.join(d, "._m.json.tmp"))

    # (b) crash between delete and rename: target missing, tmp is the
    # fully-written new content — the reader heals the swap. Recreate
    # the state through the FS API so no stale checksum sidecars
    # confuse the Hadoop read.
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(d).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    mk = jvm.org.apache.hadoop.fs.Path
    _hadoop_write_text(spark, d, "._m.json.tmp", '{"v": 4}')
    fs.delete(mk(d, "_m.json"), False)
    assert _hadoop_read_text(spark, d, "_m.json") == '{"v": 4}'
    assert os.path.exists(os.path.join(d, "_m.json"))  # healed
    assert not os.path.exists(os.path.join(d, "._m.json.tmp"))
