"""Source registry: csv/json/orc round-trips through read_table, and the
hash-mode duplicate check."""

import pytest

from sparvi_core_spark import profile_table
from sparvi_core_spark.session import read_table


@pytest.fixture(scope="module")
def exported(spark, views, tmp_path_factory):
    base = tmp_path_factory.mktemp("sources")
    region = views["region"]
    paths = {}
    for fmt in ("csv", "json", "orc"):
        p = str(base / f"region_{fmt}.{fmt}")
        w = region.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", "true").csv(p)
        else:
            w.format(fmt).save(p)
        paths[fmt] = p
    return paths


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_read_table_formats(spark, exported, fmt):
    df = read_table(spark, exported[fmt], fmt=fmt)
    assert df.count() == 5
    assert set(df.columns) == {"r_regionkey", "r_name"}


def test_profile_csv_source(spark, exported):
    p = profile_table(spark, exported["csv"], include_samples=False)
    assert p["row_count"] == 5
    assert p["completeness"]["r_name"]["distinct_count"] == 5


def test_duplicate_modes_agree(spark, employees):
    full = profile_table(spark, "employees", include_samples=False)
    hashed = profile_table(
        spark,
        "employees",
        include_samples=False,
        config={"profiling": {"duplicate_check_mode": "hash"}},
    )
    assert full["duplicate_count"] == hashed["duplicate_count"] == 0


def test_duplicate_modes_agree_with_dups(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (2, None), (3, "c")],
        "id long, v string",
    )
    df.createOrReplaceTempView("dup_t")
    for mode in ("full", "hash"):
        p = profile_table(
            spark, "dup_t", include_samples=False,
            config={"profiling": {"duplicate_check_mode": mode}},
        )
        assert p["duplicate_count"] == 2, mode  # two duplicated groups


def test_nanos_columns_directory_dataset(tmp_path, sf_dir):
    """Directory datasets (multi-file stream sources) must detect nanos
    timestamp columns the same way single files do, so the stream
    schema matches the batch reader. Uses a self-written TIMESTAMP(NANOS)
    file — the driver testdata is microsecond-unit and must NOT be
    flagged."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparvi_core_spark.session import _nanos_timestamp_columns

    # micros-unit driver data: nothing to restore
    assert _nanos_timestamp_columns(os.path.join(sf_dir, "events.parquet")) == []

    single = str(tmp_path / "nanos.parquet")
    tbl = pa.table(
        {
            "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            "v": pa.array([1.5], pa.float64()),
        }
    )
    pq.write_table(tbl, single)
    assert _nanos_timestamp_columns(single) == ["ts"]
    d = tmp_path / "events_dir"
    d.mkdir()
    os.symlink(single, d / "part-0.parquet")
    assert _nanos_timestamp_columns(str(d)) == ["ts"]
