"""JDBC source — the reference's warehouse-first usage (reference:
sparvi/db/connection.py:23-305, gated live tests tests/test_db.py:58-157)
re-expressed as a Spark JDBC scan, exercised against embedded Derby
(ships in Spark's jars — no external service needed)."""

import pytest
from click.testing import CliRunner

from sparvi_core_spark import profile_table, read_jdbc
from sparvi_core_spark.cli.main import cli
from sparvi_core_spark.session import read_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """Embedded Derby DB seeded with a small table; yields its JDBC URL."""
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i * 10)) for i in range(20)],
        "id int, name string, val double",
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_read_jdbc_roundtrip(spark, derby):
    back = read_jdbc(spark, derby, "people", driver=DERBY_DRIVER)
    assert back.count() == 20
    assert [f.name for f in back.schema] == ["id", "name", "val"]


def test_read_table_jdbc_fmt(spark, derby):
    back = read_table(spark, derby, jdbc_table="people", driver=DERBY_DRIVER)
    assert back.count() == 20
    with pytest.raises(ValueError, match="jdbc_table"):
        read_table(spark, derby)


def test_jdbc_pushdown(spark, derby):
    """Predicates and column pruning must reach the JDBC scan — the
    whole point of profiling a warehouse through Spark instead of
    SELECT *'ing it over the wire."""
    back = read_jdbc(spark, derby, "people", driver=DERBY_DRIVER)
    plan = (
        back.filter(back.id > 10)
        .select("name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(id,10)" in plan
    assert "ReadSchema: struct<name:string>" in plan


def test_jdbc_subquery_and_partitioned_read(spark, derby):
    # Spark writes tables with quoted (case-exact) identifiers, so the
    # Derby subquery must quote them too
    sub = read_jdbc(
        spark,
        derby,
        '(select "id", "val" from people where "id" < 10) t',
        driver=DERBY_DRIVER,
        partition_column='"id"',
        lower_bound=0,
        upper_bound=10,
        num_partitions=3,
    )
    assert sub.count() == 10
    assert sub.rdd.getNumPartitions() == 3
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, derby, "people", partition_column="id")


def test_profile_jdbc_table(spark, derby):
    back = read_jdbc(spark, derby, "people", driver=DERBY_DRIVER)
    p = profile_table(spark, "people_jdbc", df=back, include_samples=False)
    assert p["row_count"] == 20
    assert p["numeric_stats"]["val"]["avg"] == 95.0
    assert p["completeness"]["name"]["nulls"] == 0


def test_cli_profile_jdbc(spark, derby):
    """CLI profile over a jdbc: source (driver autoloads off the
    classpath for derby URLs)."""
    r = CliRunner().invoke(
        cli, ["profile", derby, "people", "--format", "minimal"]
    )
    assert r.exit_code == 0, r.output
    assert "Row count: 20" in r.output


def test_cli_env_fallback(spark, sf_dir, monkeypatch):
    """Reference parity: with one positional arg (TABLE), the source
    comes from SPARVI_SOURCE / DATABASE_URL (env.py:88-112)."""
    monkeypatch.setenv("SPARVI_SOURCE", sf_dir)
    r = CliRunner().invoke(cli, ["profile", "region", "--format", "minimal"])
    assert r.exit_code == 0, r.output
    assert "Row count" in r.output
    monkeypatch.delenv("SPARVI_SOURCE")
    r2 = CliRunner().invoke(cli, ["profile", "region", "--format", "minimal"])
    assert r2.exit_code != 0
    assert "SPARVI_SOURCE" in r2.output


def test_cli_validate_env_fallback(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARVI_SOURCE", sf_dir)
    r = CliRunner().invoke(cli, ["validate", "nation", "--generate-defaults"])
    assert r.exit_code == 0, r.output
    assert "passed" in r.output


def test_cli_profile_jdbc_schema_qualified(spark, derby):
    """A schema-qualified warehouse table name (the normal JDBC case) is
    not a valid temp-view name — the CLI must sanitize the view name
    while keeping the original for the JDBC dbtable option."""
    r = CliRunner().invoke(
        cli, ["profile", derby, "APP.people", "--format", "minimal"]
    )
    assert r.exit_code == 0, r.output
    assert "Row count: 20" in r.output
