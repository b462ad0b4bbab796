"""SparkSession factory + source registry.

Replaces the reference's whole connection layer (SQLAlchemy engines per
warehouse, ``sparvi/db/connection.py:23-305``) with one Spark engine:
tables are paths (parquet/csv/json/orc) or existing temp views, and all
query shapes run through Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# The driver-provided synthetic star schema (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "sparvi-core-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for analytics.

    AQE on (runtime partition coalescing + skew-join handling), Arrow on
    (fast toPandas / pandas UDFs). On a real cluster ``master`` comes from
    the environment; tests pass ``local[n]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # session timezone pinned so date math is deterministic across
        # driver/oracle environments
        "spark.sql.session.timeZone": "UTC",
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) is
        # unreadable by Spark natively; read as long and convert on
        # registration (see register_views)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Read a warehouse table over JDBC — the reference's warehouse-first
    usage (reference: ``sparvi/db/connection.py:23-305``) expressed as a
    Spark source. Catalyst pushes predicates and column pruning into the
    JDBC scan (``PushedFilters`` in the plan), so profiler/validator
    queries don't drag the whole table over the wire.

    ``table`` may be a table name or a parenthesized subquery alias
    (``"(select ...) t"``). For large tables pass ``partition_column`` +
    bounds + ``num_partitions`` so Spark opens parallel range-bounded
    connections instead of one serial cursor — the 100 TB-warehouse path.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_table(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    jdbc_table: str | None = None,
    **jdbc_kwargs,
) -> DataFrame:
    """Resolve a table reference: existing view/catalog name, a path, or
    a JDBC URL (``jdbc:...`` — pass the table via ``jdbc_table``).

    Format inferred from the extension when not given (parquet default —
    the columnar format this engine is designed around).
    """
    if fmt == "jdbc" or source.startswith("jdbc:"):
        if not jdbc_table:
            raise ValueError("JDBC sources need jdbc_table=<table or subquery>")
        return read_jdbc(spark, source, jdbc_table, **jdbc_kwargs)
    if not os.path.exists(source) and not source.endswith(
        (".parquet", ".csv", ".json", ".orc")
    ):
        # not a filesystem path → treat as a catalog/temp-view name
        return spark.table(source)
    if fmt is None:
        for ext in ("parquet", "csv", "json", "orc"):
            if source.rstrip("/").endswith(ext):
                fmt = ext
                break
        else:
            fmt = "parquet"
    reader = spark.read
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", "true").csv(source)
    return reader.format(fmt).load(source)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (``spark.sql.legacy.parquet.nanosAsLong``); we restore them to
    timestamps (microsecond precision) after the scan.

    ``path`` may be a single parquet file or a directory dataset
    (multi-file / partitioned stream sources) — directories resolve
    through ``pyarrow.dataset`` so the batch and stream readers agree on
    the restored schema."""
    try:
        import os

        import pyarrow as pa

        if os.path.isdir(path):
            import pyarrow.dataset as ds

            schema = ds.dataset(path, format="parquet").schema
        else:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_columns(path):
        df = df.withColumn(
            c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))")
        )
    return df


# current-registration memo per live SparkSession: every query entry
# calls register_views, and each registration pays one parquet
# schema-inference round per table (~1.2 s for the full testdata set —
# measured to dominate sub-second queries end-to-end). The memo only
# short-circuits when THIS session's current registration already is
# (sf_dir, tables), every view still exists, AND the directory
# fingerprint (per-table mtime+size from one os.stat each) is
# unchanged — a dataset regenerated in place re-registers instead of
# silently serving the first read's frozen file listing. Registering
# a different dir (or dropping a view) re-registers from scratch, so
# alternating directories in one session stays correct. Metadata
# only — no data or results are cached. The memo lives as an
# attribute ON the session object (not a module-level registry):
# registered DataFrames strongly reference their session, so any
# global map keyed by session would pin the session forever — this
# way the memo's lifetime IS the session wrapper's lifetime.
_VIEWS_ATTR = "_sparvi_views_current"


def _views_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> tuple:
    """One os.stat per table path: (mtime_ns, size) — a regenerated
    table directory (files added/removed/rewritten) changes either."""
    fp = []
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(path)
            fp.append((st.st_mtime_ns, st.st_size))
        except OSError:
            fp.append(None)
    return tuple(fp)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Register ``{sf_dir}/{name}.parquet`` as temp views; returns name→df."""
    key = (
        os.path.abspath(sf_dir),
        tuple(tables),
        _views_fingerprint(sf_dir, tables),
    )
    hit = getattr(spark, _VIEWS_ATTR, None)
    if (
        hit is not None
        and hit[0] == key
        # cheap liveness probe (~5 ms/table vs ~120 ms to re-register
        # one): a dropped view re-registers instead of staying missing
        and all(spark.catalog.tableExists(n) for n in hit[1])
    ):
        return dict(hit[1])
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = read_parquet_table(spark, path)
            df.createOrReplaceTempView(name)
            out[name] = df
    setattr(spark, _VIEWS_ATTR, (key, out))
    return dict(out)
