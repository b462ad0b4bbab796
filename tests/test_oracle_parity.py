"""Local mini-driver: every queries() entry vs its DuckDB oracle at sf0.01.

Mimics the driver's t2 gate (BASELINE.md): row count + column names +
order-insensitive value comparison. Values are normalized (numerics →
float64, everything else → string) and rows sorted by all columns, so a
pass here means the driver's value-hash compare will also pass, modulo
its exact hashing of floats — which is why every floating output in the
query pairs is rounded identically on both sides.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool).astype(str)
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), (
        f"{name}: columns {list(s.columns)} != oracle {list(d.columns)}"
    )
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"
            else:
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark_pdf = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        # non-SQL-expressible ops get the driver's weaker rows-only
        # check; locally we at least assert execution + rows
        assert len(spark_pdf) > 0, f"{name}: rows-only check found 0 rows"
        return
    duck_pdf = duck.execute(oracles[name]).df()
    _assert_frames_match(name, spark_pdf, duck_pdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
