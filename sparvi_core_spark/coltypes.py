"""Column-type bucketing from a Spark ``StructType``.

The reference buckets warehouse type *strings* by substring match
(reference: ``sparvi/db/adapters.py:146-183``). On Spark the schema is
structured, so we classify exactly on ``DataType`` instances — same
buckets, no string heuristics:

- numeric  → all ``NumericType`` subclasses (incl. Decimal, matching the
  reference's ``decimal`` substring at adapters.py:157)
- date     → Date/Timestamp(NTZ) (adapters.py:159-170)
- text     → StringType (adapters.py:172-183)
- other    → everything else; profiled for nulls/distincts/frequency only
  (same fall-through as profile_engine.py:59-66)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DateType,
    MapType,
    NumericType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

NUMERIC = "numeric"
DATE = "date"
TEXT = "text"
OTHER = "other"


def is_orderable(dt: DataType) -> bool:
    """Whether Spark can group/sort/count-distinct this type.

    MapType (at any nesting depth) is not orderable — using it in a
    ``groupBy``/``count_distinct`` throws. The profiler excludes such
    columns from distinct/duplicate/frequency metrics instead of
    failing the whole profile (graceful degradation, mirroring the
    reference's per-metric try/except)."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return is_orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(is_orderable(f.dataType) for f in dt.fields)
    return True


def bucket_of(dt: DataType) -> str:
    if isinstance(dt, NumericType):
        return NUMERIC
    if isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
        return DATE
    if isinstance(dt, StringType):
        return TEXT
    return OTHER


@dataclass
class ColumnBuckets:
    all: list[str] = field(default_factory=list)
    numeric: list[str] = field(default_factory=list)
    text: list[str] = field(default_factory=list)
    date: list[str] = field(default_factory=list)
    other: list[str] = field(default_factory=list)
    #: columns safe for groupBy / count_distinct (excludes MapType etc.)
    groupable: list[str] = field(default_factory=list)
    types: dict[str, DataType] = field(default_factory=dict)


def bucket_columns(schema: StructType) -> ColumnBuckets:
    b = ColumnBuckets()
    for f in schema.fields:
        b.all.append(f.name)
        b.types[f.name] = f.dataType
        if is_orderable(f.dataType):
            b.groupable.append(f.name)
        kind = bucket_of(f.dataType)
        if kind == NUMERIC:
            b.numeric.append(f.name)
        elif kind == TEXT:
            b.text.append(f.name)
        elif kind == DATE:
            b.date.append(f.name)
        else:
            b.other.append(f.name)
    return b
