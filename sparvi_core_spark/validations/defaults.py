"""Default validation-rule generator — the 15 rule families.

Port of ``sparvi/validations/default_validations.py:11-481`` onto Spark:
schema comes from ``spark.table(name).schema`` instead of SQLAlchemy
inspection, and the generated ``query`` strings are Spark SQL (one
dialect — the reference's adapter layer disappears).

Parquet carries no PK/FK metadata, so key-dependent families (2, 14)
take optional ``primary_keys`` / ``foreign_keys`` hints and are skipped
without them — mirroring the reference's graceful FK fallback
(default_validations.py:35-37). Column-level NOT NULL still exists in
Spark schemas (``StructField.nullable``) and drives families 5 and the
empty-string check. VARCHAR length limits don't exist in Spark either,
so family 9a (max-length, default_validations.py:236-243) follows the
same hints pattern: pass ``column_length_hints={"col": n}`` to generate
``check_<col>_max_length`` rules; without hints the family is skipped.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from sparvi_core_spark.coltypes import DATE, NUMERIC, TEXT, bucket_of

UNIQUE_NAME_PATTERNS = ["id", "code", "number", "uuid", "guid", "key", "hash", "identifier"]
NEGATIVE_ALLOWED_PATTERNS = [
    "balance", "difference", "delta", "change", "temperature",
    "coordinate", "adjustment", "net", "profit_loss", "margin",
]
NON_ZERO_PATTERNS = [
    "price", "amount", "total", "cost", "rate", "fee", "tax",
    "revenue", "salary", "income", "expense",
]
PAST_DATE_PATTERNS = [
    "birth", "created", "start", "registered", "joined", "purchase",
    "transaction", "order", "payment", "issued", "shipped", "received",
]
END_DATE_PATTERNS = ["end", "finish", "completed", "closed", "expiry", "expiration"]
IMPORTANT_COLUMN_PATTERNS = [
    "name", "description", "address", "city", "state", "country", "postal", "zip",
    "email", "phone", "status", "type", "category", "price", "cost", "amount",
]
CATEGORICAL_COLUMN_PATTERNS = [
    "status", "type", "category", "level", "tier", "class", "grade",
    "priority", "severity", "state", "region", "stage", "gender",
]
REF_TABLE_PATTERNS = ["ref", "type", "status", "category", "lookup"]
LARGE_TABLE_PATTERNS = ["fact", "transaction", "event", "log", "history", "audit", "detail"]
MEDIUM_TABLE_PATTERNS = ["order", "customer", "user", "account", "product", "item"]
UPDATED_PATTERNS = ["updated", "modified", "edited", "changed"]
CREATED_PATTERNS = ["created", "inserted", "added"]
PHONE_REGEX = r"(\\+)?[0-9][0-9 ()-]+"


def _rule(name, description, query, operator="equals", expected_value=0):
    return {
        "name": name,
        "description": description,
        "query": query,
        "operator": operator,
        "expected_value": expected_value,
    }


def _matches(name: str, patterns: list[str]) -> bool:
    low = name.lower()
    return any(p in low for p in patterns)


def get_outlier_threshold(table_name: str) -> int:
    """Table-size heuristic (default_validations.py:465-481)."""
    if _matches(table_name, LARGE_TABLE_PATTERNS):
        return 50
    if _matches(table_name, MEDIUM_TABLE_PATTERNS):
        return 20
    return 5


def guess_start_date_column(end_date_column: str, columns: list[str]) -> str:
    """Name-pair heuristic (default_validations.py:428-462)."""
    start_term_map = {
        "end": "start", "finish": "start", "completed": "created",
        "closed": "opened", "expiry": "issue", "expiration": "issue",
    }
    low = end_date_column.lower()
    found = next((t for t in start_term_map if t in low), None)
    if found:
        candidate = low.replace(found, start_term_map[found])
        for c in columns:
            if c.lower() == candidate:
                return c
    for c in columns:
        cl = c.lower()
        if any(s in cl for s in ["start", "created", "opened", "issue", "begin"]) and any(
            d in cl for d in ["date", "time", "timestamp", "dt"]
        ):
            return c
    return end_date_column


def get_default_validations(
    spark: SparkSession,
    table_name: str,
    primary_keys: list[str] | None = None,
    foreign_keys: list[str] | None = None,
    column_length_hints: dict[str, int] | None = None,
) -> list[dict]:
    schema = spark.table(table_name).schema
    columns = [
        {"name": f.name, "bucket": bucket_of(f.dataType), "nullable": f.nullable}
        for f in schema.fields
    ]
    col_names = [c["name"] for c in columns]
    primary_keys = primary_keys or []
    foreign_keys = foreign_keys or []
    t = table_name
    rules: list[dict] = []

    # 1. table not empty
    rules.append(_rule(
        f"check_{t}_not_empty",
        f"Ensure {t} table has at least one row",
        f"SELECT COUNT(*) FROM {t}",
        "greater_than", 0,
    ))

    # 2. PK uniqueness (needs hints on parquet)
    if primary_keys:
        pk = ", ".join(primary_keys)
        rules.append(_rule(
            f"check_{t}_pk_unique",
            f"Ensure primary key ({pk}) has no duplicates",
            f"SELECT COUNT(*) FROM (SELECT {pk}, COUNT(*) AS cnt FROM {t} "
            f"GROUP BY {pk} HAVING COUNT(*) > 1) AS duplicates",
        ))

    # 3. row growth placeholder (the reference's self-comparing CTE,
    # default_validations.py:73-100 — real growth checks live in the
    # profiler's historical anomaly detection)
    rules.append(_rule(
        f"check_{t}_row_growth",
        f"Detect unusual growth in {t} row count (>20% change)",
        f"""WITH current_count AS (SELECT COUNT(*) AS cnt FROM {t}),
prev_count AS (SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE COUNT(*) END AS cnt FROM {t})
SELECT CASE WHEN prev_count.cnt IS NULL THEN 0
            WHEN ABS(current_count.cnt - prev_count.cnt) > prev_count.cnt * 0.2 THEN 1
            ELSE 0 END
FROM current_count, prev_count""",
    ))

    # 4. uniqueness for columns whose names suggest it
    for c in columns:
        if c["name"] in primary_keys or c["name"] in foreign_keys:
            continue
        if _matches(c["name"], UNIQUE_NAME_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_unique",
                f"Check that {c['name']} values are unique",
                f"SELECT COUNT(*) FROM (SELECT {c['name']}, COUNT(*) AS cnt FROM {t} "
                f"WHERE {c['name']} IS NOT NULL GROUP BY {c['name']} "
                f"HAVING COUNT(*) > 1) AS duplicates",
            ))

    # 5. NULL checks for non-nullable columns
    for c in columns:
        if not c["nullable"] and c["name"] not in primary_keys:
            rules.append(_rule(
                f"check_{c['name']}_not_null",
                f"Ensure {c['name']} has no NULL values",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} IS NULL",
            ))

    # 6. no negatives in numeric columns (unless name allows)
    for c in columns:
        if c["bucket"] == NUMERIC and not _matches(c["name"], NEGATIVE_ALLOWED_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_positive",
                f"Ensure {c['name']} has no negative values",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} < 0",
            ))

    # 7. no zeros in price-like columns
    for c in columns:
        if c["bucket"] == NUMERIC and _matches(c["name"], NON_ZERO_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_not_zero",
                f"Ensure {c['name']} has no zero values",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} = 0",
            ))

    # 8. date sanity
    for c in columns:
        if c["bucket"] != DATE:
            continue
        if _matches(c["name"], PAST_DATE_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_not_future",
                f"Ensure {c['name']} contains no future dates",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} > CURRENT_DATE",
            ))
        rules.append(_rule(
            f"check_{c['name']}_reasonable_past",
            f"Ensure {c['name']} contains no unreasonably old dates",
            f"SELECT COUNT(*) FROM {t} WHERE {c['name']} < '1970-01-01'",
        ))
        if _matches(c["name"], END_DATE_PATTERNS):
            start_col = guess_start_date_column(c["name"], col_names)
            rules.append(_rule(
                f"check_{c['name']}_end_date_order",
                f"Ensure {c['name']} occurs after any start date (if applicable)",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} IS NOT NULL "
                f"AND {start_col} IS NOT NULL AND {c['name']} < {start_col}",
            ))

    # 9. text formats. 9a (max length, default_validations.py:236-243):
    # Spark has no VARCHAR(n), so the limit comes from user hints —
    # the same degrade-without-metadata pattern as PK/FK (family 2/14).
    length_hints = column_length_hints or {}
    for c in columns:
        if c["bucket"] != TEXT:
            continue
        if c["name"] in length_hints:
            max_len = int(length_hints[c["name"]])
            rules.append(_rule(
                f"check_{c['name']}_max_length",
                f"Ensure {c['name']} does not exceed max length ({max_len})",
                f"SELECT COUNT(*) FROM {t} WHERE LENGTH({c['name']}) > {max_len}",
            ))
        if not c["nullable"]:
            rules.append(_rule(
                f"check_{c['name']}_not_empty_string",
                f"Ensure {c['name']} has no empty strings",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} = ''",
            ))
        low = c["name"].lower()
        if "email" in low:
            rules.append(_rule(
                f"check_{c['name']}_valid_email",
                f"Ensure {c['name']} contains valid email format",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} IS NOT NULL "
                f"AND {c['name']} NOT LIKE '%@%.%'",
            ))
        if "phone" in low or "mobile" in low:
            rules.append(_rule(
                f"check_{c['name']}_valid_phone",
                f"Ensure {c['name']} contains valid phone number format",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} IS NOT NULL "
                f"AND NOT ({c['name']} RLIKE '{PHONE_REGEX}')",
            ))
        if "zip" in low or "postal" in low:
            rules.append(_rule(
                f"check_{c['name']}_valid_postal",
                f"Ensure {c['name']} follows postal/zip code patterns",
                f"SELECT COUNT(*) FROM {t} WHERE {c['name']} IS NOT NULL "
                f"AND LENGTH(TRIM({c['name']})) < 3",
            ))

    # 10. 3σ outlier counts
    for c in columns:
        if c["bucket"] == NUMERIC:
            rules.append(_rule(
                f"check_{c['name']}_outliers",
                f"Check for extreme outliers in {c['name']} (> 3 std deviations)",
                f"""WITH stats AS (
    SELECT AVG({c['name']}) AS avg_val, STDDEV_SAMP({c['name']}) AS stddev_val
    FROM {t} WHERE {c['name']} IS NOT NULL
)
SELECT COUNT(*) FROM {t}, stats
WHERE {c['name']} > stats.avg_val + 3 * stats.stddev_val
   OR {c['name']} < stats.avg_val - 3 * stats.stddev_val""",
                "less_than", get_outlier_threshold(t),
            ))

    # 11. reference-table size
    if _matches(t, REF_TABLE_PATTERNS):
        rules.append(_rule(
            f"check_{t}_ref_table_size",
            f"Ensure reference table {t} has a reasonable number of rows",
            f"SELECT COUNT(*) FROM {t}",
            "less_than", 1000,
        ))

    # 12. null-rate cap on important nullable columns
    for c in columns:
        if c["name"] in primary_keys or not c["nullable"]:
            continue
        if _matches(c["name"], IMPORTANT_COLUMN_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_null_rate",
                f"Ensure {c['name']} null rate is below acceptable threshold",
                f"SELECT (COUNT(*) FILTER (WHERE {c['name']} IS NULL) * 100.0 "
                f"/ NULLIF(COUNT(*), 0)) FROM {t}",
                "less_than", 25.0,
            ))

    # 13. categorical-skew cap
    for c in columns:
        if c["bucket"] == TEXT and _matches(c["name"], CATEGORICAL_COLUMN_PATTERNS):
            rules.append(_rule(
                f"check_{c['name']}_distribution",
                f"Ensure {c['name']} has a reasonable value distribution",
                f"""WITH val_counts AS (
    SELECT {c['name']}, COUNT(*) AS cnt,
           (COUNT(*) * 100.0 / NULLIF((SELECT COUNT(*) FROM {t}), 0)) AS pct
    FROM {t} WHERE {c['name']} IS NOT NULL GROUP BY {c['name']}
)
SELECT COUNT(*) FROM val_counts WHERE pct > 95.0""",
            ))

    # 14. FK distinct-cardinality (needs hints on parquet)
    for c in columns:
        if c["name"] in foreign_keys:
            rules.append(_rule(
                f"check_{c['name']}_ref_distribution",
                f"Ensure {c['name']} references a reasonable number of distinct values",
                f"SELECT CASE WHEN (SELECT COUNT(DISTINCT {c['name']}) FROM {t} "
                f"WHERE {c['name']} IS NOT NULL) = 1 THEN 1 ELSE 0 END",
            ))

    # 15. updated-after-created timestamp ordering
    date_cols = [c["name"] for c in columns if c["bucket"] == DATE]
    updated = [c for c in date_cols if _matches(c, UPDATED_PATTERNS)]
    created = [c for c in date_cols if _matches(c, CREATED_PATTERNS)]
    for u in updated:
        for cr in created:
            rules.append(_rule(
                f"check_{u}_after_{cr}",
                f"Ensure {u} is not before {cr}",
                f"SELECT COUNT(*) FROM {t} WHERE {u} IS NOT NULL "
                f"AND {cr} IS NOT NULL AND {u} < {cr}",
            ))

    return rules
