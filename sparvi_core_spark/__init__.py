"""sparvi-core-spark — a PySpark-native data-quality & analytics engine.

Re-expresses the capabilities of sparvidata/sparvi-core (profiling +
validation of warehouse tables via generated SQL) as one Spark engine:
DataFrame/Spark SQL plans optimized by Catalyst, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) the reference does not have.

Public API mirrors ``sparvi/__init__.py:22-32`` with the connection
string replaced by a SparkSession.
"""

from sparvi_core_spark.profiler.engine import profile_table, profile_tables
from sparvi_core_spark.profiler.compare import (
    build_trends,
    detect_anomalies,
    detect_schema_shifts,
)
from sparvi_core_spark.validations import (
    export_rules,
    get_default_validations,
    load_rules_from_file,
    run_validations,
)
from sparvi_core_spark.session import get_spark, read_jdbc, read_table, register_views

__version__ = "0.1.0"

__all__ = [
    "profile_table",
    "profile_tables",
    "run_validations",
    "load_rules_from_file",
    "get_default_validations",
    "export_rules",
    "detect_anomalies",
    "detect_schema_shifts",
    "build_trends",
    "get_spark",
    "read_jdbc",
    "read_table",
    "register_views",
    "__version__",
]
