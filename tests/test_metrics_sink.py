"""Profile → long-format metrics sink."""

from pyspark.sql import functions as F

from sparvi_core_spark import profile_table
from sparvi_core_spark.profiler.metrics_sink import append_metrics, profile_to_metrics


def test_profile_to_metrics(spark, employees):
    prof = profile_table(spark, "employees", include_samples=False)
    m = profile_to_metrics(spark, prof)
    got = {
        (r["metric"], r["column"]): r["value"]
        for r in m.collect()
    }
    assert got[("row_count", None)] == 10.0
    assert got[("nulls", "age")] == 2.0
    assert got[("min", "salary")] == 50000.0
    assert got[("null_percentage", "age")] == 20.0
    assert all(isinstance(v, float) for v in got.values())


def test_append_metrics_roundtrip(spark, employees, tmp_path):
    prof = profile_table(spark, "employees", include_samples=False)
    path = str(tmp_path / "metrics")
    append_metrics(spark, prof, path)
    append_metrics(spark, prof, path)
    df = spark.read.parquet(path)
    assert df.filter(F.col("metric") == "row_count").count() == 2
    # partitioned by table → pruning-friendly layout
    assert (tmp_path / "metrics" / "table=employees").exists()
