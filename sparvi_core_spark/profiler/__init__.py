from sparvi_core_spark.profiler.engine import profile_table

__all__ = ["profile_table"]
