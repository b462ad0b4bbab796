from sparvi_core_spark.validations.rules import export_rules, load_rules_from_file
from sparvi_core_spark.validations.runner import run_validations
from sparvi_core_spark.validations.defaults import get_default_validations

__all__ = [
    "export_rules",
    "load_rules_from_file",
    "run_validations",
    "get_default_validations",
]
