from pyspark_pipeline_framework_spark.quality.checks import (
    CheckResult,
    CheckSeverity,
    CheckTiming,
    DataQualityCheck,
    custom_sql_check,
    null_check,
    range_check,
    row_count_check,
    schema_check,
    unique_check,
)
from pyspark_pipeline_framework_spark.quality.gate import QualityGate, QualityGateError

__all__ = [
    "CheckResult",
    "CheckSeverity",
    "CheckTiming",
    "DataQualityCheck",
    "custom_sql_check",
    "null_check",
    "range_check",
    "row_count_check",
    "schema_check",
    "unique_check",
    "QualityGate",
    "QualityGateError",
]
