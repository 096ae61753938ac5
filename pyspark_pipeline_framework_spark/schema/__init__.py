from pyspark_pipeline_framework_spark.schema.model import DataType, SchemaDefinition, SchemaField
from pyspark_pipeline_framework_spark.schema.converter import from_struct_type, to_struct_type
from pyspark_pipeline_framework_spark.schema.validator import (
    SchemaValidationIssue,
    validate_compatibility,
)

__all__ = [
    "DataType",
    "SchemaDefinition",
    "SchemaField",
    "from_struct_type",
    "to_struct_type",
    "SchemaValidationIssue",
    "validate_compatibility",
]
