"""SchemaDefinition ↔ Spark StructType conversion (reference
runtime/schema_converter.py:41-184, minus its complex-type refusal:
DDL strings carry nested types both ways)."""

from __future__ import annotations

from pyspark.sql import types as T

from pyspark_pipeline_framework_spark.schema.model import DataType, SchemaDefinition, SchemaField

_SCALAR_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.STRING: T.StringType(),
    DataType.INTEGER: T.IntegerType(),
    DataType.LONG: T.LongType(),
    DataType.FLOAT: T.FloatType(),
    DataType.DOUBLE: T.DoubleType(),
    DataType.BOOLEAN: T.BooleanType(),
    DataType.TIMESTAMP: T.TimestampType(),
    DataType.DATE: T.DateType(),
    DataType.BINARY: T.BinaryType(),
    DataType.DECIMAL: T.DecimalType(38, 18),
}


def _field_to_spark_type(f: SchemaField) -> T.DataType:
    if isinstance(f.data_type, DataType):
        if f.data_type in _SCALAR_TO_SPARK:
            return _SCALAR_TO_SPARK[f.data_type]
        raise ValueError(
            f"field {f.name!r}: complex type {f.data_type.value!r} requires a DDL "
            f'string with element types, e.g. "array<string>"'
        )
    return T._parse_datatype_string(str(f.data_type))


def to_struct_type(schema: SchemaDefinition) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f.name, _field_to_spark_type(f), f.nullable, metadata=f.metadata or {})
            for f in schema.fields
        ]
    )


def from_struct_type(struct: T.StructType) -> SchemaDefinition:
    fields = []
    for sf in struct.fields:
        simple = sf.dataType.simpleString()
        dt: DataType | str
        try:
            dt = DataType(simple if simple != "int" else "integer")
        except ValueError:
            dt = simple  # complex types keep the full DDL string
        fields.append(
            SchemaField(
                name=sf.name,
                data_type=dt,
                nullable=sf.nullable,
                metadata=dict(sf.metadata) if sf.metadata else {},
            )
        )
    return SchemaDefinition(fields)
