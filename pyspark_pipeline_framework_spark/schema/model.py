"""Serializable schema contract model.

Parity with the reference's platform-independent schema
(core/schema/definition.py:10-79) but WITHOUT its lossy complex types:
ARRAY/MAP/STRUCT here carry full element types as Spark DDL strings, so
conversion round-trips (the reference refuses complex types —
runtime/schema_converter.py:88-93 "requires nested type information").
This model exists only for config files and contract validation; live
code uses ``StructType`` directly."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class DataType(enum.Enum):
    STRING = "string"
    INTEGER = "integer"
    LONG = "long"
    FLOAT = "float"
    DOUBLE = "double"
    BOOLEAN = "boolean"
    TIMESTAMP = "timestamp"
    DATE = "date"
    BINARY = "binary"
    DECIMAL = "decimal"
    ARRAY = "array"
    MAP = "map"
    STRUCT = "struct"


@dataclass(frozen=True)
class SchemaField:
    name: str
    data_type: DataType | str   # enum, or a Spark DDL string like "array<string>"
    nullable: bool = True
    metadata: dict[str, str] = field(default_factory=dict)

    def type_string(self) -> str:
        if isinstance(self.data_type, DataType):
            return self.data_type.value
        return str(self.data_type)


@dataclass
class SchemaDefinition:
    fields: list[SchemaField]

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def get(self, name: str) -> SchemaField | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    @classmethod
    def from_dict(cls, d: dict) -> "SchemaDefinition":
        fields = []
        for f in d.get("fields", []):
            dt = f.get("data_type", "string")
            try:
                dt = DataType(dt)
            except ValueError:
                pass  # complex DDL string like "array<int>"
            fields.append(
                SchemaField(
                    name=f["name"],
                    data_type=dt,
                    nullable=bool(f.get("nullable", True)),
                    metadata=dict(f.get("metadata", {})),
                )
            )
        return cls(fields)
