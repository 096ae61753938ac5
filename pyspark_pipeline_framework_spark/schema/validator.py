"""Schema compatibility validator.

Rule-set parity with the reference (core/schema/validator.py:64-208):
missing required field / type mismatch / nullability weakening → ERROR;
extra output columns → WARNING; a one-sided None contract is vacuously
valid unless ``strict`` requires both sides."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark_pipeline_framework_spark.schema.model import SchemaDefinition


@dataclass(frozen=True)
class SchemaValidationIssue:
    severity: str        # "error" | "warning"
    field: str
    message: str


#: Spark DDL spellings of the same physical type (simpleString() says
#: "bigint"/"int" where the model enum says "long"/"integer")
_TYPE_ALIASES = {
    "bigint": "long",
    "int": "integer",
    "smallint": "short",
    "tinyint": "byte",
    "real": "float",
}


def _norm_type(t: str) -> str:
    t = t.strip().lower()
    t = _TYPE_ALIASES.get(t, t)
    return t


def _types_match(expected: str, actual: str) -> bool:
    e, a = _norm_type(expected), _norm_type(actual)
    if e == a:
        return True
    # a bare "decimal" contract accepts any precision/scale
    if e == "decimal" and a.startswith("decimal"):
        return True
    return False


def validate_compatibility(
    expected: SchemaDefinition | None,
    actual: SchemaDefinition | None,
    strict: bool = False,
) -> list[SchemaValidationIssue]:
    issues: list[SchemaValidationIssue] = []
    if expected is None or actual is None:
        if strict:
            missing = "expected" if expected is None else "actual"
            issues.append(SchemaValidationIssue("error", "<schema>", f"{missing} schema required in strict mode"))
        return issues

    actual_by_name = {f.name: f for f in actual.fields}
    for exp in expected.fields:
        act = actual_by_name.get(exp.name)
        if act is None:
            if not exp.nullable:
                issues.append(
                    SchemaValidationIssue("error", exp.name, "required field missing")
                )
            else:
                issues.append(
                    SchemaValidationIssue("warning", exp.name, "optional field missing")
                )
            continue
        if not _types_match(exp.type_string(), act.type_string()):
            issues.append(
                SchemaValidationIssue(
                    "error",
                    exp.name,
                    f"type mismatch: expected {exp.type_string()}, got {act.type_string()}",
                )
            )
        if not exp.nullable and act.nullable:
            issues.append(
                SchemaValidationIssue(
                    "error", exp.name, "nullability weakened: expected non-null, got nullable"
                )
            )
    expected_names = {f.name for f in expected.fields}
    for act in actual.fields:
        if act.name not in expected_names:
            issues.append(SchemaValidationIssue("warning", act.name, "unexpected extra column"))
    return issues
