"""Declarative pipeline spec.

Semantics parity with the reference's ``PipelineConfig`` /
``ComponentConfig`` (core/config/pipeline.py:13-146): named+versioned
pipeline, unique component names, validated ``depends_on`` references,
DFS cycle detection, Kahn topological execution order, ``enabled``
flags. Differences by design: components name REGISTRY OPERATORS (or a
``class_path`` escape hatch) with plain-dict params instead of
HOCON-instantiated classes; datasets flow by reference through a
Catalog rather than implicit temp-view strings."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class PipelineValidationError(ValueError):
    pass


@dataclass
class ComponentConfig:
    name: str
    op: str = ""                     # registry operator name
    class_path: str = ""             # or dotted-path escape hatch
    component_type: str = "transformation"   # source | transformation | sink
    params: dict[str, Any] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)    # dataset names consumed
    output: str = ""                 # dataset name produced ('' = component name)
    depends_on: list[str] = field(default_factory=list)
    enabled: bool = True
    # schema contracts (reference runtime/dataflow/schema.py:10-31
    # SchemaAwareDataFlow): declared as SchemaDefinition dicts
    # ({"fields": [{"name", "data_type", "nullable"}, ...]}).
    # input_schema is either one contract (applies to the single
    # declared input) or a mapping of dataset name → contract;
    # output_schema applies to the produced dataset. schema_mode
    # "error" raises on contract violations, "warn" logs them.
    input_schema: dict[str, Any] | None = None
    output_schema: dict[str, Any] | None = None
    schema_mode: str = "error"
    # per-component resilience (reference core/config/component.py:32-64):
    # `retry` / `circuit_breaker` are config dicts, `resilience` is a
    # preset name or {retry, circuit_breaker} dict. `resilience` is
    # mutually exclusive with the individual fields; anything unset
    # inherits the runner-wide policy.
    retry: dict[str, Any] | None = None
    circuit_breaker: dict[str, Any] | None = None
    resilience: str | dict[str, Any] | None = None

    def __post_init__(self) -> None:
        if not self.name or not self.name.strip():
            raise PipelineValidationError("component name must be non-empty")
        if bool(self.op) == bool(self.class_path):
            raise PipelineValidationError(
                f"component {self.name!r}: exactly one of op/class_path required"
            )
        if self.schema_mode not in ("error", "warn"):
            raise PipelineValidationError(
                f"component {self.name!r}: schema_mode must be 'error' or 'warn'"
            )
        if (
            self.input_schema is not None
            and "fields" in self.input_schema
            and len(self.inputs) != 1
        ):
            raise PipelineValidationError(
                f"component {self.name!r}: single-contract input_schema requires "
                f"exactly one declared input (got {self.inputs})"
            )
        if not self.output:
            self.output = self.name
        # validate + apply mutual exclusion eagerly so a bad .conf fails
        # at load time, not mid-run (reference raises in __post_init__)
        from pyspark_pipeline_framework_spark.resilience.config import (
            ResilienceConfigError,
            resolve_component_resilience,
        )

        try:
            self._resilience_override = resolve_component_resilience(
                self.retry, self.circuit_breaker, self.resilience
            )
        except ResilienceConfigError as exc:
            raise PipelineValidationError(f"component {self.name!r}: {exc}") from exc

    def resilience_override(self):
        """Resolved per-component ``ComponentResilience`` or ``None``
        (inherit runner-wide policy)."""
        return self._resilience_override

    def input_contracts(self) -> dict[str, dict[str, Any]]:
        """Normalized mapping of input dataset name → contract dict."""
        if self.input_schema is None:
            return {}
        if "fields" in self.input_schema:
            return {self.inputs[0]: self.input_schema}
        return dict(self.input_schema)


@dataclass
class PipelineConfig:
    name: str
    components: list[ComponentConfig]
    version: str = "0"
    spark_conf: dict[str, str] = field(default_factory=dict)
    description: str = ""
    # config-declared lifecycle hooks (reference core/config/hooks.py:9-91):
    # {"logging": {...}, "metrics": {...}, "audit": {...}} — built into
    # observers by observability.config.build_hooks_from_config; the CLI
    # wires them automatically so a .conf run needs zero Python code.
    hooks: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.name or not self.name.strip():
            raise PipelineValidationError("pipeline name must be non-empty")
        from pyspark_pipeline_framework_spark.observability.config import (
            HooksConfigError,
            validate_hooks_config,
        )

        try:
            validate_hooks_config(self.hooks)
        except HooksConfigError as exc:
            raise PipelineValidationError(str(exc)) from exc
        names = [c.name for c in self.components]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise PipelineValidationError(f"duplicate component names: {sorted(dupes)}")
        known = set(names)
        for c in self.components:
            for dep in c.depends_on:
                if dep not in known:
                    raise PipelineValidationError(
                        f"component {c.name!r} depends on unknown component {dep!r}"
                    )
        cycle = self._find_cycle()
        if cycle:
            raise PipelineValidationError(f"dependency cycle: {' -> '.join(cycle)}")

    def _find_cycle(self) -> list[str] | None:
        deps = {c.name: list(c.depends_on) for c in self.components}
        WHITE, GREY, BLACK = 0, 1, 2
        color = {n: WHITE for n in deps}
        stack: list[str] = []

        def dfs(n: str) -> list[str] | None:
            color[n] = GREY
            stack.append(n)
            for d in deps[n]:
                if color[d] == GREY:
                    return stack[stack.index(d):] + [d]
                if color[d] == WHITE:
                    found = dfs(d)
                    if found:
                        return found
            color[n] = BLACK
            stack.pop()
            return None

        for n in deps:
            if color[n] == WHITE:
                found = dfs(n)
                if found:
                    return found
        return None

    def execution_order(self) -> list[str]:
        """Kahn topological order; insertion order breaks ties so runs
        are reproducible."""
        return [n for level in self.execution_levels() for n in level]

    def execution_levels(self) -> list[list[str]]:
        """Kahn waves: every component in a level depends only on
        earlier levels, so a level's components are mutually
        independent and safe to run concurrently (the parallel
        runner's schedule). Insertion order within a level is
        preserved for reproducibility."""
        deps = {c.name: set(c.depends_on) for c in self.components}
        levels: list[list[str]] = []
        remaining = [c.name for c in self.components]
        satisfied: set[str] = set()
        while remaining:
            ready = [n for n in remaining if deps[n] <= satisfied]
            if not ready:  # unreachable post-validation; defensive
                raise PipelineValidationError(f"unresolvable dependencies among {remaining}")
            levels.append(ready)
            satisfied.update(ready)
            remaining = [n for n in remaining if n not in satisfied]
        return levels

    def get(self, name: str) -> ComponentConfig:
        for c in self.components:
            if c.name == name:
                return c
        raise KeyError(name)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        comps = [ComponentConfig(**c) for c in d.get("components", [])]
        return cls(
            name=d.get("name", ""),
            components=comps,
            version=str(d.get("version", "0")),
            spark_conf=dict(d.get("spark_conf", {})),
            description=d.get("description", ""),
            hooks=dict(d.get("hooks", {})),
        )

    @classmethod
    def from_file(cls, path: str) -> "PipelineConfig":
        """Load from JSON or, for ``.conf``/``.hocon`` files, the
        bundled HOCON-subset parser (the reference's config format —
        core/config/loader.py:14-27 — without the dataconf dependency)."""
        if path.endswith((".conf", ".hocon")):
            from pyspark_pipeline_framework_spark.plans import hocon

            return cls.from_dict(hocon.load(path))
        import json

        with open(path) as f:
            return cls.from_dict(json.load(f))
