"""Sequential pipeline runner.

Behavior parity with the reference's ``SimplePipelineRunner`` +
``ComponentExecutor`` (runner/simple_runner.py:86-165,
runner/component_executor.py:54-152): validate → hooks → topo order →
per-component retry/circuit-breaker wrap → result aggregation, with
resume (``completed_components``), ``enabled`` flags, fail-fast or
continue, and dry-run validation. Deliberately sequential
(docs/scope.rst:156-177) — parallelism belongs to Spark, not the
orchestrator; because operators stay lazy, a chain of components
composes into ONE Catalyst plan per sink exactly like the reference's
temp-view fusion (SURVEY.md §4)."""

from __future__ import annotations

import time
from typing import Callable, Iterable

from pyspark.sql import SparkSession

from pyspark_pipeline_framework_spark.io.readers import Catalog
from pyspark_pipeline_framework_spark.observability.hooks import NoOpHooks, PipelineHooks
from pyspark_pipeline_framework_spark.plans.config import ComponentConfig, PipelineConfig
from pyspark_pipeline_framework_spark.plans.registry import (
    OperatorRegistry,
    default_registry,
    load_class_path,
)
from pyspark_pipeline_framework_spark.plans.result import (
    ComponentResult,
    ComponentStatus,
    PipelineResult,
)
from pyspark_pipeline_framework_spark.quality.gate import QualityGate
from pyspark_pipeline_framework_spark.quality.checks import CheckTiming
from pyspark_pipeline_framework_spark.resilience.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerOpenError,
)
from pyspark_pipeline_framework_spark.resilience.presets import DEFAULT, ResiliencePolicy
from pyspark_pipeline_framework_spark.resilience.retry import RetryExecutor
from pyspark_pipeline_framework_spark.schema.converter import from_struct_type
from pyspark_pipeline_framework_spark.schema.model import SchemaDefinition
from pyspark_pipeline_framework_spark.schema.validator import validate_compatibility


class SchemaContractError(RuntimeError):
    """A component's declared input/output schema contract was violated
    (reference runtime/dataflow/schema.py:10-31 ERROR semantics)."""

    def __init__(self, component: str, dataset: str, issues):
        self.component = component
        self.dataset = dataset
        self.issues = issues
        super().__init__(
            f"schema contract violated for component {component!r} on dataset "
            f"{dataset!r}: " + "; ".join(f"{i.field}: {i.message}" for i in issues)
        )


class PipelineRunner:
    def __init__(
        self,
        config: PipelineConfig,
        spark: SparkSession,
        registry: OperatorRegistry | None = None,
        hooks: PipelineHooks | None = None,
        quality_gate: QualityGate | None = None,
        resilience: ResiliencePolicy = DEFAULT,
        fail_fast: bool = True,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        secrets=None,
    ):
        self.config = config
        self.spark = spark
        self.registry = registry or default_registry
        if hooks is not None:
            self.hooks = hooks
        elif config.hooks:
            # config-declared hooks block builds the observers when the
            # caller didn't wire any (same contract as the CLI)
            from pyspark_pipeline_framework_spark.observability.config import (
                build_hooks_from_config,
            )

            self.hooks = build_hooks_from_config(config.hooks)
        else:
            self.hooks = NoOpHooks()
        self.quality_gate = quality_gate
        # config-declared secrets block (reference core/config/secrets.py):
        # secret://provider/key params interpolate at component-invoke
        # time through the configured resolver
        self.secrets = secrets or config.secrets_resolver()
        self.resilience = resilience
        self.fail_fast = fail_fast
        self._clock = clock
        self._sleep = sleep
        self.catalog = Catalog(spark)
        self._breaker = (
            CircuitBreaker(
                failure_threshold=resilience.failure_threshold,
                timeout_s=resilience.cb_timeout_s,
            )
            if resilience.circuit_breaker_enabled
            else None
        )
        # per-component breakers (reference core/config/component.py:36):
        # built eagerly so each component's failure state is isolated and
        # the parallel runner needs no lazy-creation lock
        self._component_breakers: dict[str, CircuitBreaker] = {
            c.name: override.circuit_breaker.build(c.name, clock)
            for c in config.components
            if (override := c.resilience_override()) and override.circuit_breaker
        }
        for k, v in config.spark_conf.items():
            spark.conf.set(k, v)

    # -- validation / dry run -------------------------------------------------
    def validate(self) -> list[str]:
        """Resolve every component's operator without executing
        (reference dry-run, core/config/validator.py:85-181)."""
        problems: list[str] = []
        for c in self.config.components:
            try:
                self._resolve(c)
            except Exception as exc:  # noqa: BLE001
                problems.append(f"{c.name}: {exc}")
        self.hooks.on_validation_complete(self.config.name, not problems, problems)
        return problems

    def _resolve(self, c: ComponentConfig):
        if c.op:
            return self.registry.get(c.op)
        return load_class_path(c.class_path)

    # -- execution ------------------------------------------------------------
    def run(
        self, completed_components: Iterable[str] = (), max_parallel: int = 1
    ) -> PipelineResult:
        """Execute the pipeline. ``max_parallel=1`` (default) is the
        reference-parity sequential executor. ``max_parallel>1`` runs
        each Kahn level's mutually-independent components on a thread
        pool — the right model for Spark: threads submit jobs
        concurrently and the cluster scheduler interleaves their
        stages (lazy chains still fuse per sink exactly as in
        sequential mode, since intra-chain components share a level
        only when independent). A failure under ``fail_fast`` lets the
        current level drain, then skips all later levels; hook calls
        may interleave across threads within a level, but results are
        always reported in deterministic topological order."""
        completed = set(completed_components)
        result = PipelineResult(self.config.name)
        t0 = self._clock()
        self.hooks.on_pipeline_start(self.config.name)

        problems = self.validate()
        if problems:
            self.hooks.on_pipeline_end(self.config.name, "failure", self._clock() - t0)
            result.components = [
                ComponentResult(n, ComponentStatus.FAILURE, error="validation: " + "; ".join(problems))
                for n in self.config.execution_order()
            ]
            return result

        if self.quality_gate:
            self.quality_gate.run(CheckTiming.BEFORE_PIPELINE, self._datasets())

        aborted = False
        for level in self.config.execution_levels():
            runnable: list[ComponentConfig] = []
            placed: dict[str, ComponentResult] = {}
            for name in level:
                comp = self.config.get(name)
                if aborted:
                    placed[name] = ComponentResult(name, ComponentStatus.SKIPPED)
                    self.hooks.on_component_skipped(self.config.name, name, "fail-fast abort")
                elif not comp.enabled:
                    placed[name] = ComponentResult(name, ComponentStatus.SKIPPED)
                    self.hooks.on_component_skipped(self.config.name, name, "disabled")
                elif name in completed:
                    placed[name] = ComponentResult(name, ComponentStatus.SKIPPED)
                    self.hooks.on_component_skipped(
                        self.config.name, name, "resume: already completed"
                    )
                else:
                    runnable.append(comp)
            if runnable:
                if max_parallel > 1 and len(runnable) > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
                        for comp, cr in zip(
                            runnable, pool.map(self._run_component, runnable)
                        ):
                            placed[comp.name] = cr
                else:
                    for comp in runnable:
                        placed[comp.name] = self._run_component(comp)
                        if (
                            placed[comp.name].status == ComponentStatus.FAILURE
                            and self.fail_fast
                        ):
                            # sequential parity: abort mid-level too
                            aborted = True
                            break
            for name in level:
                if name not in placed:  # sequential mid-level abort
                    placed[name] = ComponentResult(name, ComponentStatus.SKIPPED)
                    self.hooks.on_component_skipped(self.config.name, name, "fail-fast abort")
            result.components.extend(placed[n] for n in level)
            if self.fail_fast and any(
                placed[n].status == ComponentStatus.FAILURE for n in level
            ):
                aborted = True

        if self.quality_gate and not aborted:
            self.quality_gate.run(CheckTiming.AFTER_PIPELINE, self._datasets())

        self.hooks.on_pipeline_end(
            self.config.name, result.status.value, self._clock() - t0
        )
        return result

    def _datasets(self):
        return {n: self.catalog.get(n) for n in self.catalog.names()}

    def _check_contract(
        self, comp: ComponentConfig, dataset: str, contract: dict
    ) -> None:
        """Validate one dataset against a declared contract. Contract
        violations are data facts, not transient errors — callers keep
        this OUTSIDE the retry loop. ``schema_mode="warn"`` downgrades
        errors to log warnings; warning-severity issues (extra columns,
        missing optional fields) always just log."""
        import logging

        if dataset not in self.catalog.names():
            raise SchemaContractError(
                comp.name,
                dataset,
                [type("I", (), {"field": "<dataset>", "message": "dataset not found"})()],
            )
        expected = SchemaDefinition.from_dict(contract)
        actual = from_struct_type(self.catalog.get(dataset).schema)
        issues = validate_compatibility(expected, actual)
        errors = [i for i in issues if i.severity == "error"]
        warnings = [i for i in issues if i.severity != "error"]
        log = logging.getLogger(__name__)
        for i in warnings:
            log.warning(
                "schema contract warning [%s/%s] %s: %s", comp.name, dataset, i.field, i.message
            )
        if errors:
            if comp.schema_mode == "warn":
                for i in errors:
                    log.warning(
                        "schema contract violation (warn mode) [%s/%s] %s: %s",
                        comp.name, dataset, i.field, i.message,
                    )
            else:
                raise SchemaContractError(comp.name, dataset, errors)

    def _run_component(self, comp: ComponentConfig) -> ComponentResult:
        self.hooks.on_component_start(self.config.name, comp.name)
        t0 = self._clock()
        override = comp.resilience_override()
        retry_policy = (
            override.retry if override and override.retry else self.resilience.retry
        )
        # a component that declares ONLY a circuit_breaker (no retry, no
        # bundled policy) still inherits the runner-wide retry; a
        # component-level breaker replaces the shared one so its failures
        # don't trip unrelated components
        breaker = (
            self._component_breakers.get(comp.name)
            if override and override.circuit_breaker
            else self._breaker
        )
        executor = RetryExecutor(
            retry_policy,
            sleep=self._sleep,
            on_retry=lambda attempt, exc, _d: self.hooks.on_component_retry(
                self.config.name, comp.name, attempt, str(exc)
            ),
        )

        def invoke():
            fn = self._resolve(comp)
            kwargs = (
                self.secrets.interpolate(dict(comp.params))
                if self.secrets
                else dict(comp.params)
            )
            # inject the component's output dataset name when the
            # operator declares an `output` parameter
            import inspect

            try:
                accepts_output = "output" in inspect.signature(fn).parameters
            except (TypeError, ValueError):
                accepts_output = False
            if accepts_output:
                kwargs.setdefault("output", comp.output)
            out = fn(self.spark, self.catalog, **kwargs)
            if out is not None and comp.output:
                self.catalog.put(comp.output, out)
            return out

        try:
            # declared input contracts checked before the run, output
            # contract after — both OUTSIDE the retry loop (a schema
            # violation is deterministic, retrying cannot fix it)
            for ds, contract in comp.input_contracts().items():
                self._check_contract(comp, ds, contract)
            if breaker:
                breaker.call(executor.execute, invoke)
            else:
                executor.execute(invoke)
            if comp.output_schema is not None:
                self._check_contract(comp, comp.output, comp.output_schema)
            # quality checks run once, OUTSIDE the retry loop — a failed
            # check is a data fact, not a transient error to retry
            if self.quality_gate:
                self.quality_gate.run(
                    CheckTiming.AFTER_COMPONENT,
                    self._datasets(),
                    component_name=comp.name,
                    component_output=comp.output,
                )
            dur = self._clock() - t0
            self.hooks.on_component_end(self.config.name, comp.name, "success", dur)
            return ComponentResult(comp.name, ComponentStatus.SUCCESS, dur, executor.attempts)
        except CircuitBreakerOpenError as exc:
            dur = self._clock() - t0
            self.hooks.on_component_skipped(self.config.name, comp.name, str(exc))
            return ComponentResult(comp.name, ComponentStatus.SKIPPED, dur, 0, str(exc))
        except Exception as exc:  # noqa: BLE001
            dur = self._clock() - t0
            self.hooks.on_component_end(self.config.name, comp.name, "failure", dur)
            return ComponentResult(
                comp.name, ComponentStatus.FAILURE, dur, executor.attempts, str(exc)
            )
