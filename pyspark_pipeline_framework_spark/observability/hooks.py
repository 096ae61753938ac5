"""Pipeline lifecycle hooks.

Protocol parity with the reference's 7-method ``PipelineHooks``
(runner/hooks.py:16-160) + builtin logging/metrics implementations
(runner/hooks_builtin.py). Composite swallows hook errors (a broken
observer must never fail the pipeline — reference ``safe_call``,
core/utils.py:10-30)."""

from __future__ import annotations

import logging
from typing import Protocol

from pyspark_pipeline_framework_spark.observability.metrics import InMemoryMetricsRegistry

log = logging.getLogger(__name__)


class PipelineHooks(Protocol):
    def on_pipeline_start(self, pipeline: str) -> None: ...
    def on_pipeline_end(self, pipeline: str, status: str, duration_s: float) -> None: ...
    def on_component_start(self, pipeline: str, component: str) -> None: ...
    def on_component_end(self, pipeline: str, component: str, status: str, duration_s: float) -> None: ...
    def on_component_retry(self, pipeline: str, component: str, attempt: int, error: str) -> None: ...
    def on_component_skipped(self, pipeline: str, component: str, reason: str) -> None: ...
    def on_validation_complete(self, pipeline: str, ok: bool, messages: list[str]) -> None: ...


class NoOpHooks:
    def on_pipeline_start(self, pipeline): pass
    def on_pipeline_end(self, pipeline, status, duration_s): pass
    def on_component_start(self, pipeline, component): pass
    def on_component_end(self, pipeline, component, status, duration_s): pass
    def on_component_retry(self, pipeline, component, attempt, error): pass
    def on_component_skipped(self, pipeline, component, reason): pass
    def on_validation_complete(self, pipeline, ok, messages): pass


class LoggingHooks(NoOpHooks):
    def on_pipeline_start(self, pipeline):
        log.info("pipeline %s: start", pipeline)

    def on_pipeline_end(self, pipeline, status, duration_s):
        log.info("pipeline %s: %s in %.2fs", pipeline, status, duration_s)

    def on_component_start(self, pipeline, component):
        log.info("pipeline %s: component %s start", pipeline, component)

    def on_component_end(self, pipeline, component, status, duration_s):
        log.info("pipeline %s: component %s %s in %.2fs", pipeline, component, status, duration_s)

    def on_component_retry(self, pipeline, component, attempt, error):
        log.warning("pipeline %s: component %s retry #%d: %s", pipeline, component, attempt, error)

    def on_component_skipped(self, pipeline, component, reason):
        log.info("pipeline %s: component %s skipped (%s)", pipeline, component, reason)

    def on_validation_complete(self, pipeline, ok, messages):
        log.log(logging.INFO if ok else logging.ERROR,
                "pipeline %s: validation %s %s", pipeline, "ok" if ok else "FAILED", messages)


class MetricsHooks(NoOpHooks):
    def __init__(self, registry: InMemoryMetricsRegistry | None = None):
        self.registry = registry or InMemoryMetricsRegistry()

    def on_pipeline_end(self, pipeline, status, duration_s):
        self.registry.counter("pipeline_runs", pipeline=pipeline, status=status)
        self.registry.timer("pipeline_duration_s", duration_s, pipeline=pipeline)

    def on_component_end(self, pipeline, component, status, duration_s):
        self.registry.counter("component_runs", pipeline=pipeline, component=component, status=status)
        self.registry.timer("component_duration_s", duration_s, pipeline=pipeline, component=component)

    def on_component_retry(self, pipeline, component, attempt, error):
        self.registry.counter("component_retries", pipeline=pipeline, component=component)


class CompositeHooks(NoOpHooks):
    """Fan-out to many hooks; exceptions in any observer are swallowed."""

    def __init__(self, *hooks: PipelineHooks):
        self.hooks = list(hooks)

    def _fan(self, method: str, *args) -> None:
        for h in self.hooks:
            try:
                getattr(h, method)(*args)
            except Exception as exc:  # noqa: BLE001
                log.error("hook %s.%s raised: %s", type(h).__name__, method, exc)


for _m in [
    "on_pipeline_start", "on_pipeline_end", "on_component_start", "on_component_end",
    "on_component_retry", "on_component_skipped", "on_validation_complete",
]:
    def _make(m):
        def f(self, *args):
            self._fan(m, *args)
        f.__name__ = m
        return f
    setattr(CompositeHooks, _m, _make(_m))
