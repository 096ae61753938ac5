"""Config-declared lifecycle hooks.

Parity with the reference's ``HooksConfig`` family
(core/config/hooks.py:9-91): a pipeline config may carry a ``hooks``
block with ``logging`` / ``metrics`` / ``audit`` sections, and the
runner wires the corresponding observers with zero Python code. The
sections map onto this repo's existing implementations:

- ``logging``  → :class:`LoggingHooks` + package-logger configuration
  (level, json/text format, stdout/stderr/file output).
- ``metrics``  → :class:`MetricsHooks` over a backend registry chosen by
  name: ``in_memory`` (default; optional ``dump_path`` writes the final
  snapshot as JSON at pipeline end), ``prometheus`` / ``otel``
  (import-gated adapters in ``observability/exporters.py``).
- ``audit``    → :class:`AuditHooks` over a JSONL :class:`FileAuditSink`
  (``audit_trail_path``) or the logging sink.

Validation mirrors the reference's ``__post_init__`` checks
(export_interval_seconds >= 1, retention_days >= 1) and rejects unknown
fields so a typo'd ``.conf`` fails at load time.
"""

from __future__ import annotations

import json
import logging
import sys
from dataclasses import dataclass
from typing import Any

from pyspark_pipeline_framework_spark.observability.audit import (
    AuditHooks,
    FileAuditSink,
    LoggingAuditSink,
)
from pyspark_pipeline_framework_spark.observability.hooks import (
    CompositeHooks,
    LoggingHooks,
    MetricsHooks,
    NoOpHooks,
    PipelineHooks,
)
from pyspark_pipeline_framework_spark.observability.metrics import InMemoryMetricsRegistry


class HooksConfigError(ValueError):
    pass


def _check_fields(d: dict[str, Any], allowed: set[str], section: str) -> None:
    extra = set(d) - allowed
    if extra:
        raise HooksConfigError(
            f"unknown {section} fields {sorted(extra)} (allowed: {sorted(allowed)})"
        )


def _section_dict(hooks_cfg: dict[str, Any], section: str) -> dict[str, Any]:
    v = hooks_cfg.get(section)
    if v is None:
        return {}
    if not isinstance(v, dict):
        raise HooksConfigError(
            f"hooks.{section} must be an object, got {type(v).__name__}"
        )
    return dict(v)


def _check_types(d: dict[str, Any], spec: dict[str, type], section: str) -> None:
    # bool is an int subclass — require exact bool for bool fields and
    # exclude bool from int fields so `enabled: 1` / `retention_days: true`
    # both fail loudly
    for k, tp in spec.items():
        v = d.get(k)
        if v is None:
            continue
        ok = isinstance(v, bool) if tp is bool else (
            isinstance(v, tp) and not isinstance(v, bool)
        )
        if not ok:
            raise HooksConfigError(
                f"hooks.{section}.{k} must be {tp.__name__}, got {type(v).__name__}"
            )


@dataclass(frozen=True)
class LoggingHooksConfig:
    level: str = "INFO"
    format: str = "text"          # text | json
    output: str = "stdout"        # stdout | stderr | file path
    structured: bool = False      # reserved for structlog-style emitters

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LoggingHooksConfig":
        _check_fields(d, {"level", "format", "output", "structured"}, "hooks.logging")
        _check_types(d, {"level": str, "format": str, "output": str, "structured": bool}, "logging")
        cfg = cls(**d)
        if cfg.format not in ("text", "json"):
            raise HooksConfigError("hooks.logging.format must be 'text' or 'json'")
        if not hasattr(logging, cfg.level.upper()):
            raise HooksConfigError(f"hooks.logging: unknown log level {cfg.level!r}")
        return cfg


class _JsonLogFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        return json.dumps(
            {
                "ts": self.formatTime(record),
                "level": record.levelname,
                "logger": record.name,
                "message": record.getMessage(),
            },
            sort_keys=True,
        )


@dataclass(frozen=True)
class MetricsHooksConfig:
    enabled: bool = True
    backend: str = "in_memory"    # in_memory | prometheus | otel
    push_gateway_url: str | None = None
    export_interval_seconds: int = 60
    dump_path: str | None = None  # in_memory: write snapshot JSON at pipeline end

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "MetricsHooksConfig":
        _check_fields(
            d,
            {"enabled", "backend", "push_gateway_url", "export_interval_seconds", "dump_path"},
            "hooks.metrics",
        )
        _check_types(
            d,
            {
                "enabled": bool,
                "backend": str,
                "push_gateway_url": str,
                "export_interval_seconds": int,
                "dump_path": str,
            },
            "metrics",
        )
        cfg = cls(**d)
        if cfg.export_interval_seconds < 1:
            raise HooksConfigError("hooks.metrics.export_interval_seconds must be at least 1")
        if cfg.backend not in ("in_memory", "prometheus", "otel"):
            raise HooksConfigError(
                f"unknown metrics backend {cfg.backend!r} (in_memory | prometheus | otel)"
            )
        return cfg


@dataclass(frozen=True)
class AuditHooksConfig:
    enabled: bool = True
    audit_trail_path: str | None = None   # JSONL file; None → logging sink
    include_data_samples: bool = False
    retention_days: int = 90

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "AuditHooksConfig":
        _check_fields(
            d,
            {"enabled", "audit_trail_path", "include_data_samples", "retention_days"},
            "hooks.audit",
        )
        _check_types(
            d,
            {
                "enabled": bool,
                "audit_trail_path": str,
                "include_data_samples": bool,
                "retention_days": int,
            },
            "audit",
        )
        cfg = cls(**d)
        if cfg.retention_days < 1:
            raise HooksConfigError("hooks.audit.retention_days must be at least 1")
        return cfg


class _SnapshotDumpingMetricsHooks(MetricsHooks):
    """In-memory metrics that persist their snapshot as one JSON file
    when the pipeline ends — the config-only path to "metrics came out"
    without a Prometheus/OTel backend in the container."""

    def __init__(self, registry: InMemoryMetricsRegistry, dump_path: str):
        super().__init__(registry)
        self.dump_path = dump_path

    def on_pipeline_end(self, pipeline, status, duration_s):
        super().on_pipeline_end(pipeline, status, duration_s)
        with open(self.dump_path, "w") as f:
            json.dump(self.registry.snapshot(), f, sort_keys=True, indent=2)


def _configure_logging(cfg: LoggingHooksConfig) -> None:
    root = logging.getLogger("pyspark_pipeline_framework_spark")
    root.setLevel(cfg.level.upper())
    if cfg.output == "stdout":
        handler: logging.Handler = logging.StreamHandler(sys.stdout)
    elif cfg.output == "stderr":
        handler = logging.StreamHandler(sys.stderr)
    else:
        handler = logging.FileHandler(cfg.output)
    if cfg.format == "json":
        handler.setFormatter(_JsonLogFormatter())
    else:
        handler.setFormatter(logging.Formatter("%(levelname)s %(name)s: %(message)s"))
    # replace only handlers we installed before (idempotent reconfig)
    root.handlers = [h for h in root.handlers if not getattr(h, "_ppfs_hooks", False)]
    handler._ppfs_hooks = True  # type: ignore[attr-defined]
    root.addHandler(handler)
    root.propagate = False


def build_metrics_registry(cfg: MetricsHooksConfig):
    if cfg.backend == "prometheus":
        from pyspark_pipeline_framework_spark.observability.exporters import (
            PrometheusMetricsRegistry,
        )

        return PrometheusMetricsRegistry()
    if cfg.backend == "otel":
        from pyspark_pipeline_framework_spark.observability.exporters import (
            OpenTelemetryMetricsRegistry,
        )

        return OpenTelemetryMetricsRegistry()
    return InMemoryMetricsRegistry()


def build_hooks_from_config(hooks_cfg: dict[str, Any]) -> PipelineHooks:
    """Turn a pipeline config's ``hooks`` block into a composed
    PipelineHooks. Empty/absent block → NoOpHooks (callers typically
    compose their own defaults)."""
    if not hooks_cfg:
        return NoOpHooks()
    _check_fields(hooks_cfg, {"logging", "metrics", "audit"}, "hooks")
    parts: list[PipelineHooks] = []

    # reference HooksConfig.__post_init__ (core/config/hooks.py:82-85):
    # a hooks block ALWAYS carries a logging config — a block declaring
    # only metrics/audit still gets default logging, never silence
    lc = LoggingHooksConfig.from_dict(_section_dict(hooks_cfg, "logging"))
    _configure_logging(lc)
    parts.append(LoggingHooks())

    if "metrics" in hooks_cfg:
        mc = MetricsHooksConfig.from_dict(_section_dict(hooks_cfg, "metrics"))
        if mc.enabled:
            registry = build_metrics_registry(mc)
            if mc.backend == "in_memory" and mc.dump_path:
                parts.append(_SnapshotDumpingMetricsHooks(registry, mc.dump_path))
            else:
                parts.append(MetricsHooks(registry))

    if "audit" in hooks_cfg:
        ac = AuditHooksConfig.from_dict(_section_dict(hooks_cfg, "audit"))
        if ac.enabled:
            sink = FileAuditSink(ac.audit_trail_path) if ac.audit_trail_path else LoggingAuditSink()
            parts.append(AuditHooks(sink))

    if not parts:
        return NoOpHooks()
    if len(parts) == 1:
        return parts[0]
    return CompositeHooks(*parts)


def validate_hooks_config(hooks_cfg: dict[str, Any]) -> None:
    """Eager validation for PipelineConfig.__post_init__ — parse every
    section without building observers (no filesystem side effects)."""
    if not hooks_cfg:
        return
    if not isinstance(hooks_cfg, dict):
        raise HooksConfigError(
            f"hooks block must be an object, got {type(hooks_cfg).__name__}"
        )
    _check_fields(hooks_cfg, {"logging", "metrics", "audit"}, "hooks")
    if "logging" in hooks_cfg:
        LoggingHooksConfig.from_dict(_section_dict(hooks_cfg, "logging"))
    if "metrics" in hooks_cfg:
        MetricsHooksConfig.from_dict(_section_dict(hooks_cfg, "metrics"))
    if "audit" in hooks_cfg:
        AuditHooksConfig.from_dict(_section_dict(hooks_cfg, "audit"))
