"""Audit trail: structured events with trace correlation, pluggable
sinks (logging / JSONL file / composite), and key-substring config
redaction — capability parity with the reference's audit subsystem
(core/audit/types.py:15-72, core/audit/sinks.py:17-114,
core/audit/filters.py:7-44, runner/audit_hooks.py:18-150)."""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any, Protocol

log = logging.getLogger(__name__)

REDACT_KEY_SUBSTRINGS = ("password", "secret", "token", "key", "credential")
REDACTED = "***REDACTED***"


def redact_config(config: dict[str, Any]) -> dict[str, Any]:
    """Recursively mask values whose key contains a sensitive substring."""
    out: dict[str, Any] = {}
    for k, v in config.items():
        if any(s in k.lower() for s in REDACT_KEY_SUBSTRINGS):
            out[k] = REDACTED
        elif isinstance(v, dict):
            out[k] = redact_config(v)
        else:
            out[k] = v
    return out


@dataclass(frozen=True)
class AuditEvent:
    action: str                 # pipeline_start | component_end | ...
    resource: str               # pipeline/component name
    status: str = "ok"
    actor: str = "pipeline-runner"
    trace_id: str = ""
    timestamp: float = field(default_factory=time.time)
    detail: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True, default=str)


class AuditSink(Protocol):
    def emit(self, event: AuditEvent) -> None: ...


class LoggingAuditSink:
    def emit(self, event: AuditEvent) -> None:
        log.info("audit %s", event.to_json())


class FileAuditSink:
    """Append-only JSONL file; writes are lock-serialized."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def emit(self, event: AuditEvent) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(event.to_json() + "\n")


class CompositeAuditSink:
    def __init__(self, *sinks: AuditSink):
        self.sinks = list(sinks)

    def emit(self, event: AuditEvent) -> None:
        for s in self.sinks:
            try:
                s.emit(event)
            except Exception as exc:  # noqa: BLE001 — observers never fail the run
                log.error("audit sink %s raised: %s", type(s).__name__, exc)


class AuditHooks:
    """PipelineHooks implementation emitting one event per lifecycle
    point, correlated by a per-run trace id."""

    def __init__(self, sink: AuditSink, actor: str = "pipeline-runner"):
        self.sink = sink
        self.actor = actor
        self.trace_id = ""

    def _emit(self, action: str, resource: str, status: str = "ok", **detail: Any) -> None:
        self.sink.emit(
            AuditEvent(
                action=action, resource=resource, status=status, actor=self.actor,
                trace_id=self.trace_id, detail=detail,
            )
        )

    def on_pipeline_start(self, pipeline):
        self.trace_id = uuid.uuid4().hex
        self._emit("pipeline_start", pipeline)

    def on_pipeline_end(self, pipeline, status, duration_s):
        self._emit("pipeline_end", pipeline, status=status, duration_s=duration_s)

    def on_component_start(self, pipeline, component):
        self._emit("component_start", f"{pipeline}/{component}")

    def on_component_end(self, pipeline, component, status, duration_s):
        self._emit("component_end", f"{pipeline}/{component}", status=status, duration_s=duration_s)

    def on_component_retry(self, pipeline, component, attempt, error):
        self._emit("component_retry", f"{pipeline}/{component}", status="retrying",
                   attempt=attempt, error=error)

    def on_component_skipped(self, pipeline, component, reason):
        self._emit("component_skipped", f"{pipeline}/{component}", status="skipped", reason=reason)

    def on_validation_complete(self, pipeline, ok, messages):
        self._emit("validation", pipeline, status="ok" if ok else "failed", messages=messages)
