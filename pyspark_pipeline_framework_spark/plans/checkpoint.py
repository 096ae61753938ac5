"""Checkpoint / resume.

Behavior parity with the reference store (runner/checkpoint.py:52-292):
JSON state with completed components, atomic write-then-rename, a
SHA-256 structural fingerprint over (name, op/class_path, depends_on) —
params deliberately excluded so config-value tweaks don't invalidate a
resume — and ``load_for_resume`` that only matches same-fingerprint
runs."""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

from pyspark_pipeline_framework_spark.plans.config import PipelineConfig


def structural_fingerprint(config: PipelineConfig) -> str:
    payload = [
        {"name": c.name, "op": c.op or c.class_path, "depends_on": sorted(c.depends_on)}
        for c in sorted(config.components, key=lambda c: c.name)
    ]
    blob = json.dumps({"pipeline": config.name, "components": payload}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()


@dataclass
class CheckpointState:
    pipeline: str
    fingerprint: str
    completed_components: list[str] = field(default_factory=list)
    updated_at: float = field(default_factory=time.time)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "CheckpointState":
        return cls(**json.loads(s))


class LocalCheckpointStore:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, pipeline: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in pipeline)
        return os.path.join(self.directory, f"{safe}.checkpoint.json")

    def save(self, state: CheckpointState) -> None:
        """Atomic write-rename so a crash never leaves a torn file."""
        path = self._path(state.pipeline)
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(state.to_json())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self, pipeline: str) -> CheckpointState | None:
        path = self._path(pipeline)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return CheckpointState.from_json(f.read())

    def clear(self, pipeline: str) -> None:
        path = self._path(pipeline)
        if os.path.exists(path):
            os.unlink(path)

    def load_for_resume(self, config: PipelineConfig) -> list[str]:
        """Completed components from a matching previous run — empty if
        none. A checkpoint whose fingerprint does not match the current
        pipeline structure RAISES (reference ``PipelineConfigChangedError``
        semantics): silently restarting from scratch would hide that the
        resume the caller asked for is impossible."""
        state = self.load(config.name)
        if state is None:
            return []
        if state.fingerprint != structural_fingerprint(config):
            raise PipelineConfigChangedError(
                f"checkpoint for pipeline {config.name!r} was written by a "
                f"structurally different pipeline (fingerprint "
                f"{state.fingerprint[:12]}… != {structural_fingerprint(config)[:12]}…); "
                f"clear the checkpoint to start fresh"
            )
        return list(state.completed_components)


class PipelineConfigChangedError(RuntimeError):
    """The pipeline structure changed since the checkpoint was written
    (reference runner/checkpoint.py PipelineConfigChangedError)."""


class CheckpointHooks:
    """Persists checkpoint progress DURING a run (reference
    runner/checkpoint.py CheckpointHooks): after every successful
    component the completed set is saved via the store's atomic
    write-rename, so a crash mid-pipeline resumes from the last
    finished component instead of from scratch. On a fully successful
    pipeline end the checkpoint is cleared (a finished run has nothing
    to resume). Implements the ``PipelineHooks`` protocol — compose
    with other hooks via ``CompositeHooks``."""

    def __init__(
        self,
        store: LocalCheckpointStore,
        config: PipelineConfig,
        completed: list[str] | None = None,
    ):
        self.store = store
        self.config = config
        self.completed = list(completed or [])
        self._fingerprint = structural_fingerprint(config)

    def _save(self) -> None:
        self.store.save(
            CheckpointState(
                pipeline=self.config.name,
                fingerprint=self._fingerprint,
                completed_components=list(self.completed),
            )
        )

    def on_pipeline_start(self, pipeline): pass

    def on_pipeline_end(self, pipeline, status, duration_s):
        if status == "success":
            self.store.clear(pipeline)

    def on_component_start(self, pipeline, component): pass

    def on_component_end(self, pipeline, component, status, duration_s):
        if status == "success" and component not in self.completed:
            self.completed.append(component)
            self._save()

    def on_component_retry(self, pipeline, component, attempt, error): pass

    def on_component_skipped(self, pipeline, component, reason): pass

    def on_validation_complete(self, pipeline, ok, messages): pass
