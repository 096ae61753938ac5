"""Run results — SUCCESS / PARTIAL_SUCCESS / FAILURE semantics of the
reference's ``PipelineResult`` (runner/result.py:9-45)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class ComponentStatus(enum.Enum):
    SUCCESS = "success"
    FAILURE = "failure"
    SKIPPED = "skipped"


class PipelineStatus(enum.Enum):
    SUCCESS = "success"
    PARTIAL_SUCCESS = "partial_success"
    FAILURE = "failure"


@dataclass
class ComponentResult:
    name: str
    status: ComponentStatus
    duration_s: float = 0.0
    attempts: int = 1
    error: str = ""


@dataclass
class PipelineResult:
    pipeline: str
    components: list[ComponentResult] = field(default_factory=list)

    @property
    def status(self) -> PipelineStatus:
        ran = [c for c in self.components if c.status != ComponentStatus.SKIPPED]
        failed = [c for c in ran if c.status == ComponentStatus.FAILURE]
        if not failed:
            return PipelineStatus.SUCCESS
        if len(failed) < len(ran):
            return PipelineStatus.PARTIAL_SUCCESS
        return PipelineStatus.FAILURE

    @property
    def succeeded(self) -> bool:
        return self.status == PipelineStatus.SUCCESS

    def exit_code(self) -> int:
        # CLI parity: 0 success / 2 partial / 1 failure (runner/cli.py:88-95)
        return {PipelineStatus.SUCCESS: 0, PipelineStatus.PARTIAL_SUCCESS: 2}.get(self.status, 1)
