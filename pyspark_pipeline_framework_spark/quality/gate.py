"""Quality gate: executes checks at pipeline timing points with the
reference's three failure modes (core/quality/types.py:22-27,
runner/quality_hooks.py:73-121): FAIL_ON_ERROR raises, WARN_ONLY logs,
THRESHOLD tolerates up to ``max_failures`` failed checks per run."""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from pyspark_pipeline_framework_spark.quality.checks import (
    CheckResult,
    CheckSeverity,
    CheckTiming,
    DataQualityCheck,
)

log = logging.getLogger(__name__)


class QualityGateError(RuntimeError):
    def __init__(self, results: list[CheckResult]):
        self.results = results
        failed = [r for r in results if not r.passed]
        super().__init__(
            f"{len(failed)} quality check(s) failed: "
            + "; ".join(f"{r.check_name}: {r.detail}" for r in failed)
        )


@dataclass
class QualityGate:
    checks: list[DataQualityCheck] = field(default_factory=list)
    max_failures: int = 0  # used by THRESHOLD severity
    results: list[CheckResult] = field(default_factory=list)

    def add(self, check: DataQualityCheck) -> "QualityGate":
        self.checks.append(check)
        return self

    def run(
        self,
        timing: CheckTiming,
        datasets: dict[str, DataFrame],
    ) -> list[CheckResult]:
        """Run every check registered for ``timing`` whose dataset is
        present; enforce severities."""
        batch: list[CheckResult] = []
        hard_failures: list[CheckResult] = []
        threshold_failures = 0
        for check in self.checks:
            if check.timing != timing or check.dataset not in datasets:
                continue
            result = check.run(datasets[check.dataset])
            batch.append(result)
            self.results.append(result)
            if result.passed:
                continue
            if check.severity == CheckSeverity.WARN_ONLY:
                log.warning("quality check failed (warn-only): %s %s", result.check_name, result.detail)
            elif check.severity == CheckSeverity.THRESHOLD:
                threshold_failures += 1
                if threshold_failures > self.max_failures:
                    hard_failures.append(result)
            else:
                hard_failures.append(result)
        if hard_failures:
            raise QualityGateError(batch)
        return batch
