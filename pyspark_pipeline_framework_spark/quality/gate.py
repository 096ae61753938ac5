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
        component_name: str | None = None,
        component_output: str | None = None,
    ) -> list[CheckResult]:
        """Run every check registered for ``timing`` whose dataset is
        present; enforce severities.

        AFTER_COMPONENT calls pass the just-finished component's name
        and output dataset, and only checks scoped to that component
        run — a check with an explicit ``component_name`` must match
        it; an unscoped check runs iff its dataset is the component's
        output. Without this, every registered check would re-execute
        its full-scan aggregate after EVERY component (O(components ×
        checks) redundant Spark jobs) and a failing check on dataset A
        would mark whatever unrelated component ran last as the
        failure."""
        batch: list[CheckResult] = []
        hard_failures: list[CheckResult] = []
        threshold_failures = 0
        for check in self.checks:
            if check.timing != timing or check.dataset not in datasets:
                continue
            if timing == CheckTiming.AFTER_COMPONENT:
                if check.component_name is not None:
                    if check.component_name != component_name:
                        continue
                elif check.dataset != component_output:
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
