"""Bundled resilience presets (reference core/config/presets.py:14-109:
NO_RETRY / DEFAULT / AGGRESSIVE / CONSERVATIVE)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark_pipeline_framework_spark.resilience.retry import RetryPolicy


@dataclass(frozen=True)
class ResiliencePolicy:
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    circuit_breaker_enabled: bool = False
    failure_threshold: int = 5
    cb_timeout_s: float = 30.0


NO_RETRY = ResiliencePolicy(retry=RetryPolicy(max_attempts=1))
DEFAULT = ResiliencePolicy()
AGGRESSIVE = ResiliencePolicy(
    retry=RetryPolicy(max_attempts=5, initial_delay_s=0.5, multiplier=1.5, max_delay_s=15.0),
    circuit_breaker_enabled=True,
    failure_threshold=10,
)
CONSERVATIVE = ResiliencePolicy(
    retry=RetryPolicy(max_attempts=2, initial_delay_s=5.0, multiplier=3.0, max_delay_s=120.0),
    circuit_breaker_enabled=True,
    failure_threshold=3,
    cb_timeout_s=120.0,
)
