"""Retry with exponential backoff + jitter.

Behavior parity with the reference executor (core/resilience/
retry.py:19-170): delay = min(initial·multiplier^attempt, max) ± jitter,
exception-type allowlist with MRO matching, ``on_retry`` callback, and a
decorator form. Clock/sleep/random are injectable for deterministic
tests (reference pattern tests/factories.py:74-93)."""

from __future__ import annotations

import logging
import random
import time
from dataclasses import dataclass
from typing import Any, Callable

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 3
    initial_delay_s: float = 1.0
    multiplier: float = 2.0
    max_delay_s: float = 60.0
    jitter: float = 0.1          # ± fraction of the computed delay
    retry_on: tuple[type[BaseException], ...] = (Exception,)

    def __post_init__(self) -> None:
        if self.max_attempts < 1:
            raise ValueError("max_attempts must be >= 1")
        if self.initial_delay_s < 0 or self.max_delay_s < 0:
            raise ValueError("delays must be >= 0")
        if self.multiplier < 1:
            raise ValueError("multiplier must be >= 1")

    def delay_for(self, attempt: int, rand: Callable[[], float] = random.random) -> float:
        """Backoff before retry number ``attempt`` (1-based). Monotone
        non-decreasing pre-jitter, capped at max_delay_s."""
        base = min(self.initial_delay_s * (self.multiplier ** (attempt - 1)), self.max_delay_s)
        if self.jitter:
            base *= 1 + self.jitter * (2 * rand() - 1)
        return max(base, 0.0)

    def should_retry(self, exc: BaseException) -> bool:
        return isinstance(exc, self.retry_on)


class RetryExecutor:
    def __init__(
        self,
        policy: RetryPolicy | None = None,
        sleep: Callable[[float], None] = time.sleep,
        rand: Callable[[], float] = random.random,
        on_retry: Callable[[int, BaseException, float], None] | None = None,
    ):
        self.policy = policy or RetryPolicy()
        self._sleep = sleep
        self._rand = rand
        self._on_retry = on_retry
        self.attempts = 0

    def execute(self, fn: Callable[..., Any], *args: Any, **kwargs: Any) -> Any:
        last: BaseException | None = None
        for attempt in range(1, self.policy.max_attempts + 1):
            self.attempts = attempt
            try:
                return fn(*args, **kwargs)
            except BaseException as exc:  # noqa: BLE001 — filtered below
                last = exc
                if attempt >= self.policy.max_attempts or not self.policy.should_retry(exc):
                    raise
                delay = self.policy.delay_for(attempt, self._rand)
                if self._on_retry:
                    self._on_retry(attempt, exc, delay)
                log.warning("attempt %d failed (%s); retrying in %.2fs", attempt, exc, delay)
                self._sleep(delay)
        raise last  # pragma: no cover — loop always returns or raises


def with_retry(policy: RetryPolicy | None = None, **executor_kwargs):
    """Decorator form: ``@with_retry(RetryPolicy(max_attempts=5))``."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            return RetryExecutor(policy, **executor_kwargs).execute(fn, *args, **kwargs)

        wrapper.__name__ = getattr(fn, "__name__", "wrapped")
        return wrapper

    return deco
