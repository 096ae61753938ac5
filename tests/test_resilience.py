"""Retry + circuit-breaker behavior with fake clock/sleep/random —
mirrors the reference's unit-test strategy (SURVEY.md §5.1/§5.3)."""

import pytest
from hypothesis import given, strategies as st

from pyspark_pipeline_framework_spark.resilience.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerOpenError,
    CircuitState,
)
from pyspark_pipeline_framework_spark.resilience.retry import RetryExecutor, RetryPolicy, with_retry


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("boom")
        return "ok"

    sleeps = []
    ex = RetryExecutor(RetryPolicy(max_attempts=5, initial_delay_s=1, jitter=0), sleep=sleeps.append)
    assert ex.execute(flaky) == "ok"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential


def test_retry_exhausts_and_raises():
    ex = RetryExecutor(RetryPolicy(max_attempts=3, initial_delay_s=0, jitter=0), sleep=lambda s: None)
    with pytest.raises(ValueError):
        ex.execute(lambda: (_ for _ in ()).throw(ValueError("always")))
    assert ex.attempts == 3


def test_retry_respects_allowlist():
    ex = RetryExecutor(
        RetryPolicy(max_attempts=5, retry_on=(KeyError,), initial_delay_s=0, jitter=0),
        sleep=lambda s: None,
    )
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise ValueError("not retryable")

    with pytest.raises(ValueError):
        ex.execute(fn)
    assert calls["n"] == 1


def test_retry_allowlist_mro_match():
    class Child(KeyError):
        pass

    policy = RetryPolicy(retry_on=(KeyError,))
    assert policy.should_retry(Child("x"))
    assert not policy.should_retry(ValueError("x"))


@given(
    attempt=st.integers(min_value=1, max_value=20),
    initial=st.floats(min_value=0.001, max_value=10),
    mult=st.floats(min_value=1.0, max_value=4.0),
    cap=st.floats(min_value=0.001, max_value=100),
)
def test_delay_capped_and_nonnegative(attempt, initial, mult, cap):
    p = RetryPolicy(initial_delay_s=initial, multiplier=mult, max_delay_s=cap, jitter=0)
    d = p.delay_for(attempt, rand=lambda: 0.5)
    assert 0 <= d <= cap + 1e-9


@given(st.integers(min_value=1, max_value=10))
def test_delay_monotone_without_jitter(n):
    p = RetryPolicy(initial_delay_s=0.5, multiplier=2, max_delay_s=1000, jitter=0)
    delays = [p.delay_for(a) for a in range(1, n + 1)]
    assert delays == sorted(delays)


def test_with_retry_decorator():
    calls = {"n": 0}

    @with_retry(RetryPolicy(max_attempts=2, initial_delay_s=0, jitter=0), sleep=lambda s: None)
    def f():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("once")
        return 42

    assert f() == 42


def test_circuit_breaker_state_machine():
    clock = FakeClock()
    cb = CircuitBreaker(failure_threshold=2, success_threshold=2, timeout_s=10, clock=clock)
    assert cb.state == CircuitState.CLOSED

    for _ in range(2):
        with pytest.raises(ValueError):
            cb.call(lambda: (_ for _ in ()).throw(ValueError()))
    assert cb.state == CircuitState.OPEN

    with pytest.raises(CircuitBreakerOpenError):
        cb.call(lambda: "blocked")

    clock.advance(11)
    assert cb.state == CircuitState.HALF_OPEN
    assert cb.call(lambda: "trial") == "trial"
    # half-open call cap: second concurrent trial before success_threshold reached
    assert not cb.allow()

    cb.record_success()  # reaches success_threshold=2 with the trial's success
    assert cb.state == CircuitState.CLOSED


def test_circuit_breaker_half_open_failure_reopens():
    clock = FakeClock()
    cb = CircuitBreaker(failure_threshold=1, timeout_s=5, clock=clock)
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError()))
    clock.advance(6)
    assert cb.state == CircuitState.HALF_OPEN
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError()))
    assert cb.state == CircuitState.OPEN


def test_circuit_breaker_thread_safety():
    import threading

    cb = CircuitBreaker(failure_threshold=10_000)
    errors = []

    def hammer():
        try:
            for _ in range(500):
                cb.record_failure()
                cb.record_success()
                cb.allow()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
