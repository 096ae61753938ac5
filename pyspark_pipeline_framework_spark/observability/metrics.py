"""Metrics registry: counters / gauges / timers behind a minimal
protocol, with a thread-safe in-memory implementation (reference
core/metrics/registry.py:19-235). Prometheus/OpenTelemetry exporters
are adapter-shaped on the same protocol — gated on their libraries
being installed (not bundled in this container)."""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Protocol


class MetricsRegistry(Protocol):
    def counter(self, name: str, value: float = 1.0, **labels: str) -> None: ...
    def gauge(self, name: str, value: float, **labels: str) -> None: ...
    def timer(self, name: str, seconds: float, **labels: str) -> None: ...


def _key(name: str, labels: dict[str, str]) -> str:
    if not labels:
        return name
    tag = ",".join(f"{k}={v}" for k, v in sorted(labels.items()))
    return f"{name}{{{tag}}}"


class InMemoryMetricsRegistry:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}
        self.timers: dict[str, list[float]] = defaultdict(list)

    def counter(self, name: str, value: float = 1.0, **labels: str) -> None:
        with self._lock:
            self.counters[_key(name, labels)] += value

    def gauge(self, name: str, value: float, **labels: str) -> None:
        with self._lock:
            self.gauges[_key(name, labels)] = value

    def timer(self, name: str, seconds: float, **labels: str) -> None:
        with self._lock:
            self.timers[_key(name, labels)].append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
                "timers": {k: list(v) for k, v in self.timers.items()},
            }
