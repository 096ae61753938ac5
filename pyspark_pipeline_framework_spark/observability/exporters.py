"""Metrics exporters — Prometheus / OpenTelemetry adapters on the
MetricsRegistry protocol (reference core/metrics/exporters.py:18-205).
Both are import-gated: their client libraries are optional extras, and
construction raises a clear ImportError when absent."""

from __future__ import annotations


class PrometheusMetricsRegistry:
    """Adapter onto prometheus_client (optional dependency)."""

    def __init__(self, namespace: str = "ppfs"):
        try:
            import prometheus_client  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "PrometheusMetricsRegistry requires prometheus_client"
            ) from e
        from prometheus_client import Counter, Gauge, Histogram

        self._ns = namespace
        self._Counter, self._Gauge, self._Histogram = Counter, Gauge, Histogram
        self._counters: dict[tuple, object] = {}
        self._gauges: dict[tuple, object] = {}
        self._timers: dict[tuple, object] = {}

    def _metric(self, store, cls, name: str, labels: dict[str, str]):
        key = (name, tuple(sorted(labels)))
        if key not in store:
            store[key] = cls(f"{self._ns}_{name}", name, sorted(labels))
        return store[key].labels(**labels) if labels else store[key]

    def counter(self, name: str, value: float = 1.0, **labels: str) -> None:
        self._metric(self._counters, self._Counter, name, labels).inc(value)

    def gauge(self, name: str, value: float, **labels: str) -> None:
        self._metric(self._gauges, self._Gauge, name, labels).set(value)

    def timer(self, name: str, seconds: float, **labels: str) -> None:
        self._metric(self._timers, self._Histogram, name, labels).observe(seconds)


class OpenTelemetryMetricsRegistry:
    """Adapter onto opentelemetry-api (optional dependency)."""

    def __init__(self, meter_name: str = "ppfs"):
        try:
            from opentelemetry import metrics  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "OpenTelemetryMetricsRegistry requires opentelemetry-api"
            ) from e
        from opentelemetry import metrics as _m

        self._meter = _m.get_meter(meter_name)
        self._counters: dict[str, object] = {}
        self._gauges: dict[str, float] = {}
        self._timers: dict[str, object] = {}

    def counter(self, name: str, value: float = 1.0, **labels: str) -> None:
        if name not in self._counters:
            self._counters[name] = self._meter.create_counter(name)
        self._counters[name].add(value, labels)

    def gauge(self, name: str, value: float, **labels: str) -> None:
        key = name

        def _cb(_options, _key=key):
            from opentelemetry.metrics import Observation

            return [Observation(self._gauges.get(_key, 0.0))]

        if name not in self._gauges:
            self._meter.create_observable_gauge(name, callbacks=[_cb])
        self._gauges[name] = value

    def timer(self, name: str, seconds: float, **labels: str) -> None:
        if name not in self._timers:
            self._timers[name] = self._meter.create_histogram(name, unit="s")
        self._timers[name].record(seconds, labels)
