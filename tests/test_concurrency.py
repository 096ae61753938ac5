"""Thread-safety hammering for the shared driver-side state (reference
§5.4 technique: 8 threads × 500 iterations)."""

import threading

from pyspark_pipeline_framework_spark.observability.metrics import InMemoryMetricsRegistry
from pyspark_pipeline_framework_spark.secrets import EnvSecretsProvider, SecretsResolver


def _hammer(fn, n_threads=8, iters=500):
    errors: list[Exception] = []

    def run():
        try:
            for i in range(iters):
                fn(i)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_metrics_registry_concurrent():
    reg = InMemoryMetricsRegistry()

    def op(i):
        reg.counter("c", 1, worker="w")
        reg.gauge("g", float(i))
        reg.timer("t", 0.001)
        reg.snapshot()

    _hammer(op)
    assert reg.snapshot()["counters"]["c{worker=w}"] == 8 * 500


def test_secrets_cache_concurrent(monkeypatch):
    monkeypatch.setenv("CONC_KEY", "v")
    resolver = SecretsResolver([EnvSecretsProvider()], ttl_s=0.0001)

    def op(i):
        assert resolver.resolve("env/CONC_KEY") == "v"

    _hammer(op)
