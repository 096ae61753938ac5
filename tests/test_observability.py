"""Hooks / metrics / audit behavior, incl. the CLI surface."""

import json

from pyspark_pipeline_framework_spark.observability.audit import (
    AuditHooks,
    CompositeAuditSink,
    FileAuditSink,
    redact_config,
)
from pyspark_pipeline_framework_spark.observability.hooks import (
    CompositeHooks,
    MetricsHooks,
    NoOpHooks,
)
from pyspark_pipeline_framework_spark.observability.metrics import InMemoryMetricsRegistry


def test_redaction():
    cfg = {"db_password": "x", "nested": {"api_key": "y", "host": "h"}, "plain": 1}
    out = redact_config(cfg)
    assert out["db_password"] == "***REDACTED***"
    assert out["nested"]["api_key"] == "***REDACTED***"
    assert out["nested"]["host"] == "h" and out["plain"] == 1


def test_metrics_hooks_record():
    reg = InMemoryMetricsRegistry()
    h = MetricsHooks(reg)
    h.on_component_end("p", "c", "success", 1.5)
    h.on_component_retry("p", "c", 1, "err")
    snap = reg.snapshot()
    assert snap["counters"]["component_runs{component=c,pipeline=p,status=success}"] == 1
    assert snap["counters"]["component_retries{component=c,pipeline=p}"] == 1
    assert snap["timers"]["component_duration_s{component=c,pipeline=p}"] == [1.5]


def test_composite_swallows_hook_errors():
    class Broken(NoOpHooks):
        def on_pipeline_start(self, pipeline):
            raise RuntimeError("observer bug")

    reg = InMemoryMetricsRegistry()
    composite = CompositeHooks(Broken(), MetricsHooks(reg))
    composite.on_pipeline_start("p")  # must not raise
    composite.on_pipeline_end("p", "success", 0.1)
    assert reg.snapshot()["counters"]


def test_audit_jsonl_sink(tmp_path):
    path = str(tmp_path / "audit.jsonl")
    hooks = AuditHooks(FileAuditSink(path))
    hooks.on_pipeline_start("p")
    hooks.on_component_start("p", "c")
    hooks.on_component_end("p", "c", "success", 0.5)
    hooks.on_pipeline_end("p", "success", 1.0)
    events = [json.loads(line) for line in open(path)]
    assert [e["action"] for e in events] == [
        "pipeline_start", "component_start", "component_end", "pipeline_end",
    ]
    trace_ids = {e["trace_id"] for e in events}
    assert len(trace_ids) == 1 and "" not in trace_ids


def test_audit_composite_sink_resilient(tmp_path):
    class BadSink:
        def emit(self, event):
            raise OSError("disk full")

    path = str(tmp_path / "a.jsonl")
    sink = CompositeAuditSink(BadSink(), FileAuditSink(path))
    hooks = AuditHooks(sink)
    hooks.on_pipeline_start("p")
    assert len(open(path).readlines()) == 1


def test_cli_dry_run_and_run(tmp_path, spark):
    cfg = {
        "name": "cli_demo",
        "components": [
            {
                "name": "load",
                "op": "read",
                "params": {"format": "parquet", "path": "/root/testdata/sf0.001/region.parquet"},
                "output": "region",
            },
            {
                "name": "agg",
                "op": "sql",
                "params": {"sql": "SELECT COUNT(*) AS n FROM region"},
                "depends_on": ["load"],
            },
        ],
    }
    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(cfg))
    from pyspark_pipeline_framework_spark.cli import main

    assert main([str(p), "--dry-run"]) == 0
    assert main([str(p)]) == 0
    assert main([str(tmp_path / "missing.json")]) == 1
