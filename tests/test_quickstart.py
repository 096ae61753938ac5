"""docs/QUICKSTART.md executes (VERDICT r7 item 5).

The walkthrough's code blocks are extracted FROM THE DOC and run
verbatim — the HOCON config block through the real CLI, the
read-the-outputs python blocks via exec — so the document cannot
drift from the code. Mirrors how tests/test_examples.py keeps the
example confs honest."""

from __future__ import annotations

import json
import os
import re

import pytest

from pyspark_pipeline_framework_spark.cli import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "QUICKSTART.md")


def _blocks(lang: str) -> list[str]:
    with open(DOC) as f:
        text = f.read()
    return re.findall(rf"```{lang}\n(.*?)```", text, flags=re.S)


@pytest.fixture(scope="module")
def conf_path(tmp_path_factory):
    blocks = _blocks("hocon")
    assert len(blocks) == 1, "quickstart should carry exactly one hocon block"
    p = tmp_path_factory.mktemp("quickstart") / "quickstart.conf"
    p.write_text(blocks[0])
    return str(p)


def test_quickstart_pipeline_runs(spark, conf_path):
    # the doc's run command is `python -m pyspark_pipeline_framework_spark
    # quickstart.conf` — main([conf]) is exactly that entry point
    assert main([conf_path]) == 0


def test_quickstart_outputs_read_back(spark, conf_path):
    # the audit sink APPENDS across runs — start from a clean slate so
    # the trace-correlation assertion sees exactly one run
    audit = os.path.join(REPO, ".scratch", "quickstart", "audit.jsonl")
    if os.path.exists(audit):
        os.remove(audit)
    assert main([conf_path]) == 0
    # execute the doc's own read-the-outputs blocks verbatim
    py = [b for b in _blocks("python")]
    assert len(py) == 3
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        env: dict = {"spark": spark, "json": json}
        for block in py:
            exec(block, env)  # noqa: S102 — the doc under test
    finally:
        os.chdir(cwd)
    df = env["df"]
    assert df.count() > 0
    assert {"day", "n_events", "total_value", "event_type"} <= set(df.columns)
    # daily rollup invariant: counts positive, one row per (day, type)
    assert df.count() == df.select("day", "event_type").distinct().count()
    metrics = env["metrics"]
    assert isinstance(metrics, dict) and metrics
    events = env["events"]
    actions = {e["action"] for e in events}
    assert {"pipeline_start", "component_start", "component_end",
            "pipeline_end"} <= actions
    resources = {e["resource"] for e in events}
    assert {"quickstart/load_events", "quickstart/daily_rollup",
            "quickstart/save"} <= resources
    # one trace id correlates the whole run (validation events fire
    # before pipeline_start and legitimately carry an empty trace)
    assert len({e["trace_id"] for e in events if e["trace_id"]}) == 1


def test_quickstart_dry_run_flag(conf_path):
    assert main([conf_path, "--dry-run"]) == 0
