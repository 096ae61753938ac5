"""Failure-path property tests for the config surface (VERDICT r3 #6):
EVERY malformed hooks / resilience / stream block — unknown field, wrong
type, bad enum, wrong block shape — must fail AT LOAD TIME
(`PipelineConfig` construction) with a `PipelineValidationError` whose
message names the offending section, never surface as a bare
TypeError/KeyError or, worse, mid-run.

A hypothesis strategy picks a mutation site and a junk value; the
invariant is uniform: load raises the typed error and the message
carries the section marker."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark_pipeline_framework_spark.plans.config import (
    ComponentConfig,
    PipelineConfig,
    PipelineValidationError,
)

# junk values deliberately spanning wrong types: the parsers must turn
# every one of these into the typed config error, not a TypeError
junk = st.one_of(
    st.integers(),
    st.booleans(),
    st.floats(allow_nan=False),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    ).filter(
        lambda s: s
        not in {
            # valid enum values that would NOT be rejected
            "text", "json", "in_memory", "prometheus", "otel",
            "append", "complete", "update",
            "available_now", "once", "continuous", "processing_time",
            "no_retry", "default", "aggressive", "conservative",
            "debug", "info", "warning", "error", "critical",
        }
    ),
    st.lists(st.integers(), max_size=3),
)

field_name = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=15)


def _mk(components=None, **pipeline_kw):
    comps = components or [{"name": "c1", "op": "sql", "params": {"sql": "SELECT 1"}}]
    return PipelineConfig.from_dict({"name": "p", "components": comps, **pipeline_kw})


# each entry: (section marker expected in the message, config builder)
HOOKS_MUTATIONS = [
    ("hooks", lambda f, v: {f: {}}),                       # unknown section
    ("hooks.logging", lambda f, v: {"logging": {f: v}}),   # unknown field
    ("logging", lambda f, v: {"logging": {"format": v}}),  # bad enum/type
    ("logging", lambda f, v: {"logging": {"level": v}}),
    ("logging", lambda f, v: {"logging": v if not isinstance(v, dict) else 5}),
    ("hooks.metrics", lambda f, v: {"metrics": {f: v}}),
    ("metrics", lambda f, v: {"metrics": {"backend": v}}),
    ("metrics", lambda f, v: {"metrics": {"export_interval_seconds": v if isinstance(v, int) and not isinstance(v, bool) and v < 1 else 0}}),
    ("hooks.audit", lambda f, v: {"audit": {f: v}}),
    ("audit", lambda f, v: {"audit": {"retention_days": 0}}),
    ("audit", lambda f, v: {"audit": {"enabled": v if not isinstance(v, bool) else 3}}),
]


@settings(max_examples=150, deadline=None)
@given(
    mutation=st.sampled_from(HOOKS_MUTATIONS),
    f=field_name.filter(lambda s: s not in {"logging", "metrics", "audit", "level", "format", "output", "structured", "enabled", "backend", "push_gateway_url", "export_interval_seconds", "dump_path", "audit_trail_path", "include_data_samples", "retention_days"}),
    v=junk,
)
def test_malformed_hooks_blocks_fail_at_load(mutation, f, v):
    marker, build = mutation
    with pytest.raises(PipelineValidationError) as exc:
        _mk(hooks=build(f, v))
    assert marker.split(".")[-1] in str(exc.value)


RESILIENCE_MUTATIONS = [
    ("retry", lambda f, v: {"retry": {f: v}}),                        # unknown field
    ("retry", lambda f, v: {"retry": {"max_attempts": "three"}}),     # wrong type
    ("retry", lambda f, v: {"retry": {"max_attempts": 0}}),           # bad value
    ("retry", lambda f, v: {"retry": {"multiplier": 0.5}}),
    ("retry", lambda f, v: {"retry": {"retry_on": "ValueError"}}),    # not a list
    ("retry", lambda f, v: {"retry": {"retry_on": [12]}}),            # non-string entry
    ("retry", lambda f, v: {"retry": {"retry_on": ["NoSuchError"]}}),
    ("retry", lambda f, v: {"retry": 7}),                             # non-dict block
    ("circuit_breaker", lambda f, v: {"circuit_breaker": {f: v}}),
    ("circuit_breaker", lambda f, v: {"circuit_breaker": {"failure_threshold": 0}}),
    ("circuit_breaker", lambda f, v: {"circuit_breaker": {"timeout_s": "soon"}}),
    ("circuit_breaker", lambda f, v: {"circuit_breaker": 7}),
    ("resilience", lambda f, v: {"resilience": f}),                   # unknown preset
    ("resilience", lambda f, v: {"resilience": 3}),                   # wrong type
    ("resilience", lambda f, v: {"resilience": {f: v}}),              # unknown sub-block
    ("resilience", lambda f, v: {"resilience": "default", "retry": {}}),  # mutual exclusion
]

_RES_FIELDS = {
    "max_attempts", "initial_delay_s", "multiplier", "max_delay_s", "jitter", "retry_on",
    "initial_delay_seconds", "max_delay_seconds", "backoff_multiplier", "retry_on_exceptions",
    "failure_threshold", "success_threshold", "timeout_s", "timeout_seconds",
    "half_open_max_calls", "retry", "circuit_breaker",
    "no_retry", "default", "aggressive", "conservative",
}


@settings(max_examples=150, deadline=None)
@given(
    mutation=st.sampled_from(RESILIENCE_MUTATIONS),
    f=field_name.filter(lambda s: s not in _RES_FIELDS),
    v=junk,
)
def test_malformed_resilience_blocks_fail_at_load(mutation, f, v):
    marker, build = mutation
    with pytest.raises(PipelineValidationError) as exc:
        ComponentConfig(name="c", op="sql", **build(f, v))
    msg = str(exc.value)
    assert marker in msg or "resilience" in msg
    assert "'c'" in msg  # component name present


_GOOD_STREAM = {
    "source": {"type": "rate"},
    "sink": {"type": "console"},
}

STREAM_MUTATIONS = [
    ("stream param", lambda f, v: {**_GOOD_STREAM, f: v}),            # unknown param
    ("source", lambda f, v: {**_GOOD_STREAM, "source": {"type": f}}),  # unknown source type
    ("source", lambda f, v: {**_GOOD_STREAM, "source": v if not isinstance(v, dict) else 5}),
    ("source", lambda f, v: {**_GOOD_STREAM, "source": {"path": "/x"}}),  # missing type
    ("source", lambda f, v: {**_GOOD_STREAM, "source": {"type": "rate", f: v}}),  # bad adapter kw
    ("sink", lambda f, v: {**_GOOD_STREAM, "sink": {"type": f}}),
    ("sink", lambda f, v: {**_GOOD_STREAM, "sink": {"type": "memory"}}),  # missing table_name
    ("trigger", lambda f, v: {**_GOOD_STREAM, "trigger": f}),          # unknown trigger
    ("trigger", lambda f, v: {**_GOOD_STREAM, "trigger": {"interval": "5 seconds"}}),
    ("trigger", lambda f, v: {**_GOOD_STREAM, "trigger": {"type": "once", f: v}}),
    ("trigger", lambda f, v: {**_GOOD_STREAM, "trigger": 3.5}),
    ("output_mode", lambda f, v: {**_GOOD_STREAM, "output_mode": f}),
    ("watermark", lambda f, v: {**_GOOD_STREAM, "watermark": {"column": "ts"}}),  # missing delay
    ("watermark", lambda f, v: {**_GOOD_STREAM, "watermark": v if not isinstance(v, dict) else 5}),
    ("source", lambda f, v: {"sink": {"type": "console"}}),            # missing source
    ("sink", lambda f, v: {"source": {"type": "rate"}}),               # missing sink
]

_STREAM_FIELDS = {
    "source", "sink", "transform_sql", "output_mode", "trigger", "watermark",
    "checkpoint", "query_name", "timeout_s", "output", "type", "interval",
    "rows_per_second", "num_partitions",
    "kafka", "file", "delta", "iceberg", "rate", "eventhubs", "kinesis",
    "console", "cloud", "memory",
}


@settings(max_examples=150, deadline=None)
@given(
    mutation=st.sampled_from(STREAM_MUTATIONS),
    f=field_name.filter(lambda s: s not in _STREAM_FIELDS),
    v=junk,
)
def test_malformed_stream_blocks_fail_at_load(mutation, f, v):
    marker, build = mutation
    with pytest.raises(PipelineValidationError) as exc:
        ComponentConfig(name="s1", op="stream", params=build(f, v))
    msg = str(exc.value)
    assert marker.split(" ")[0] in msg
    assert "'s1'" in msg


def test_well_formed_blocks_still_load():
    """The dual invariant: fully-specified valid blocks construct."""
    cfg = PipelineConfig.from_dict(
        {
            "name": "ok",
            "hooks": {
                "logging": {"level": "DEBUG", "format": "json"},
                "metrics": {"backend": "in_memory", "export_interval_seconds": 5},
                "audit": {"retention_days": 30},
            },
            "components": [
                {
                    "name": "s",
                    "op": "stream",
                    "params": {
                        "source": {"type": "rate", "rows_per_second": 5},
                        "sink": {"type": "memory", "table_name": "t"},
                        "trigger": {"type": "processing_time", "interval": "1 second"},
                        "output_mode": "append",
                        "watermark": {"column": "timestamp", "delay": "10 seconds"},
                    },
                },
                {
                    "name": "t",
                    "op": "sql",
                    "params": {"sql": "SELECT 1"},
                    "depends_on": ["s"],
                    "retry": {"max_attempts": 2, "initial_delay_seconds": 0.1},
                    "circuit_breaker": {"failure_threshold": 3, "timeout_seconds": 5},
                },
            ],
        }
    )
    assert cfg.execution_order() == ["s", "t"]


# ---- r8 structural hardening (hoconfuzz findings): every shape a
# ---- mutated conf can take must yield the typed error, never a
# ---- dataclass TypeError / unhashable-type traceback

@pytest.mark.parametrize(
    "d, fragment",
    [
        ("notadict", "pipeline config root"),
        ({"name": "x", "components": "c1"}, "components must be list"),
        ({"name": "x", "components": [42]}, "components[0] must be dict"),
        ({"name": "x", "components": [{"op": "sql"}]}, "name must be non-empty"),
        ({"name": "x", "components": [{"name": "c", "op": "sql", "zz": 1}]},
         "unknown fields ['zz']"),
        # both spellings of the settings field present (r8 ADVICE):
        # must be the typed mutual-exclusion error, never a raw
        # ComponentConfig(**c) TypeError for the duplicate 'config' key
        ({"name": "x", "components": [
            {"name": "c", "op": "sql", "config": {}, "params": {}}]},
         "'config' and 'params' are mutually exclusive"),
        ({"name": "x", "components": [
            {"name": "c", "op": "sql", "depends_on": "other"}]},
         "depends_on must be a list of strings"),
        ({"name": "x", "components": [
            {"name": "c", "op": "sql", "inputs": [1]}]},
         "inputs must be a list of strings"),
        ({"name": "x", "components": [
            {"name": "c", "op": "sql", "enabled": "yes"}]},
         "enabled must be bool"),
        ({"name": 7, "components": []}, "pipeline name must be str"),
        ({"name": "x", "tags": [], "components": []}, "tags must be dict"),
        ({"name": "x", "spark": 3, "components": []}, "spark must be dict"),
    ],
)
def test_structural_mutations_fail_typed(d, fragment):
    with pytest.raises(PipelineValidationError) as exc:
        PipelineConfig.from_dict(d)
    assert fragment in str(exc.value)


@pytest.mark.parametrize(
    "params",
    [
        # unhashable type values (a list where a string belongs) used
        # to raise TypeError from the registry dict lookup / enum call
        {"source": {"type": ["file"]}, "sink": {"type": "console"}},
        {"source": {"type": "rate"}, "sink": {"type": "console"},
         "trigger": {"type": ["once"]}},
        {"source": {"type": "rate"}, "sink": {"type": "console"},
         "output_mode": ["append"]},
    ],
)
def test_unhashable_stream_type_values_fail_typed(params):
    with pytest.raises(PipelineValidationError):
        ComponentConfig(name="s1", op="stream", params=params)
