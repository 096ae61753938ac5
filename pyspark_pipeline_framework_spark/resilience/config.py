"""Config-dict → resilience-object resolution.

Parity with the reference's per-component resilience surface
(core/config/component.py:32-64, core/config/retry.py:7-109): a
component may declare ``retry`` and/or ``circuit_breaker`` blocks, OR a
bundled ``resilience`` policy (preset name or ``{retry, circuit_breaker}``
dict) — ``resilience`` is mutually exclusive with the individual fields
and, when set, populates both. This module turns those plain config
dicts (the shape JSON/HOCON pipelines produce) into the runtime
``RetryPolicy`` / ``CircuitBreaker`` objects.

Field-name compatibility: both this repo's names (``initial_delay_s``,
``multiplier``, ``timeout_s``) and the reference's config spellings
(``initial_delay_seconds``, ``backoff_multiplier``,
``timeout_seconds``, ``retry_on_exceptions``) are accepted, so a
reference ``.conf`` tree ports without edits.
"""

from __future__ import annotations

import builtins
import importlib
from dataclasses import dataclass
from typing import Any, Callable

from pyspark_pipeline_framework_spark.resilience.circuit_breaker import CircuitBreaker
from pyspark_pipeline_framework_spark.resilience.presets import (
    AGGRESSIVE,
    CONSERVATIVE,
    DEFAULT,
    NO_RETRY,
    ResiliencePolicy,
)
from pyspark_pipeline_framework_spark.resilience.retry import RetryPolicy

PRESETS: dict[str, ResiliencePolicy] = {
    "no_retry": NO_RETRY,
    "default": DEFAULT,
    "aggressive": AGGRESSIVE,
    "conservative": CONSERVATIVE,
}

# reference config name → this repo's RetryPolicy field
_RETRY_ALIASES = {
    "initial_delay_seconds": "initial_delay_s",
    "max_delay_seconds": "max_delay_s",
    "backoff_multiplier": "multiplier",
    "retry_on_exceptions": "retry_on",
}
_CB_ALIASES = {"timeout_seconds": "timeout_s"}


class ResilienceConfigError(ValueError):
    pass


def _resolve_exception(name: str) -> type[BaseException]:
    """Resolve an exception by bare builtin name or dotted path
    (reference retry_on_exceptions is a list of class-name strings)."""
    if not isinstance(name, str):
        raise ResilienceConfigError(
            f"retry_on entries must be exception-name strings, got {type(name).__name__}"
        )
    if "." in name:
        mod, _, attr = name.rpartition(".")
        try:
            cls = getattr(importlib.import_module(mod), attr)
        except (ImportError, AttributeError) as exc:
            raise ResilienceConfigError(
                f"retry_on: cannot resolve exception {name!r}: {exc}"
            ) from exc
    else:
        cls = getattr(builtins, name, None)
    if not (isinstance(cls, type) and issubclass(cls, BaseException)):
        raise ResilienceConfigError(f"retry_on: {name!r} is not an exception type")
    return cls


def _normalize(d: dict[str, Any], aliases: dict[str, str], allowed: set[str], what: str) -> dict[str, Any]:
    if not isinstance(d, dict):
        raise ResilienceConfigError(
            f"{what} block must be a dict, got {type(d).__name__}"
        )
    out: dict[str, Any] = {}
    for k, v in d.items():
        k = aliases.get(k, k)
        if k not in allowed:
            raise ResilienceConfigError(f"unknown {what} field {k!r} (allowed: {sorted(allowed)})")
        out[k] = v
    return out


def _check_number(kw: dict[str, Any], fields: tuple[str, ...], what: str) -> None:
    for f in fields:
        v = kw.get(f)
        if v is not None and (isinstance(v, bool) or not isinstance(v, (int, float))):
            raise ResilienceConfigError(
                f"{what} field {f!r} must be a number, got {type(v).__name__}"
            )


def retry_policy_from_dict(d: dict[str, Any]) -> RetryPolicy:
    kw = _normalize(
        d,
        _RETRY_ALIASES,
        {"max_attempts", "initial_delay_s", "multiplier", "max_delay_s", "jitter", "retry_on"},
        "retry",
    )
    _check_number(kw, ("max_attempts", "initial_delay_s", "multiplier", "max_delay_s", "jitter"), "retry")
    if "retry_on" in kw:
        if not isinstance(kw["retry_on"], (list, tuple)):
            raise ResilienceConfigError("retry field 'retry_on' must be a list of exception names")
        kw["retry_on"] = tuple(_resolve_exception(n) for n in kw["retry_on"])
    try:
        return RetryPolicy(**kw)
    except ValueError as exc:
        raise ResilienceConfigError(f"retry: {exc}") from exc


@dataclass(frozen=True)
class CircuitBreakerSpec:
    """Validated breaker parameters; instantiated per component so each
    component tracks its own failure state."""

    failure_threshold: int = 5
    success_threshold: int = 2
    timeout_s: float = 30.0
    half_open_max_calls: int = 1

    def build(self, name: str, clock: Callable[[], float]) -> CircuitBreaker:
        return CircuitBreaker(
            failure_threshold=self.failure_threshold,
            success_threshold=self.success_threshold,
            timeout_s=self.timeout_s,
            half_open_max_calls=self.half_open_max_calls,
            clock=clock,
            name=name,
        )


def circuit_breaker_spec_from_dict(d: dict[str, Any]) -> CircuitBreakerSpec:
    kw = _normalize(
        d,
        _CB_ALIASES,
        {"failure_threshold", "success_threshold", "timeout_s", "half_open_max_calls"},
        "circuit_breaker",
    )
    _check_number(
        kw, ("failure_threshold", "success_threshold", "timeout_s", "half_open_max_calls"),
        "circuit_breaker",
    )
    spec = CircuitBreakerSpec(**kw)
    if spec.failure_threshold < 1 or spec.success_threshold < 1 or spec.half_open_max_calls < 1:
        raise ResilienceConfigError("circuit_breaker thresholds must be >= 1")
    if spec.timeout_s <= 0:
        raise ResilienceConfigError("circuit_breaker timeout_s must be positive")
    return spec


@dataclass(frozen=True)
class ComponentResilience:
    """Per-component override resolved from config. ``None`` fields mean
    'inherit the runner-wide policy'."""

    retry: RetryPolicy | None = None
    circuit_breaker: CircuitBreakerSpec | None = None


def resolve_component_resilience(
    retry: dict[str, Any] | None,
    circuit_breaker: dict[str, Any] | None,
    resilience: str | dict[str, Any] | None,
) -> ComponentResilience | None:
    """Apply the reference's mutual-exclusion rule
    (core/config/component.py:59-64): ``resilience`` may not be combined
    with individual ``retry``/``circuit_breaker``; when set it populates
    both. Returns ``None`` when nothing is declared (inherit)."""
    if resilience is not None:
        if retry is not None or circuit_breaker is not None:
            raise ResilienceConfigError(
                "cannot set both 'resilience' and individual 'retry'/'circuit_breaker' fields"
            )
        if isinstance(resilience, str):
            try:
                preset = PRESETS[resilience]
            except KeyError:
                raise ResilienceConfigError(
                    f"unknown resilience preset {resilience!r} (known: {sorted(PRESETS)})"
                ) from None
            cb = (
                CircuitBreakerSpec(
                    failure_threshold=preset.failure_threshold,
                    timeout_s=preset.cb_timeout_s,
                )
                if preset.circuit_breaker_enabled
                else None
            )
            return ComponentResilience(retry=preset.retry, circuit_breaker=cb)
        if isinstance(resilience, dict):
            extra = set(resilience) - {"retry", "circuit_breaker"}
            if extra:
                raise ResilienceConfigError(
                    f"unknown resilience fields {sorted(extra)} (allowed: retry, circuit_breaker)"
                )
            return ComponentResilience(
                retry=retry_policy_from_dict(resilience["retry"]) if resilience.get("retry") else None,
                circuit_breaker=(
                    circuit_breaker_spec_from_dict(resilience["circuit_breaker"])
                    if resilience.get("circuit_breaker")
                    else None
                ),
            )
        raise ResilienceConfigError(
            f"resilience must be a preset name or dict, got {type(resilience).__name__}"
        )
    if retry is None and circuit_breaker is None:
        return None
    return ComponentResilience(
        retry=retry_policy_from_dict(retry) if retry is not None else None,
        circuit_breaker=circuit_breaker_spec_from_dict(circuit_breaker) if circuit_breaker is not None else None,
    )
