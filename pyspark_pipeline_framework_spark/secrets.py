"""Secrets: provider protocol, env-var provider, TTL cache, routing
resolver, and ``secret://PROVIDER/KEY`` config interpolation — behavior
parity with the reference subsystem (core/secrets/base.py:61-81,
providers.py:16-149, resolver.py:17-98, core/config/
secret_resolver.py:31-111). AWS Secrets Manager / Vault providers are
import-gated (their SDKs aren't bundled here). Secret VALUES never
reach logs or audit events — accesses are audited by provider/key name
with the value field redacted (core/secrets/audit.py:26-85)."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Protocol

SECRET_SCHEME = "secret://"


class SecretNotFoundError(KeyError):
    pass


class SecretsProvider(Protocol):
    name: str

    def get_secret(self, key: str) -> str: ...


class EnvSecretsProvider:
    name = "env"

    def __init__(self, prefix: str = ""):
        # reference SecretsConfig.secret_prefix (core/config/secrets.py:27):
        # every lookup key is namespaced, e.g. prefix PIPELINE_ + key
        # DB_PASSWORD → env var PIPELINE_DB_PASSWORD
        self.prefix = prefix

    def get_secret(self, key: str) -> str:
        value = os.environ.get(self.prefix + key)
        if value is None:
            raise SecretNotFoundError(f"env var {self.prefix + key!r} not set")
        return value


class AwsSecretsManagerProvider:
    """Import-gated: requires boto3 (not bundled in this container)."""

    name = "aws"

    def __init__(self, region: str = "us-east-1"):
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise ImportError("AwsSecretsManagerProvider requires boto3") from e
        import boto3 as _b

        self._client = _b.client("secretsmanager", region_name=region)

    def get_secret(self, key: str) -> str:
        resp = self._client.get_secret_value(SecretId=key)
        return resp["SecretString"]


class VaultKv2Provider:
    """Import-gated: requires hvac (not bundled in this container)."""

    name = "vault"

    def __init__(self, url: str, token: str, mount: str = "secret"):
        try:
            import hvac  # noqa: F401
        except ImportError as e:
            raise ImportError("VaultKv2Provider requires hvac") from e
        import hvac as _h

        self._client = _h.Client(url=url, token=token)
        self._mount = mount

    def get_secret(self, key: str) -> str:
        path, _, field = key.partition("#")
        data = self._client.secrets.kv.v2.read_secret_version(path=path, mount_point=self._mount)
        return data["data"]["data"][field or "value"]


@dataclass
class _Cached:
    value: str
    expires_at: float


class SecretsResolver:
    """Routes ``provider/key`` to the registered provider, with a TTL
    cache and an access log of KEY NAMES only (never values).

    ``audit_sink`` (any ``observability.audit.AuditSink``) receives one
    ``secret_access`` event per resolve — cache hits included, values
    always redacted — matching the reference's audited access trail
    (core/secrets/audit.py:26-85)."""

    def __init__(self, providers: list[SecretsProvider] | None = None, ttl_s: float = 300.0,
                 clock: Callable[[], float] = time.monotonic, audit_sink=None):
        self._providers = {p.name: p for p in (providers or [EnvSecretsProvider()])}
        self._ttl = ttl_s
        self._clock = clock
        self._lock = threading.Lock()
        self._cache: dict[str, _Cached] = {}
        self.access_log: list[tuple[str, str]] = []  # (provider, key)
        self.audit_sink = audit_sink

    def register(self, provider: SecretsProvider) -> None:
        self._providers[provider.name] = provider

    def _audit(self, provider: str, key: str, status: str, cached: bool) -> None:
        if self.audit_sink is None:
            return
        from pyspark_pipeline_framework_spark.observability.audit import (
            REDACTED,
            AuditEvent,
        )

        try:
            self.audit_sink.emit(
                AuditEvent(
                    action="secret_access",
                    resource=f"{provider}/{key}",
                    status=status,
                    actor="secrets-resolver",
                    detail={"cached": cached, "value": REDACTED},
                )
            )
        except Exception:  # noqa: BLE001 — observers never fail resolution
            import logging

            logging.getLogger(__name__).exception("secret audit sink raised")

    def resolve(self, ref: str) -> str:
        provider_name, _, key = ref.partition("/")
        if not provider_name or not key:
            raise ValueError(f"secret ref must be PROVIDER/KEY, got {ref!r}")
        if provider_name not in self._providers:
            self._audit(provider_name, key, "unknown_provider", cached=False)
            raise SecretNotFoundError(f"unknown secrets provider {provider_name!r}")
        cache_key = f"{provider_name}/{key}"
        with self._lock:
            hit = self._cache.get(cache_key)
            if hit and hit.expires_at > self._clock():
                self._audit(provider_name, key, "ok", cached=True)
                return hit.value
        try:
            value = self._providers[provider_name].get_secret(key)
        except Exception:
            self._audit(provider_name, key, "not_found", cached=False)
            raise
        with self._lock:
            self._cache[cache_key] = _Cached(value, self._clock() + self._ttl)
            self.access_log.append((provider_name, key))
        self._audit(provider_name, key, "ok", cached=False)
        return value

    def interpolate(self, config: Any) -> Any:
        """Recursively replace ``secret://PROVIDER/KEY`` strings in a
        config tree (reference core/config/secret_resolver.py:31-111)."""
        if isinstance(config, str):
            if config.startswith(SECRET_SCHEME):
                return self.resolve(config[len(SECRET_SCHEME):])
            return config
        if isinstance(config, dict):
            return {k: self.interpolate(v) for k, v in config.items()}
        if isinstance(config, list):
            return [self.interpolate(v) for v in config]
        return config
