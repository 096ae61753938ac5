"""Streaming observability.

The reference defines a 3-method ``StreamingHooks`` protocol called
manually around the query lifecycle (runtime/streaming/hooks.py:13-175);
the idiomatic Spark mapping (SURVEY.md §2.6) is a
``StreamingQueryListener`` registered on the session — progress events
then flow for EVERY query with no per-pipeline wiring. Both surfaces
are provided: the protocol (with NoOp/Logging/Composite impls) and
``attach_listener`` bridging it onto Spark's listener bus."""

from __future__ import annotations

import logging
from typing import Protocol

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


class StreamingHooks(Protocol):
    def on_query_start(self, query_id: str, name: str) -> None: ...
    def on_batch_progress(self, query_id: str, batch_id: int, num_rows: int, duration_ms: int) -> None: ...
    def on_query_terminated(self, query_id: str, exception: str | None) -> None: ...


class NoOpStreamingHooks:
    def on_query_start(self, query_id, name): pass
    def on_batch_progress(self, query_id, batch_id, num_rows, duration_ms): pass
    def on_query_terminated(self, query_id, exception): pass


class LoggingStreamingHooks(NoOpStreamingHooks):
    def on_query_start(self, query_id, name):
        log.info("stream %s (%s): started", name or "?", query_id)

    def on_batch_progress(self, query_id, batch_id, num_rows, duration_ms):
        log.info("stream %s: batch %d, %d rows in %dms", query_id, batch_id, num_rows, duration_ms)

    def on_query_terminated(self, query_id, exception):
        if exception:
            log.error("stream %s terminated with error: %s", query_id, exception)
        else:
            log.info("stream %s terminated", query_id)


class CompositeStreamingHooks(NoOpStreamingHooks):
    def __init__(self, *hooks: StreamingHooks):
        self.hooks = list(hooks)

    def _fan(self, method: str, *args) -> None:
        for h in self.hooks:
            try:
                getattr(h, method)(*args)
            except Exception as exc:  # noqa: BLE001
                log.error("streaming hook %s.%s raised: %s", type(h).__name__, method, exc)

    def on_query_start(self, *a): self._fan("on_query_start", *a)
    def on_batch_progress(self, *a): self._fan("on_batch_progress", *a)
    def on_query_terminated(self, *a): self._fan("on_query_terminated", *a)


class _HooksListener(StreamingQueryListener):
    def __init__(self, hooks: StreamingHooks):
        self.hooks = hooks

    def onQueryStarted(self, event) -> None:
        try:
            self.hooks.on_query_start(str(event.id), event.name or "")
        except Exception as exc:  # noqa: BLE001
            log.error("on_query_start raised: %s", exc)

    def onQueryProgress(self, event) -> None:
        try:
            p = event.progress
            self.hooks.on_batch_progress(
                str(p.id), p.batchId, p.numInputRows,
                int(p.durationMs.get("triggerExecution", 0)),
            )
        except Exception as exc:  # noqa: BLE001
            log.error("on_batch_progress raised: %s", exc)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        try:
            self.hooks.on_query_terminated(str(event.id), event.exception)
        except Exception as exc:  # noqa: BLE001
            log.error("on_query_terminated raised: %s", exc)


def attach_listener(spark: SparkSession, hooks: StreamingHooks) -> StreamingQueryListener:
    """Register hooks on the session's listener bus; returns the
    listener (pass to ``spark.streams.removeListener`` to detach)."""
    listener = _HooksListener(hooks)
    spark.streams.addListener(listener)
    return listener
