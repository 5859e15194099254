"""Structured span telemetry — the reference's tracing layer, re-expressed.

The reference initializes a tracing subscriber and wraps every task run in
a span (/root/reference/src/utils/telemetry.rs, used by
dag_schedule/schedule.rs's instrumented task execution). RoundMetrics
carries the *data*; this module carries the *trace*: an append-only JSONL
event log (one object per line — start/end spans with wall durations and
counter payloads) that survives next to the crawl checkpoint, so a
post-mortem can reconstruct what ran when without Spark event logs.

JSONL rather than OTel wire format: the sandbox has no collector, and the
schema (ts, kind, name, span fields) maps 1:1 onto OTel spans if an
exporter is bolted on in production.
"""

from __future__ import annotations

import json
import os
import threading
import time


class EventLog:
    """Append-only JSONL event sink; thread-safe (TaskGraph branches and
    crawl rounds may emit concurrently)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, kind: str, name: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "kind": kind, "name": name}
        rec.update(fields)
        line = json.dumps(rec, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")

    def span(self, kind: str, name: str, **fields) -> "_Span":
        return _Span(self, kind, name, fields)

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


class _Span:
    """Context manager emitting <kind>_start / <kind>_end (+duration_sec);
    an exception emits <kind>_failed with the error and re-raises."""

    def __init__(self, log: EventLog, kind: str, name: str, fields: dict):
        self.log, self.kind, self.name, self.fields = log, kind, name, fields

    def __enter__(self) -> "_Span":
        self.t0 = time.monotonic()
        self.log.emit(f"{self.kind}_start", self.name, **self.fields)
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        dur = round(time.monotonic() - self.t0, 3)
        if exc_type is None:
            self.log.emit(
                f"{self.kind}_end", self.name, duration_sec=dur, **self.fields
            )
        else:
            self.log.emit(
                f"{self.kind}_failed", self.name, duration_sec=dur,
                error=f"{exc_type.__name__}: {exc}", **self.fields,
            )
        return False
