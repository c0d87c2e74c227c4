"""In-memory sink with scriptable failure injection (test double).

Plays the role the reference's mocked endpoints play in its service
tests: capture every delivered payload, optionally fail the first N
writes or fail permanently.
"""

from __future__ import annotations

from trignis_spark.sinks.base import ExportContext, Sink, TransientSinkError


class MemorySink(Sink):
    def __init__(self, name: str, fail_times: int = 0, always_fail: bool = False):
        self.name = name
        self.fail_times = fail_times
        self.always_fail = always_fail
        self.payloads: list[tuple[str, ExportContext]] = []
        self.attempts = 0

    def write(self, payload: str, ctx: ExportContext) -> None:
        self.attempts += 1
        if self.always_fail:
            raise TransientSinkError(f"{self.name}: injected permanent failure")
        if self.fail_times > 0:
            self.fail_times -= 1
            raise TransientSinkError(f"{self.name}: injected failure")
        self.payloads.append((payload, ctx))
