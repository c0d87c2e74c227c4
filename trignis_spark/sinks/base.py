"""Sink protocol + the operational policies around every sink write.

- ``render_template``: placeholder substitution for paths/URLs/headers
  (reference ``ExportService.cs:159-165,263-284`` — ``{timestamp}``,
  ``{object}``, ``{database}``, ``{environment}``, ``{key}``,
  ``{guid}``, ``{batch}``, ``{totalbatches}``).
- ``RetryPolicy``: fixed-delay transient retry (3×5s default), applied
  around source reads and each sink write, only for transient error
  types (``RetryPolicies.cs:33-44``).
- ``CircuitBreaker``: per-endpoint, opens after 3 consecutive failures
  for 60s (``MessageQueueService.cs:111-130``).
- ``OversizePayloadError``: payloads over the sink cap dead-letter but
  are never retried (``ExportService.cs:316-321``).

These live driver-side (or once per executor inside foreachPartition);
they are deterministic pure-Python policies, unit-tested like the
reference's policy tests.
"""

from __future__ import annotations

import datetime as dt
import time
import uuid
from dataclasses import dataclass, field


class SinkError(Exception):
    """Base class for sink write failures (retryable by default)."""

    retryable = True


class TransientSinkError(SinkError):
    """Network-ish failure: retry then dead-letter."""


class OversizePayloadError(SinkError):
    """Payload exceeds the sink cap: dead-letter immediately, never retry."""

    retryable = False


class CircuitOpenError(SinkError):
    """Breaker open: fail fast without touching the endpoint."""


@dataclass
class SinkFailure:
    sink_name: str
    error: str
    retryable: bool


@dataclass
class ExportContext:
    environment: str = ""
    database: str = ""
    object_name: str = ""
    key: str = ""
    batch: int = 1
    total_batches: int = 1
    now: dt.datetime | None = None


def render_template(template: str, ctx: ExportContext) -> str:
    now = ctx.now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    return (
        template.replace("{timestamp}", now.strftime("%Y%m%d%H%M%S"))
        .replace("{object}", ctx.object_name)
        .replace("{database}", ctx.database)
        .replace("{environment}", ctx.environment)
        .replace("{key}", ctx.key)
        .replace("{guid}", str(uuid.uuid4()))
        .replace("{batch}", str(ctx.batch))
        .replace("{totalbatches}", str(ctx.total_batches))
    )


class Sink:
    """A destination for one exported change-batch payload."""

    name: str

    def write(self, payload: str, ctx: ExportContext) -> None:  # pragma: no cover
        raise NotImplementedError


@dataclass
class RetryPolicy:
    attempts: int = 3
    delay_seconds: float = 5.0
    #: exception types considered transient (reference retries only
    #: HttpRequestException/IOException/DbException)
    transient: tuple[type[BaseException], ...] = (TransientSinkError, IOError)
    sleep: object = time.sleep  # injectable for tests

    def run(self, fn, *args, **kwargs):
        last: BaseException | None = None
        attempts = max(1, self.attempts)  # 0/negative config means "try once"
        for i in range(attempts):
            try:
                return fn(*args, **kwargs)
            except self.transient as e:  # type: ignore[misc]
                last = e
                if i < attempts - 1:
                    self.sleep(self.delay_seconds)
        raise last  # type: ignore[misc]


@dataclass
class CircuitBreaker:
    threshold: int = 3
    open_seconds: float = 60.0
    clock: object = time.monotonic  # injectable for tests
    _failures: int = field(default=0, init=False)
    _opened_at: float | None = field(default=None, init=False)

    @property
    def is_open(self) -> bool:
        if self._opened_at is None:
            return False
        if self.clock() - self._opened_at >= self.open_seconds:
            # half-open: allow the next attempt through
            return False
        return True

    def run(self, fn, *args, **kwargs):
        if self.is_open:
            raise CircuitOpenError("circuit open")
        try:
            result = fn(*args, **kwargs)
        except Exception:
            self._failures += 1
            if self._failures >= self.threshold:
                self._opened_at = self.clock()
            raise
        self._failures = 0
        self._opened_at = None
        return result
