"""Web-UI session auth: cookie sessions, one-time CSRF, lockout.

Re-expresses the reference's login machinery (``Source/Program.cs:
254-374`` + its WebUiAuth service) for the Flask control plane:

- **Session tokens** — HMAC-signed ``<expiry>.<sig>`` strings under a
  per-process random secret; a restart invalidates every session (the
  reference regenerates its signing material the same way). Validation
  is signature-then-expiry, constant-time on the signature.
- **One-time CSRF tokens** — the login form must first fetch a token
  (``GET /ui/api/auth/csrf``) and echo it in the login POST; tokens are
  single-use with a short TTL, so a login POST can never be replayed.
- **Double-submit CSRF** — after login a *readable* csrf cookie is set
  alongside the httpOnly session cookie; mutating UI fetches echo it in
  ``X-CSRF-Token`` and the server just compares header to cookie (no
  server-side state, same scheme as ``WebUiAuth.IsDoubleSubmitValid``).
- **Lockout** — repeated failed logins from one address block further
  attempts for a cooldown window (429), mirroring ``CheckAccess`` /
  ``RecordFailedAttempt``.

Pure Python, no Flask dependency — unit-testable like the reference's
backoff math; ``api.create_app`` wires it to routes.
"""

from __future__ import annotations

import hmac
import secrets
import time


class WebUiAuth:
    """One instance per app; holds the signing secret and attempt state."""

    def __init__(
        self,
        token_ttl_hours: float = 8.0,
        csrf_ttl_seconds: float = 600.0,
        max_failures: int = 5,
        lockout_seconds: float = 600.0,
        clock=time.time,
    ):
        self._secret = secrets.token_bytes(32)
        self._token_ttl = token_ttl_hours * 3600.0
        self._csrf_ttl = csrf_ttl_seconds
        self._max_failures = max_failures
        self._lockout = lockout_seconds
        self._clock = clock
        self._csrf: dict[str, float] = {}  # token -> expiry
        self._failures: dict[str, list[float]] = {}  # ip -> failure times

    # -- session cookie ----------------------------------------------------

    def _sign(self, msg: str) -> str:
        return hmac.new(self._secret, msg.encode("utf-8"), "sha256").hexdigest()

    def issue_session(self) -> str:
        exp = int(self._clock() + self._token_ttl)
        return f"{exp}.{self._sign(str(exp))}"

    def validate_session(self, token: str | None) -> bool:
        if not token or "." not in token:
            return False
        exp_s, sig = token.split(".", 1)
        if not hmac.compare_digest(sig, self._sign(exp_s)):
            return False
        try:
            return self._clock() < int(exp_s)
        except ValueError:
            return False

    # -- one-time login CSRF ----------------------------------------------

    def generate_csrf(self) -> str:
        now = self._clock()
        # opportunistic sweep so abandoned forms don't grow the dict
        self._csrf = {t: e for t, e in self._csrf.items() if e > now}
        token = secrets.token_urlsafe(24)
        self._csrf[token] = now + self._csrf_ttl
        return token

    def validate_csrf(self, token: str | None) -> bool:
        return bool(token) and self._csrf.get(token, 0) > self._clock()

    def consume_csrf(self, token: str) -> None:
        self._csrf.pop(token, None)

    # -- double-submit (post-login mutations) ------------------------------

    @staticmethod
    def new_session_csrf() -> str:
        return secrets.token_urlsafe(24)

    @staticmethod
    def double_submit_ok(header: str | None, cookie: str | None) -> bool:
        if not header or not cookie:
            return False
        return hmac.compare_digest(header, cookie)

    # -- lockout -----------------------------------------------------------

    def check_access(self, ip: str) -> str | None:
        """None = allowed; otherwise the human-readable block reason."""
        now = self._clock()
        recent = [t for t in self._failures.get(ip, []) if now - t < self._lockout]
        self._failures[ip] = recent
        if len(recent) >= self._max_failures:
            wait = int(self._lockout - (now - recent[0]))
            return f"Too many failed attempts; retry in {max(wait, 1)}s"
        return None

    def record_failed_attempt(self, ip: str) -> None:
        self._failures.setdefault(ip, []).append(self._clock())

    def clear_failed_attempts(self, ip: str) -> None:
        self._failures.pop(ip, None)
