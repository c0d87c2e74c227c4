"""OAuth2 client-credentials token service for HTTP sinks.

Reference semantics (``Source/Services/OAuth2TokenService.cs:27-98``):
- tokens cached per endpoint key for the configured lifetime, else the
  server's ``expires_in``, else 1 hour;
- a 60-second expiry slack so tokens refresh *before* they die mid-post;
- single-flight refresh per key — concurrent callers share one request;
- RFC 6749 snake_case response binding (``access_token``,
  ``expires_in``, ``token_type``).

Transport is injectable (tests run without a network); the default posts
a form-encoded client_credentials grant with urllib.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from dataclasses import dataclass, field

DEFAULT_LIFETIME_S = 3600
EXPIRY_SLACK_S = 60


def _default_transport(token_url: str, form: dict[str, str]) -> dict:
    import urllib.request

    body = urllib.parse.urlencode(form).encode("ascii")
    req = urllib.request.Request(
        token_url,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class _CachedToken:
    token: str
    expires_at: float


@dataclass
class OAuth2TokenService:
    clock: object = time.monotonic
    transport: object = _default_transport
    _cache: dict[str, _CachedToken] = field(default_factory=dict)
    _locks: dict[str, threading.Lock] = field(default_factory=dict)
    _global: threading.Lock = field(default_factory=threading.Lock)
    requests_made: int = 0

    def _lock_for(self, key: str) -> threading.Lock:
        with self._global:
            return self._locks.setdefault(key, threading.Lock())

    def get_token(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        scope: str | None = None,
        lifetime_seconds: int | None = None,
    ) -> str:
        key = f"{token_url}|{client_id}|{scope or ''}"
        now = self.clock()
        cached = self._cache.get(key)
        if cached is not None and now < cached.expires_at - EXPIRY_SLACK_S:
            return cached.token
        # single-flight: one refresh per key, concurrent callers wait
        with self._lock_for(key):
            cached = self._cache.get(key)
            now = self.clock()
            if cached is not None and now < cached.expires_at - EXPIRY_SLACK_S:
                return cached.token
            form = {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
            }
            if scope:
                form["scope"] = scope
            resp = self.transport(token_url, form)
            self.requests_made += 1
            token = resp["access_token"]  # RFC 6749 snake_case
            ttl = (
                lifetime_seconds
                if lifetime_seconds is not None
                else int(resp.get("expires_in", DEFAULT_LIFETIME_S))
            )
            self._cache[key] = _CachedToken(token, self.clock() + ttl)
            return token
