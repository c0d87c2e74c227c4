"""HTTP webhook sink: auth modes, gzip, batch splitting, payload caps.

Reference behavior (``ExportService.cs:106-129,199-331``):
- POST JSON; non-2xx → transient failure (→ retry → dead letter)
- auth: Bearer / Basic / API-key header (mutually exclusive)
- gzip Content-Encoding when enabled
- payloads of >max_records rows split into sequential batches with
  ``X-Batch-Number`` / ``X-Total-Batches`` headers
- post-compression payload over the cap → OversizePayloadError
  (dead-letter, never retried)

Transport is injectable so tests run without a network; the default
uses urllib against real endpoints. For cluster-scale fan-out this sink
is constructed inside ``foreachPartition`` with one session per
executor (SURVEY §4 "connection caching").
"""

from __future__ import annotations

import base64
import gzip as _gzip
import json

from trignis_spark.sinks.base import (
    ExportContext,
    OversizePayloadError,
    Sink,
    TransientSinkError,
    render_template,
)

HTTP_TIMEOUT_SECONDS = 30
COMPRESS_THRESHOLD_BYTES = 1024


def _default_transport(url: str, body: bytes, headers: dict[str, str]) -> int:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_SECONDS) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code
    except OSError as e:
        raise TransientSinkError(str(e)) from e


class HttpSink(Sink):
    def __init__(
        self,
        name: str,
        url: str,
        bearer_token: str | None = None,
        basic_user: str | None = None,
        basic_password: str | None = None,
        api_key: str | None = None,
        api_key_header: str = "X-Api-Key",
        oauth2_token_url: str | None = None,
        oauth2_client_id: str | None = None,
        oauth2_client_secret: str | None = None,
        oauth2_scope: str | None = None,
        oauth2_token_service=None,
        headers: dict[str, str] | None = None,
        gzip: bool = False,
        max_records_per_batch: int = 1000,
        max_payload_size_bytes: int = 5 * 1024 * 1024,
        transport=None,
    ):
        self.name = name
        self.url = url
        self.bearer_token = bearer_token
        self.basic_user = basic_user
        self.basic_password = basic_password
        self.api_key = api_key
        self.api_key_header = api_key_header
        self.oauth2_token_url = oauth2_token_url
        self.oauth2_client_id = oauth2_client_id
        self.oauth2_client_secret = oauth2_client_secret
        self.oauth2_scope = oauth2_scope
        self._oauth2 = oauth2_token_service
        self.extra_headers = headers or {}
        self.gzip = gzip
        self.max_records_per_batch = max_records_per_batch
        self.max_payload_size_bytes = max_payload_size_bytes
        self.transport = transport or _default_transport

    def _headers(self, ctx: ExportContext, batch: int, total: int,
                 compressed: bool = False) -> dict[str, str]:
        h = {"Content-Type": "application/json"}
        if self.oauth2_token_url:
            # OAuth2 client-credentials (cached, single-flight, expiry slack)
            if self._oauth2 is None:
                from trignis_spark.sinks.oauth2 import OAuth2TokenService

                self._oauth2 = OAuth2TokenService()
            token = self._oauth2.get_token(
                self.oauth2_token_url,
                self.oauth2_client_id or "",
                self.oauth2_client_secret or "",
                scope=self.oauth2_scope,
            )
            h["Authorization"] = f"Bearer {token}"
        elif self.bearer_token:
            h["Authorization"] = f"Bearer {self.bearer_token}"
        elif self.basic_user is not None:
            cred = f"{self.basic_user}:{self.basic_password or ''}"
            h["Authorization"] = "Basic " + base64.b64encode(cred.encode()).decode()
        elif self.api_key:
            h[self.api_key_header] = self.api_key
        if compressed:
            h["Content-Encoding"] = "gzip"
        if total > 1:
            h["X-Batch-Number"] = str(batch)
            h["X-Total-Batches"] = str(total)
        for k, v in self.extra_headers.items():
            h[k] = render_template(v, ctx)
        return h

    def _encode(self, doc: dict) -> tuple[bytes, bool]:
        """Returns (body, compressed) — small bodies skip compression and
        must NOT carry a gzip Content-Encoding header."""
        body = json.dumps(doc, separators=(",", ":")).encode("utf-8")
        compressed = False
        if self.gzip and len(body) > COMPRESS_THRESHOLD_BYTES:
            body = _gzip.compress(body, compresslevel=9)
            compressed = True
        if len(body) > self.max_payload_size_bytes:
            raise OversizePayloadError(
                f"payload {len(body)}B exceeds cap {self.max_payload_size_bytes}B"
            )
        return body, compressed

    def write(self, payload: str, ctx: ExportContext) -> None:
        doc = json.loads(payload)
        data = doc.get("Data") or []
        n = self.max_records_per_batch
        if len(data) > n:
            chunks = [data[i : i + n] for i in range(0, len(data), n)]
        else:
            chunks = [data]
        total = len(chunks)
        for i, chunk in enumerate(chunks, start=1):
            # per-chunk context so {batch}/{totalbatches}/{guid} templates
            # in the URL and headers reflect this chunk
            import dataclasses

            chunk_ctx = dataclasses.replace(ctx, batch=i, total_batches=total)
            url = render_template(self.url, chunk_ctx)
            batch_doc = {**doc, "Data": chunk}
            body, compressed = self._encode(batch_doc)
            status = self.transport(
                url, body, self._headers(chunk_ctx, i, total, compressed)
            )
            if not 200 <= status < 300:
                raise TransientSinkError(f"HTTP {status} from {url}")
