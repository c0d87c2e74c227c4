"""HTTP API over the control plane — the reference's operational UX.

Thin Flask app binding the already-tested services to the reference's
routes (``Source/Program.cs``):

- ``GET  /health``                        — cached snapshot (:871-875)
- ``GET  /health/deadletters``            — DLQ stats (:877-881)
- ``GET  /health/connections``            — probe status (:883-898)
- ``GET  /health/state[/<env>]``          — watermarks joined to config
  (:900-983; the J5 state↔config lookup)
- ``GET  /ui/api/deadletters``            — paginated newest-first with
  search/object filters (:680-751; W3 pagination semantics)
- ``POST /ui/api/state/<env>/<obj>/reset``— delete the watermark row;
  next cycle re-initializes per InitialSyncMode (:403-432, T13)
- ``POST /ui/api/deadletters/<id>/replay``— manual replay; removed only
  when every destination succeeds; a failed manual replay resets the
  attempt counter to rejoin automatic rotation (:436-474)
- ``POST /ui/api/deadletters/<id>/discard`` (:476-487)
- ``POST /ui/api/deadletters/purge``      — purges exactly what the
  current filter selects (:489-498)
- ``POST /ui/api/pause`` / ``/ui/api/resume`` / ``GET /ui/api/pauses``
  — pause is passphrase-guarded (its failure mode is silent); resume
  never is ("making operators re-authenticate to restore service is
  how an incident gets longer", :501-553)
- ``GET /ui/login`` + ``GET /ui/api/auth/csrf`` + ``POST /ui/api/auth``
  / ``logout`` — cookie-session login over the UI when a passphrase is
  configured (:254-374): one-time CSRF token echoed by the form,
  httpOnly session cookie + readable csrf cookie, per-address lockout,
  double-submit check on mutating UI calls
- ``GET /ui/api/settings``          — global/server/logging settings
  with secrets recursively redacted (:659-678 omits Token/Password/
  ApiKey; same redaction list as the destinations payload)

Auth parity: the admin passphrase is compared as SHA-256 digests in
constant time (``Program.cs:369-374``); session/CSRF machinery lives in
``webauth.WebUiAuth``. With no passphrase configured the UI is open and
every auth check is skipped, exactly like the reference's
``authEnabled`` switch.

Flask ships in this environment but is import-guarded anyway — the
module stays importable (and the engine fully functional) without it.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import hmac
import logging
import math

try:
    from flask import Flask, jsonify, request
except ImportError:  # pragma: no cover - flask is present in CI
    Flask = None

from trignis_spark.deadletter import DeadLetterStore
from trignis_spark.state import PauseStore, StateStore, env_scope, obj_scope

log = logging.getLogger("trignis_spark.api")


def _ts(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    return str(v)


def passphrase_ok(given: str | None, expected_sha256_hex: str | None) -> bool:
    """Constant-time SHA-256 compare (``Program.cs:369-374``)."""
    if expected_sha256_hex is None:
        return True  # no passphrase configured
    if not given:
        return False
    digest = hashlib.sha256(given.encode("utf-8")).hexdigest()
    return hmac.compare_digest(digest, expected_sha256_hex.lower())


def resolve_scope(body: dict) -> tuple[str, str] | None:
    """Shared by pause and resume so the two can never disagree on what
    a scope string means (``Program.cs:545-553``)."""
    env = (body.get("environment") or "").strip()
    if not env:
        return None
    obj = (body.get("object") or "").strip()
    if obj:
        return obj_scope(env, obj), f"{env}/{obj}"
    return env_scope(env), env


#: destination option keys never echoed back by the API (the reference
#: omits Token/Password/ApiKey/ClientSecret/keys, Program.cs:628-654)
_REDACTED_OPTION_KEYS = frozenset(
    {
        "password", "basic_password", "bearer_token", "api_key",
        "oauth2_client_secret", "connection_string", "sasl_password",
        "access_key", "secret_key", "send",
    }
)

def redact_settings(value):
    """Recursively drop secret-bearing keys from a settings payload
    (the reference's settings endpoint omits Token/Password/ApiKey/
    ClientSecret/keys, ``Program.cs:628-678``)."""
    if isinstance(value, dict):
        return {
            k: redact_settings(v)
            for k, v in value.items()
            if k.lower() not in _REDACTED_OPTION_KEYS
            and "passphrase" not in k.lower()
        }
    if isinstance(value, (list, tuple)):
        return [redact_settings(v) for v in value]
    return value


_LOG_LINE_RE = None  # compiled lazily in create_app


def parse_log_entries(text: str) -> list[dict]:
    """Parse a log file into entries, folding continuation lines into
    the previous entry (``Program.cs:769-808``). Expected line shape:
    ``YYYY-mm-dd HH:MM:SS[.fff] [LVL] message``."""
    import re

    pat = re.compile(
        r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:[.,]\d{3})?) "
        r"\[?(\w{3,5})\]? (.*)$"
    )
    entries: list[dict] = []
    cur: dict | None = None
    for raw in text.split("\n"):
        m = pat.match(raw)
        if m:
            if cur is not None:
                entries.append(cur)
            cur = {
                "timestamp": m.group(1),
                "level": m.group(2).upper(),
                "message": m.group(3),
            }
        elif cur is not None and raw.strip():
            cur["message"] += "\n" + raw.rstrip()
    if cur is not None:
        entries.append(cur)
    return entries


def create_app(
    state: StateStore,
    dlq: DeadLetterStore,
    pauses: PauseStore,
    replayer=None,  # DeadLetterReplayer | None
    health_service=None,  # HealthService | None
    dlq_monitor=None,  # DeadLetterMonitor | None
    connections=None,  # ConnectionHealth | None
    environments=None,  # dict[str, EnvironmentConfig] | () -> dict
    admin_passphrase_sha256: str | None = None,
    log_dir: str | None = None,
    version: str = "0.2.0",
    settings: dict | None = None,  # /ui/api/settings payload (pre-redaction)
    web_auth=None,  # webauth.WebUiAuth | None (default-built when auth is on)
    ui_login: bool = False,  # ≙ WebHost:Enabled — gate /ui behind login
    ingest_health_root: str | None = None,  # persisted gate-health dir
):
    """Build the Flask app over the control-plane services."""
    if Flask is None:  # pragma: no cover
        raise RuntimeError("flask is not installed; the HTTP API is unavailable")
    app = Flask("trignis_spark")

    # the reference's switch (Program.cs:204): the login gate needs BOTH
    # the web host opt-in and a configured key; the pause step-up below
    # only needs the key
    auth_enabled = ui_login and admin_passphrase_sha256 is not None
    if auth_enabled and web_auth is None:
        from trignis_spark.webauth import WebUiAuth

        web_auth = WebUiAuth()

    AUTH_COOKIE = "trignis_session"
    CSRF_COOKIE = "trignis_csrf"
    #: paths reachable without a session (the login flow itself)
    _AUTH_EXEMPT = ("/ui/login", "/ui/api/auth")

    @app.before_request
    def _ui_auth_gate():
        """Session gate over /ui/* (``Program.cs:254-267``): views
        redirect to the login page, API paths get 401 JSON. /health/*
        stays open — it is the machine surface."""
        if not auth_enabled:
            return None
        p = request.path
        if not p.startswith("/ui") or any(
            p == e or p.startswith(e + "/") for e in _AUTH_EXEMPT
        ):
            return None
        if web_auth.validate_session(request.cookies.get(AUTH_COOKIE)):
            # double-submit gate for every mutating UI endpoint
            # (``RejectIfCsrfInvalid``, Program.cs:356-368)
            if request.method in ("POST", "PUT", "DELETE"):
                if not web_auth.double_submit_ok(
                    request.headers.get("X-CSRF-Token"),
                    request.cookies.get(CSRF_COOKIE),
                ):
                    return (
                        jsonify({"error": "Missing or invalid CSRF token"}),
                        403,
                    )
            return None
        if p.startswith("/ui/api/"):
            return jsonify({"error": "Authentication required"}), 401
        from flask import redirect

        return redirect("/ui/login")

    # -- login flow (Program.cs:301-353) -----------------------------------

    @app.get("/ui/login")
    def ui_login():
        from flask import redirect

        from trignis_spark import ui as _ui_mod

        if not auth_enabled:
            return redirect("/ui")
        return _ui_mod.login_page()

    @app.get("/ui/api/auth/csrf")
    def auth_csrf():
        if not auth_enabled:
            return jsonify({"csrf": ""})
        return jsonify({"csrf": web_auth.generate_csrf()})

    @app.post("/ui/api/auth")
    def auth_login():
        if not auth_enabled:
            return jsonify({"ok": True})
        ip = request.remote_addr or "unknown"
        if (reason := web_auth.check_access(ip)) is not None:
            return jsonify({"error": reason}), 429
        body = request.get_json(silent=True) or {}
        csrf = body.get("csrf")
        if not web_auth.validate_csrf(csrf):
            web_auth.record_failed_attempt(ip)
            return jsonify({"error": "Invalid or expired CSRF token"}), 403
        if not passphrase_ok(body.get("api_key"), admin_passphrase_sha256):
            web_auth.record_failed_attempt(ip)
            return jsonify({"error": "Invalid API key"}), 401
        web_auth.clear_failed_attempts(ip)
        web_auth.consume_csrf(csrf)
        resp = jsonify({"ok": True})
        # httpOnly session + page-JS-readable csrf for the double submit
        resp.set_cookie(AUTH_COOKIE, web_auth.issue_session(),
                        httponly=True, samesite="Strict")
        resp.set_cookie(CSRF_COOKIE, web_auth.new_session_csrf(),
                        httponly=False, samesite="Strict")
        return resp

    @app.post("/ui/api/auth/logout")
    def auth_logout():
        resp = jsonify({"ok": True})
        resp.delete_cookie(AUTH_COOKIE)
        resp.delete_cookie(CSRF_COOKIE)
        return resp

    def envs() -> dict:
        if environments is None:
            return {}
        return environments() if callable(environments) else environments

    # -- health surface (T15) ---------------------------------------------

    @app.get("/health")
    def health():
        if health_service is None:
            return jsonify({"status": "unknown"})
        return jsonify(health_service.snapshot())

    @app.get("/health/deadletters")
    def health_deadletters():
        if dlq_monitor is None:
            return jsonify({"total": len(dlq.rows())})
        return jsonify(dlq_monitor.stats())

    @app.get("/health/connections")
    def health_connections():
        if connections is None:
            return jsonify({})
        return jsonify(
            {
                ep: {
                    "is_healthy": connections.failures(ep) == 0,
                    "last_error": (
                        None
                        if connections.failures(ep) == 0
                        else f"{connections.failures(ep)} consecutive failure(s)"
                    ),
                }
                for ep in connections.endpoints()
            }
        )

    @app.get("/health/ingest")
    def health_ingest():
        # embedding-gate cycle health (VERDICT r9 #6): per-index stage
        # timings / accept counts / gated margin / folds, the analog of
        # the reference's per-object cycle health (Program.cs:906-949).
        # Live entries are read through a locked snapshot (ADVICE r10 —
        # foreachBatch threads mutate the registry mid-request), and
        # gates persisted by a PREVIOUS driver process are merged in
        # from the health store so the surface survives a restart the
        # way the reference's SQLite-backed one does (VERDICT r10 #3).
        from trignis_spark.streaming.ingest import (
            load_ingest_health,
            snapshot_ingest_health,
        )

        gates = (
            load_ingest_health(ingest_health_root)
            if ingest_health_root is not None
            else {}
        )
        gates.update(snapshot_ingest_health())  # live wins: strictly newer
        return jsonify(
            {
                "timestamp": _ts(
                    dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
                ),
                "gate_count": len(gates),
                "gates": {
                    name: {
                        "last": entry.get("last"),
                        "cycles": entry.get("cycles", []),
                    }
                    for name, entry in gates.items()
                },
            }
        )

    def _state_payload(env_name: str | None):
        # the stored-procedure column of the reference's state surface;
        # our extraction source is the generated read (table_name) or the
        # user's source_sql escape hatch (SURVEY §2.9)
        sp_lookup = {
            name: {
                o.name.lower(): (o.source_sql or o.table_name or "")
                for o in e.tracking_objects
            }
            for name, e in envs().items()
        }
        by_env: dict[str, list[dict]] = {}
        for r in state.rows():
            if env_name is not None and r["environment_name"] != env_name:
                continue
            by_env.setdefault(r["environment_name"], []).append(
                {
                    "object_name": r["object_name"],
                    "stored_procedure_name": sp_lookup.get(
                        r["environment_name"], {}
                    ).get(r["object_name"].lower())
                    or None,
                    "last_version": r["last_version"],
                    "last_updated": _ts(r["last_updated"]),
                }
            )
        timestamp = _ts(dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))
        if env_name is not None:
            if env_name not in by_env:
                return (
                    jsonify(
                        {"error": "Environment not found", "environment": env_name}
                    ),
                    404,
                )
            objects = by_env[env_name]
            return jsonify(
                {
                    "environment": env_name,
                    "timestamp": timestamp,
                    "object_count": len(objects),
                    "objects": objects,
                }
            )
        return jsonify(
            {
                "timestamp": timestamp,
                "total_environments": len(by_env),
                "environments": [
                    {"name": name, "object_count": len(objs), "objects": objs}
                    for name, objs in by_env.items()
                ],
            }
        )

    @app.get("/health/state")
    def health_state():
        return _state_payload(None)

    @app.get("/health/state/<environment_name>")
    def health_state_env(environment_name):
        return _state_payload(environment_name)

    # -- state reset (T13) -------------------------------------------------

    @app.post("/ui/api/state/<environment_name>/<object_name>/reset")
    def state_reset(environment_name, object_name):
        if not state.reset(environment_name, object_name):
            return (
                jsonify(
                    {"error": "No sync state stored for that environment and object"}
                ),
                404,
            )
        log.warning(
            "Sync state for %s/%s reset via the API; the next cycle will "
            "re-initialise it",
            environment_name, object_name,
        )
        return jsonify({"ok": True})

    # -- dead letters ------------------------------------------------------

    @app.get("/ui/api/deadletters")
    def deadletters_list():
        page = request.args.get("page", default=1, type=int)
        page_size = request.args.get("page_size", default=50, type=int)
        search = request.args.get("search")
        object_filter = request.args.get("object_filter")
        total, rows = dlq.page(page, page_size, search, object_filter)
        return jsonify(
            {
                "total": total,
                "page": page,
                "page_size": page_size,
                "total_pages": math.ceil(total / page_size) if page_size else 0,
                "data": [
                    {
                        "id": r["id"],
                        "source_key": r["source_key"],
                        "tracking_object_name": r["tracking_object_name"],
                        "database_name": r["database_name"],
                        "data_hash": r["data_hash"],
                        "data": r["data"],
                        "error_message": r["error_message"],
                        "timestamp": _ts(r["timestamp"]),
                    }
                    for r in rows
                ],
            }
        )

    @app.post("/ui/api/deadletters/<int:dlq_id>/replay")
    def deadletter_replay(dlq_id):
        if replayer is None:
            return jsonify({"error": "replay not configured"}), 503
        row = dlq.get(dlq_id)
        if row is None:
            return jsonify({"error": "Dead letter not found"}), 404
        outcome = replayer.replay_row(row, manual=True)
        if outcome.status == "delivered":
            log.info("Dead letter %d replayed via the API and removed", dlq_id)
            return jsonify({"ok": True})
        if outcome.status == "unroutable":
            return (
                jsonify({"error": "No current environment/object routes this row"}),
                409,
            )
        # failed: replay_row(manual=True) already reset the attempt counter
        # so the row rejoins the automatic rotation (Program.cs:458-462)
        return jsonify({"error": "Replay failed; the dead letter was kept"}), 502

    @app.post("/ui/api/deadletters/<int:dlq_id>/discard")
    def deadletter_discard(dlq_id):
        if not dlq.delete(dlq_id):
            return jsonify({"error": "Dead letter not found"}), 404
        log.warning("Dead letter %d discarded via the API", dlq_id)
        return jsonify({"ok": True})

    @app.post("/ui/api/deadletters/purge")
    def deadletters_purge():
        deleted = dlq.purge_matching(
            request.args.get("search"), request.args.get("object_filter")
        )
        return jsonify({"ok": True, "deleted": deleted})

    # -- pause / resume (T11) ----------------------------------------------

    @app.post("/ui/api/pause")
    def pause():
        body = request.get_json(silent=True) or {}
        if not passphrase_ok(body.get("passphrase"), admin_passphrase_sha256):
            return jsonify({"error": "Invalid passphrase"}), 401
        resolved = resolve_scope(body)
        if resolved is None:
            return (
                jsonify(
                    {
                        "error": "Specify an environment, and an object when "
                        "pausing a single tracking object"
                    }
                ),
                400,
            )
        scope, label = resolved
        pauses.pause(
            scope,
            reason=body.get("reason") or "",
            paused_by=request.remote_addr or "",
        )
        log.warning("Paused %s via the API (%s)", label,
                    body.get("reason") or "no reason given")
        return jsonify({"ok": True, "scope": scope, "label": label})

    @app.post("/ui/api/resume")
    def resume():
        body = request.get_json(silent=True) or {}
        resolved = resolve_scope(body)
        if resolved is None:
            return (
                jsonify(
                    {
                        "error": "Specify an environment, and an object when "
                        "resuming a single tracking object"
                    }
                ),
                400,
            )
        scope, label = resolved
        resumed = pauses.resume(scope)
        if resumed:
            log.info("Resumed %s via the API", label)
        return jsonify({"ok": True, "resumed": resumed, "scope": scope,
                        "label": label})

    # -- dashboard surface (overview / environments / logs) ----------------

    @app.get("/ui/api/overview")
    def overview():
        stats = dlq_monitor.stats() if dlq_monitor is not None else {}
        e = envs()
        return jsonify(
            {
                "version": version,
                "environment_count": len(e),
                "tracking_object_count": sum(
                    len(v.tracking_objects) for v in e.values()
                ),
                "endpoint_count": sum(len(v.destinations) for v in e.values()),
                # lets the pause dialog know whether to ask for the
                # passphrase; says nothing secret
                "auth_enabled": admin_passphrase_sha256 is not None,
                "dead_letters": {
                    "total": stats.get("total", len(dlq.rows())),
                    "last_24h": stats.get("last_day", 0),
                    "last_hour": stats.get("last_hour", 0),
                },
            }
        )

    @app.get("/ui/api/environments")
    def list_environments():
        paused = pauses.paused_scopes()
        out = []
        for name, e in envs().items():
            out.append(
                {
                    "name": name,
                    "paused": env_scope(name) in paused,
                    "settings": {
                        "polling_interval_seconds": e.polling_interval_seconds,
                        "retry_count": e.retry_count,
                        "retry_delay_seconds": e.retry_delay_seconds,
                        "max_records_per_batch": e.max_records_per_batch,
                    },
                    "tracking_objects": [
                        {
                            "name": o.name,
                            "database": o.database,
                            "table_name": o.table_name,
                            "initial_sync_mode": o.initial_sync_mode,
                            "paused": obj_scope(name, o.name) in paused,
                        }
                        for o in e.tracking_objects
                    ],
                    "destinations": [
                        {
                            "name": d.name,
                            "kind": d.kind,
                            # credentials intentionally omitted
                            "options": {
                                k: v
                                for k, v in d.options.items()
                                if k.lower() not in _REDACTED_OPTION_KEYS
                            },
                        }
                        for d in e.destinations
                    ],
                }
            )
        return jsonify(out)

    @app.get("/ui/api/logs")
    def logs():
        import os

        limit = request.args.get("limit", default=200, type=int)
        offset = request.args.get("offset", default=0, type=int)
        level = request.args.get("level")
        empty = {"file": None, "total": 0, "lines": [], "has_more": False}
        if not log_dir or not os.path.isdir(log_dir):
            return jsonify(empty)
        # W4 live: merge the 3 newest files, newest entries first
        files = sorted(
            (
                os.path.join(log_dir, f)
                for f in os.listdir(log_dir)
                if f.startswith("log-") and f.endswith(".txt")
            ),
            key=os.path.getmtime,
            reverse=True,
        )[:3]
        if not files:
            return jsonify(empty)
        entries: list[dict] = []
        for fp in files:
            try:
                with open(fp, encoding="utf-8", errors="replace") as f:
                    entries.extend(parse_log_entries(f.read()))
            except OSError:
                continue  # a rolling file must not blank the whole view
        entries.sort(key=lambda e: e["timestamp"], reverse=True)
        if level and level.upper() != "ALL":
            entries = [e for e in entries if e["level"] == level.upper()]
        page = entries[offset : offset + limit]
        return jsonify(
            {
                "file": os.path.basename(files[0]),
                "total": len(entries),
                "has_more": offset + limit < len(entries),
                "lines": page,
            }
        )

    @app.get("/ui/api/settings")
    def ui_settings():
        """Read-only global settings (``Program.cs:659-678``): whatever
        the host passed as ``settings`` plus the server/auth section,
        every secret-bearing key recursively redacted."""
        payload = dict(settings or {})
        payload.setdefault("server", {})
        payload["server"] = {
            **payload["server"],
            "auth_enabled": auth_enabled,
            "version": version,
        }
        return jsonify(redact_settings(payload))

    @app.get("/ui/api/pauses")
    def list_pauses():
        return jsonify(
            [
                {
                    "scope": r["scope"],
                    "reason": r["reason"],
                    "paused_by": r["paused_by"],
                    "paused_at": _ts(r["paused_at"]),
                }
                for r in pauses.rows()
            ]
        )

    # -- dashboard views (reference Source/ui/views/*) ---------------------

    from trignis_spark import ui as _ui

    @app.get("/ui")
    def ui_dashboard():
        return _ui.PAGES["dashboard"]()

    @app.get("/ui/<view>")
    def ui_view(view):
        if view not in _ui.PAGES:
            return jsonify({"error": "Unknown view", "view": view}), 404
        return _ui.PAGES[view]()

    return app
