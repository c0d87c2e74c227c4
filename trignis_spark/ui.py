"""Dashboard UI: static HTML views over the control-plane JSON API.

The reference ships a server-rendered shell with operational views
(``Source/ui/views/{dashboard,environments,deadletters,logs,
settings}.html``) plus a login form (``Source/ui/login.html``)
over the same endpoints this repo's ``api.py`` exposes. This module
re-expresses that surface as self-contained pages — one shared shell,
vanilla-JS fetch against the existing ``/ui/api/*`` and ``/health/*``
routes, zero build step and zero external assets (the sandboxed service
has no CDN). Original markup/styling; parity is with what the views
*show*, not how the reference renders it.

Mounted by ``api.create_app`` at ``/ui`` (dashboard), ``/ui/
environments``, ``/ui/deadletters``, ``/ui/logs``, ``/ui/settings``,
and ``/ui/login`` (served by the auth routes, no nav shell).
"""

from __future__ import annotations

_STYLE = """
:root { --bg:#101216; --panel:#181b22; --line:#272b35; --fg:#d7dae0;
        --dim:#8a90a0; --acc:#5b9dd9; --ok:#58a56f; --bad:#c95f6c; }
* { box-sizing:border-box; margin:0; }
body { background:var(--bg); color:var(--fg); font:14px/1.5 system-ui,
       -apple-system, "Segoe UI", sans-serif; display:flex; min-height:100vh; }
nav { width:190px; flex-shrink:0; border-right:1px solid var(--line);
      padding:1.2rem .9rem; }
nav .brand { font-weight:700; letter-spacing:.04em; margin-bottom:1.4rem; }
nav a { display:block; color:var(--dim); text-decoration:none;
        padding:.4rem .6rem; border-radius:6px; margin-bottom:.15rem; }
nav a.active, nav a:hover { color:var(--fg); background:var(--panel); }
main { flex:1; padding:1.4rem 1.8rem; max-width:1100px; }
h1 { font-size:1.15rem; margin-bottom:1rem; }
.grid { display:grid; grid-template-columns:repeat(auto-fit,minmax(160px,1fr));
        gap:.9rem; margin-bottom:1.2rem; }
.card { background:var(--panel); border:1px solid var(--line);
        border-radius:8px; padding:.9rem 1rem; }
.card .label { color:var(--dim); font-size:.72rem; text-transform:uppercase;
               letter-spacing:.06em; }
.card .value { font-size:1.5rem; font-weight:600; margin-top:.2rem; }
table { width:100%; border-collapse:collapse; background:var(--panel);
        border:1px solid var(--line); border-radius:8px; overflow:hidden; }
th, td { text-align:left; padding:.5rem .8rem; border-bottom:1px solid
         var(--line); font-size:.82rem; }
th { color:var(--dim); font-weight:500; text-transform:uppercase;
     font-size:.68rem; letter-spacing:.06em; }
tr:last-child td { border-bottom:none; }
.badge { display:inline-block; padding:.1rem .5rem; border-radius:10px;
         font-size:.7rem; border:1px solid var(--line); color:var(--dim); }
.badge.ok { color:var(--ok); border-color:var(--ok); }
.badge.bad { color:var(--bad); border-color:var(--bad); }
button { background:none; border:1px solid var(--line); color:var(--fg);
         border-radius:6px; padding:.25rem .7rem; cursor:pointer;
         font-size:.75rem; }
button:hover { border-color:var(--acc); color:var(--acc); }
.muted { color:var(--dim); }
pre { white-space:pre-wrap; word-break:break-all; font-size:.75rem; }
.toolbar { display:flex; gap:.6rem; margin-bottom:.9rem; align-items:center; }
"""

_NAV = """
<nav>
  <div class="brand">trignis-spark</div>
  <a href="/ui" id="nav-dashboard">Dashboard</a>
  <a href="/ui/environments" id="nav-environments">Environments</a>
  <a href="/ui/deadletters" id="nav-deadletters">Dead Letters</a>
  <a href="/ui/logs" id="nav-logs">Logs</a>
  <a href="/ui/settings" id="nav-settings">Settings</a>
</nav>
"""


def _shell(title: str, active: str, body: str, script: str) -> str:
    nav = _NAV.replace(
        f'id="nav-{active}"', f'id="nav-{active}" class="active"'
    )
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{title} — trignis-spark</title>
<style>{_STYLE}</style></head>
<body>{nav}<main><h1>{title}</h1>{body}</main>
<script>
const J = (u) => fetch(u).then(r => r.json());
// double-submit: echo the readable csrf cookie on every mutation
const csrf = () => (document.cookie.match(/(?:^|; )trignis_csrf=([^;]*)/)
  || [])[1] || "";
const P = (u, b) => fetch(u, {{method: "POST",
  headers: {{"Content-Type": "application/json",
             "X-CSRF-Token": decodeURIComponent(csrf())}},
  body: JSON.stringify(b || {{}})}}).then(r => r.json());
const esc = (s) => String(s ?? "").replace(/[&<>"'`]/g,
  c => ({{"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;",
          "'":"&#39;","`":"&#96;"}}[c]));
{script}
load();
</script></body></html>"""


def dashboard_page() -> str:
    body = """
<div class="grid">
  <div class="card"><div class="label">Environments</div>
    <div class="value" id="envs">–</div></div>
  <div class="card"><div class="label">Tracking objects</div>
    <div class="value" id="objs">–</div></div>
  <div class="card"><div class="label">Endpoints</div>
    <div class="value" id="endpoints">–</div></div>
  <div class="card"><div class="label">Dead letters</div>
    <div class="value" id="dl">–</div>
    <div class="muted" id="dlsub"></div></div>
</div>
<div class="toolbar"><span class="badge" id="health">checking…</span>
  <button onclick="load()">Refresh</button></div>
<table><thead><tr><th>Environment</th><th>Object</th><th>Version</th>
<th>Last sync</th></tr></thead><tbody id="state"></tbody></table>
"""
    script = """
async function load() {
  const o = await J("/ui/api/overview");
  envs.textContent = o.environment_count;
  objs.textContent = o.tracking_object_count;
  endpoints.textContent = o.endpoint_count;
  dl.textContent = o.dead_letters.total;
  dlsub.textContent = o.dead_letters.last_hour + " last hour · "
    + o.dead_letters.last_24h + " last 24h";
  const h = await J("/health");
  health.textContent = h.status || "unknown";
  health.className = "badge " + (h.status === "healthy" ? "ok" : "bad");
  const st = await J("/health/state");
  state.innerHTML = (st.environments || []).flatMap(e =>
    e.objects.map(r =>
      "<tr><td>" + esc(e.name) + "</td><td>" + esc(r.object_name)
      + "</td><td>" + esc(r.last_version) + "</td><td class=muted>"
      + esc(r.last_updated) + "</td></tr>")).join("")
    || "<tr><td colspan=4 class=muted>no sync state yet</td></tr>";
}
"""
    return _shell("Dashboard", "dashboard", body, script)


def environments_page() -> str:
    body = """
<div class="toolbar"><button onclick="load()">Refresh</button></div>
<div id="list" class="muted">Loading…</div>
"""
    script = """
async function act(url, scope) {
  await P(url, scope);
  load();
}
async function load() {
  const es = await J("/ui/api/environments");
  list.innerHTML = es.map(e => `
    <div class="card" style="margin-bottom:1rem">
      <div style="display:flex;justify-content:space-between">
        <strong>${esc(e.name)}</strong>
        <span>
          <span class="badge ${e.paused ? "bad" : "ok"}">
            ${e.paused ? "paused" : "active"}</span>
          <button onclick='act(
            "/ui/api/${e.paused ? "resume" : "pause"}",
            {environment: "${esc(e.name)}"})'>
            ${e.paused ? "Resume" : "Pause"}</button>
        </span>
      </div>
      <div class="muted" style="font-size:.75rem;margin:.3rem 0">
        poll ${e.settings.polling_interval_seconds}s ·
        retry ×${e.settings.retry_count} ·
        batch ${e.settings.max_records_per_batch}</div>
      <table style="margin-top:.5rem"><thead>
        <tr><th>Object</th><th>Table</th><th>Mode</th><th></th></tr>
      </thead><tbody>${e.tracking_objects.map(o => `
        <tr><td>${esc(o.name)}</td><td>${esc(o.table_name)}</td>
        <td>${esc(o.initial_sync_mode)}</td>
        <td>${o.paused ? '<span class="badge bad">paused</span>' : ""}</td>
        </tr>`).join("")}</tbody></table>
      <div class="muted" style="font-size:.75rem;margin-top:.5rem">
        destinations: ${e.destinations.map(d =>
          esc(d.name) + " (" + esc(d.kind) + ")").join(", ") || "none"}
      </div>
    </div>`).join("") || "<div class=muted>no environments</div>";
}
"""
    return _shell("Environments", "environments", body, script)


def deadletters_page() -> str:
    body = """
<div class="toolbar">
  <button onclick="load()">Refresh</button>
  <button onclick="purge()">Purge replayed/expired</button>
  <span class="muted" id="count"></span>
</div>
<table><thead><tr><th>Id</th><th>Scope</th><th>Error</th><th>Object</th>
<th>Time</th><th></th></tr></thead><tbody id="rows"></tbody></table>
"""
    script = """
async function replay(id) { await P("/ui/api/deadletters/" + id + "/replay");
  load(); }
async function discard(id) { await P("/ui/api/deadletters/" + id
  + "/discard"); load(); }
async function purge() { await P("/ui/api/deadletters/purge"); load(); }
async function load() {
  const d = await J("/ui/api/deadletters");
  const items = d.data || [];
  count.textContent = d.total + " row(s)";
  rows.innerHTML = items.map(r =>
    "<tr><td>" + r.id + "</td><td>" + esc(r.source_key) + "</td><td>"
    + esc((r.error_message || "").slice(0, 80)) + "</td><td>"
    + esc(r.tracking_object_name) + "</td><td class=muted>"
    + esc(r.timestamp) + "</td>"
    + "<td><button onclick=replay(" + r.id + ")>Replay</button> "
    + "<button onclick=discard(" + r.id + ")>Discard</button></td></tr>"
  ).join("") || "<tr><td colspan=6 class=muted>dead-letter queue is empty"
  + "</td></tr>";
}
"""
    return _shell("Dead Letters", "deadletters", body, script)


def logs_page() -> str:
    body = """
<div class="toolbar">
  <button onclick="load()">Refresh</button>
  <select id="level" onchange="load()">
    <option value="">all levels</option><option>INFO</option>
    <option>WARN</option><option>ERROR</option>
  </select>
</div>
<table><thead><tr><th style="width:170px">Time</th>
<th style="width:70px">Level</th><th>Message</th></tr></thead>
<tbody id="rows"></tbody></table>
"""
    script = """
async function load() {
  const lvl = document.getElementById("level").value;
  const d = await J("/ui/api/logs" + (lvl ? "?level=" + lvl : ""));
  const items = d.lines || d.items || d;
  rows.innerHTML = (items || []).map(r =>
    "<tr><td class=muted>" + esc(r.timestamp) + "</td><td>"
    + "<span class='badge " + (r.level === "ERROR" ? "bad" :
      r.level === "WARN" ? "bad" : "ok") + "'>" + esc(r.level)
    + "</span></td><td><pre>" + esc(r.message) + "</pre></td></tr>"
  ).join("") || "<tr><td colspan=3 class=muted>no log entries</td></tr>";
}
"""
    return _shell("Logs", "logs", body, script)


def settings_page() -> str:
    body = """
<div class="toolbar"><button onclick="load()">Refresh</button>
  <button onclick="logout()">Log out</button></div>
<div id="sections" class="muted">Loading…</div>
"""
    script = """
async function logout() {
  await P("/ui/api/auth/logout");
  location.href = "/ui/login";
}
function section(title, obj) {
  const rows = Object.entries(obj || {}).map(([k, v]) =>
    "<tr><td>" + esc(k) + "</td><td>" + (typeof v === "object"
      ? "<pre>" + esc(JSON.stringify(v, null, 1)) + "</pre>"
      : esc(v)) + "</td></tr>").join("");
  return `<div class="card" style="margin-bottom:1rem">
    <strong>${esc(title)}</strong>
    <table style="margin-top:.5rem"><tbody>
      ${rows || "<tr><td class=muted>empty</td></tr>"}
    </tbody></table></div>`;
}
async function load() {
  const s = await J("/ui/api/settings");
  sections.innerHTML = Object.entries(s).map(
    ([name, body]) => section(name, body)).join("")
    || "<div class=muted>no settings exposed</div>";
}
"""
    return _shell("Settings", "settings", body, script)


def login_page() -> str:
    """Login form (reference ``Source/ui/login.html`` flow): fetch the
    one-time CSRF token, echo it with the API key, land on the
    dashboard. Served without the nav shell — there is nothing to
    navigate to before a session exists."""
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Sign in — trignis-spark</title>
<style>{_STYLE}
body {{ align-items:center; justify-content:center; }}
.login {{ width:320px; }}
input {{ width:100%; background:var(--bg); color:var(--fg);
        border:1px solid var(--line); border-radius:6px;
        padding:.5rem .7rem; margin:.6rem 0; font-size:.9rem; }}
.err {{ color:var(--bad); font-size:.8rem; min-height:1.2em; }}
</style></head>
<body><main class="login"><div class="card">
<h1>trignis-spark</h1>
<p class="muted" style="font-size:.8rem">Enter the admin API key to
open the operator dashboard.</p>
<input id="key" type="password" placeholder="API key"
  onkeydown="if (event.key === 'Enter') go()">
<div class="err" id="err"></div>
<button onclick="go()" style="width:100%">Sign in</button>
</div></main>
<script>
async function go() {{
  err.textContent = "";
  const c = await fetch("/ui/api/auth/csrf").then(r => r.json());
  const r = await fetch("/ui/api/auth", {{method: "POST",
    headers: {{"Content-Type": "application/json"}},
    body: JSON.stringify({{csrf: c.csrf, api_key: key.value}})}});
  if (r.ok) {{ location.href = "/ui"; return; }}
  err.textContent = (await r.json()).error || "Sign-in failed";
}}
document.getElementById("key").focus();
</script></body></html>"""


PAGES = {
    "dashboard": dashboard_page,
    "environments": environments_page,
    "deadletters": deadletters_page,
    "logs": logs_page,
    "settings": settings_page,
}
