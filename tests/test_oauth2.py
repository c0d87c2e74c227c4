"""OAuth2 token service: caching, expiry slack, single-flight refresh."""

import threading

from trignis_spark.sinks.oauth2 import OAuth2TokenService


def _svc(clock, responses):
    calls = []

    def transport(url, form):
        calls.append((url, dict(form)))
        return responses[min(len(calls) - 1, len(responses) - 1)]

    svc = OAuth2TokenService(clock=clock, transport=transport)
    return svc, calls


def test_token_cached_until_expiry_slack():
    t = [0.0]
    svc, calls = _svc(lambda: t[0], [{"access_token": "tok1", "expires_in": 300},
                                     {"access_token": "tok2", "expires_in": 300}])
    assert svc.get_token("https://as/token", "cid", "sec") == "tok1"
    t[0] = 100.0
    assert svc.get_token("https://as/token", "cid", "sec") == "tok1"  # cached
    assert len(calls) == 1
    t[0] = 241.0  # 300 - 60s slack exceeded → refresh early
    assert svc.get_token("https://as/token", "cid", "sec") == "tok2"
    assert len(calls) == 2


def test_configured_lifetime_overrides_server():
    t = [0.0]
    svc, calls = _svc(lambda: t[0], [{"access_token": "a", "expires_in": 10_000},
                                     {"access_token": "b", "expires_in": 10_000}])
    svc.get_token("u", "c", "s", lifetime_seconds=120)
    t[0] = 61.0  # 120 - 60 slack → expired
    svc.get_token("u", "c", "s", lifetime_seconds=120)
    assert len(calls) == 2


def test_default_lifetime_when_server_omits_expires_in():
    t = [0.0]
    svc, calls = _svc(lambda: t[0], [{"access_token": "a"}])
    svc.get_token("u", "c", "s")
    t[0] = 3000.0  # < 3600 - 60
    svc.get_token("u", "c", "s")
    assert len(calls) == 1


def test_cache_keyed_per_endpoint_and_scope():
    t = [0.0]
    svc, calls = _svc(lambda: t[0], [{"access_token": "a", "expires_in": 300}])
    svc.get_token("u1", "c", "s")
    svc.get_token("u2", "c", "s")
    svc.get_token("u1", "c", "s", scope="read")
    assert len(calls) == 3
    assert calls[2][1]["scope"] == "read"
    assert calls[0][1]["grant_type"] == "client_credentials"


def test_single_flight_refresh_under_concurrency():
    t = [0.0]
    barrier = threading.Barrier(8)
    calls = []

    def slow_transport(url, form):
        calls.append(1)
        return {"access_token": "tok", "expires_in": 300}

    svc = OAuth2TokenService(clock=lambda: t[0], transport=slow_transport)

    results = []

    def worker():
        barrier.wait()
        results.append(svc.get_token("u", "c", "s"))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert results == ["tok"] * 8
    assert len(calls) == 1  # one refresh served all callers


def test_http_sink_uses_oauth2_bearer():
    from trignis_spark.sinks.base import ExportContext
    from trignis_spark.sinks.http import HttpSink

    t = [0.0]
    svc, token_calls = _svc(
        lambda: t[0], [{"access_token": "oauth-tok", "expires_in": 300}]
    )
    posts = []

    def transport(url, body, headers):
        posts.append(headers)
        return 200

    sink = HttpSink(
        "h", url="http://x/hook", transport=transport,
        oauth2_token_url="https://as/token", oauth2_client_id="cid",
        oauth2_client_secret="sec", oauth2_token_service=svc,
    )
    sink.write('{"Data":[]}', ExportContext())
    sink.write('{"Data":[]}', ExportContext())
    assert [p["Authorization"] for p in posts] == ["Bearer oauth-tok"] * 2
    assert len(token_calls) == 1  # token fetched once, cached for the second post
