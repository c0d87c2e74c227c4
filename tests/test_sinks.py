"""Sink policies: templates, retry, breaker, file eviction, HTTP batching."""

import json
import os

import pytest

from trignis_spark.sinks.base import (
    CircuitBreaker,
    CircuitOpenError,
    ExportContext,
    OversizePayloadError,
    RetryPolicy,
    TransientSinkError,
    render_template,
)
from trignis_spark.sinks.file import FileSink, evict_oldest, fixed_root
from trignis_spark.sinks.http import HttpSink
from trignis_spark.sinks.memory import MemorySink

CTX = ExportContext(
    environment="prod", database="db1", object_name="orders", key="prod/orders"
)


def test_render_template_placeholders():
    out = render_template("/x/{environment}/{database}/{object}-{batch}of{totalbatches}", CTX)
    assert out == "/x/prod/db1/orders-1of1"
    guid = render_template("{guid}", CTX)
    assert len(guid) == 36
    ts = render_template("{timestamp}", CTX)
    assert len(ts) == 14 and ts.isdigit()


def test_retry_fixed_delay_then_raise():
    sleeps = []
    policy = RetryPolicy(attempts=3, delay_seconds=5, sleep=sleeps.append)
    calls = []

    def flaky():
        calls.append(1)
        raise TransientSinkError("nope")

    with pytest.raises(TransientSinkError):
        policy.run(flaky)
    assert len(calls) == 3
    assert sleeps == [5, 5]  # fixed delay, no sleep after last attempt


def test_retry_succeeds_midway_and_skips_nontransient():
    policy = RetryPolicy(attempts=3, delay_seconds=0, sleep=lambda _s: None)
    sink = MemorySink("m", fail_times=2)
    policy.run(sink.write, "{}", CTX)
    assert sink.attempts == 3 and len(sink.payloads) == 1

    def fatal():
        raise OversizePayloadError("too big")

    calls = []

    def counting_fatal():
        calls.append(1)
        fatal()

    with pytest.raises(OversizePayloadError):
        policy.run(counting_fatal)
    assert len(calls) == 1  # non-transient: no retry


def test_circuit_breaker_opens_and_half_opens():
    t = [0.0]
    br = CircuitBreaker(threshold=3, open_seconds=60, clock=lambda: t[0])

    def boom():
        raise TransientSinkError("x")

    for _ in range(3):
        with pytest.raises(TransientSinkError):
            br.run(boom)
    with pytest.raises(CircuitOpenError):
        br.run(lambda: None)  # open: fails fast
    t[0] = 61.0  # past the break window: half-open lets one through
    assert br.run(lambda: "ok") == "ok"
    with pytest.raises(TransientSinkError):
        br.run(boom)  # failure count restarted


def test_file_sink_writes_rendered_path(tmp_path):
    sink = FileSink("f", path_template=str(tmp_path / "{environment}" / "{object}.json"))
    sink.write(json.dumps({"Data": [{"a": 1}]}), CTX)
    path = tmp_path / "prod" / "orders.json"
    assert json.loads(path.read_text()) == {"Data": [{"a": 1}]}


def test_fixed_root_semantics(tmp_path):
    assert fixed_root("/exports/{object}/x.json") == "/exports"
    assert fixed_root("{object}/x.json") is None  # no fixed prefix → no cleanup


def test_evict_oldest(tmp_path):
    for i in range(5):
        p = tmp_path / f"f{i}.json"
        p.write_bytes(b"x" * 100)
        os.utime(p, (i, i))  # mtime order = creation order
    deleted = evict_oldest(str(tmp_path), size_limit_bytes=250)
    assert [os.path.basename(d) for d in deleted] == ["f0.json", "f1.json", "f2.json"]


def _http(transport, **kw):
    return HttpSink("h", url="http://example/hook", transport=transport, **kw)


def test_http_batch_split_with_headers():
    posts = []

    def transport(url, body, headers):
        posts.append((url, json.loads(body.decode()), headers))
        return 200

    sink = _http(transport, max_records_per_batch=2)
    payload = json.dumps({"Metadata": {"Sync": {"Version": 9}}, "Data": [{"i": i} for i in range(5)]})
    sink.write(payload, CTX)
    assert len(posts) == 3  # 2+2+1
    assert [p[1]["Data"] for p in posts] == [[{"i": 0}, {"i": 1}], [{"i": 2}, {"i": 3}], [{"i": 4}]]
    assert posts[0][2]["X-Batch-Number"] == "1"
    assert posts[0][2]["X-Total-Batches"] == "3"
    assert all(p[1]["Metadata"]["Sync"]["Version"] == 9 for p in posts)


def test_http_auth_modes():
    headers_seen = {}

    def transport(url, body, headers):
        headers_seen.update(headers)
        return 200

    _http(transport, bearer_token="tok").write('{"Data":[]}', CTX)
    assert headers_seen["Authorization"] == "Bearer tok"
    headers_seen.clear()
    _http(transport, basic_user="u", basic_password="p").write('{"Data":[]}', CTX)
    assert headers_seen["Authorization"].startswith("Basic ")
    headers_seen.clear()
    _http(transport, api_key="k").write('{"Data":[]}', CTX)
    assert headers_seen["X-Api-Key"] == "k"


def test_http_non_2xx_is_transient_failure():
    sink = _http(lambda u, b, h: 503)
    with pytest.raises(TransientSinkError):
        sink.write('{"Data":[]}', CTX)


def test_http_oversize_never_retryable():
    sink = _http(lambda u, b, h: 200, max_payload_size_bytes=10)
    err = None
    try:
        sink.write(json.dumps({"Data": [{"blob": "x" * 100}]}), CTX)
    except OversizePayloadError as e:
        err = e
    assert err is not None and err.retryable is False


def test_http_gzip_compression():
    bodies = []

    def transport(url, body, headers):
        bodies.append((body, headers))
        return 200

    sink = _http(transport, gzip=True)
    sink.write(json.dumps({"Data": [{"pad": "y" * 5000}]}), CTX)
    body, headers = bodies[0]
    assert headers["Content-Encoding"] == "gzip"
    import gzip as g

    assert json.loads(g.decompress(body))["Data"][0]["pad"] == "y" * 5000


def test_gzip_header_only_when_actually_compressed():
    seen = []

    def transport(url, body, headers):
        seen.append((body, headers))
        return 200

    sink = _http(transport, gzip=True)
    sink.write('{"Data":[{"i":1}]}', CTX)  # tiny: below compress threshold
    body, headers = seen[0]
    assert "Content-Encoding" not in headers  # not compressed → no header
    assert json.loads(body)["Data"] == [{"i": 1}]


def test_batch_templates_render_per_chunk():
    urls = []

    def transport(url, body, headers):
        urls.append((url, headers.get("X-Chunk")))
        return 200

    sink = HttpSink(
        "h", url="http://example/hook/{batch}of{totalbatches}",
        headers={"X-Chunk": "{batch}/{totalbatches}"},
        transport=transport, max_records_per_batch=1,
    )
    sink.write(json.dumps({"Data": [{"i": 0}, {"i": 1}, {"i": 2}]}), CTX)
    assert urls == [
        ("http://example/hook/1of3", "1/3"),
        ("http://example/hook/2of3", "2/3"),
        ("http://example/hook/3of3", "3/3"),
    ]


def test_retry_attempts_zero_still_tries_once():
    policy = RetryPolicy(attempts=0, delay_seconds=0, sleep=lambda _s: None)
    assert policy.run(lambda: "ran") == "ran"
    with pytest.raises(TransientSinkError):
        policy.run(lambda: (_ for _ in ()).throw(TransientSinkError("x")))


def test_build_sink_inherits_env_caps():
    from trignis_spark.config import EnvironmentConfig, TrackingObject
    from trignis_spark.sinks import build_sink

    env = EnvironmentConfig(
        name="e",
        tracking_objects=(TrackingObject(name="o", table_name="t"),),
        max_records_per_batch=7,
        max_payload_size_bytes=1234,
    )
    sink = build_sink("http", "h", {"url": "http://x"}, env=env)
    assert sink.max_records_per_batch == 7
    assert sink.max_payload_size_bytes == 1234
    override = build_sink(
        "http", "h", {"url": "http://x", "max_records_per_batch": 99}, env=env
    )
    assert override.max_records_per_batch == 99  # per-sink option wins
