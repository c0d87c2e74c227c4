"""Sessionization edge semantics: gap boundary, ties, single events,
per-user independence."""

import datetime as dt

from trignis_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_boundary_is_strict(spark):
    # Gap of exactly 1800 s continues the session; 1801 s starts a new one.
    ev = _events(
        spark,
        [
            (1, 7, _t(0), 1.0),
            (2, 7, _t(1800), 1.0),   # exactly the gap → same session
            (3, 7, _t(3601), 1.0),   # 1801 s later → new session
        ],
    )
    out = {r["event_id"]: r["session_no"] for r in sessionize(ev).collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_users_are_independent_and_sessions_roll_up(spark):
    ev = _events(
        spark,
        [
            (1, 1, _t(0), 2.0),
            (2, 1, _t(60), 3.0),
            (3, 1, _t(60 + 3600), 4.0),
            (4, 2, _t(30), 5.0),
        ],
    )
    stats = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["total_value"])
        for r in session_stats(ev).collect()
    }
    assert stats == {
        (1, 1): (2, 5.0),
        (1, 2): (1, 4.0),
        (2, 1): (1, 5.0),
    }


def test_timestamp_ties_break_by_event_id(spark):
    # Two events at the identical timestamp: deterministic order, one session.
    ev = _events(spark, [(2, 3, _t(0), 1.0), (1, 3, _t(0), 1.0)])
    rows = sessionize(ev).collect()
    assert {r["session_no"] for r in rows} == {1}


def test_resessionize_raises_on_column_clash(spark):
    import pytest

    ev = _events(spark, [(1, 1, _t(0), 1.0)])
    once = sessionize(ev)
    with pytest.raises(ValueError, match="session_no"):
        sessionize(once)


# --------------------------------------------------------------------------
# Chunked (skew-resistant) sessionize: exact equivalence + bounded
# per-window-partition occupancy under a 100x-hot key
# --------------------------------------------------------------------------


def _skewed_events(spark, n_normal_users=20, n_bot_events=2000):
    """One bot user with n_bot_events spread over ~14 days (sessions
    regularly spanning midnight chunk boundaries), plus normal users
    with 20 events each."""
    rows = []
    eid = 0
    for u in range(1, n_normal_users + 1):
        for i in range(20):
            rows.append((eid, u, _t(i * 600), 1.0))  # 10-min cadence
            eid += 1
    for i in range(n_bot_events):
        rows.append((eid, 999, _t(i * 600), 2.0))  # ~13.9 days of events
        eid += 1
    return _events(spark, rows)


def test_chunked_sessionize_equals_plain_on_skewed_data(spark):
    from trignis_spark.operators.sessions import sessionize_chunked

    ev = _skewed_events(spark)
    plain = {
        (r["event_id"], r["session_no"]) for r in sessionize(ev).collect()
    }
    chunked = {
        (r["event_id"], r["session_no"])
        for r in sessionize_chunked(ev).collect()
    }
    assert plain == chunked and len(plain) == ev.count()


def test_chunked_sessionize_stitches_boundary_sessions(spark):
    from trignis_spark.operators.sessions import sessionize_chunked

    # events 10 s apart straddling midnight: one session in both forms
    mid = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (1, 5, mid - dt.timedelta(seconds=15), 1.0),
        (2, 5, mid - dt.timedelta(seconds=5), 1.0),
        (3, 5, mid + dt.timedelta(seconds=5), 1.0),
        (4, 5, mid + dt.timedelta(seconds=15), 1.0),
        # and a genuine new session after the gap, next day
        (5, 5, mid + dt.timedelta(seconds=15 + 1801), 1.0),
    ]
    ev = _events(spark, rows)
    got = {
        r["event_id"]: r["session_no"]
        for r in sessionize_chunked(ev).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}
    plain = {
        r["event_id"]: r["session_no"] for r in sessionize(ev).collect()
    }
    assert got == plain


def test_chunked_sessionize_bounds_hot_key_partition(spark):
    """The scale property itself: the plain window funnels all of the
    bot's events through one (user) partition; the chunked window's
    largest (user, chunk) group is a day's worth. With 2000 bot events
    over ~14 days the max window-group size must drop ~10x."""
    from pyspark.sql import functions as F

    ev = _skewed_events(spark)
    plain_max = (
        ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    chunk = F.floor(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "date_trunc('second', ts))"
        )
        / 86400
    )
    chunked_max = (
        ev.groupBy("user_id", chunk.alias("c"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert plain_max == 2000
    assert chunked_max <= plain_max / 10
