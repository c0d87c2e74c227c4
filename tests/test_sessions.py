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
