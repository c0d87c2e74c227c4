"""As-of + range join edge semantics: ties, no-match, inner mode,
bucket-boundary intervals."""

import datetime as dt

from trignis_spark.operators.asof import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_picks_latest_at_or_before(spark):
    probe = spark.createDataFrame(
        [(1, 10, _t(10)), (2, 10, _t(5)), (3, 10, _t(0)), (4, 99, _t(50))],
        "pid long, k long, pt timestamp",
    )
    build = spark.createDataFrame(
        [(10, _t(1), "a"), (10, _t(5), "b"), (10, _t(9), "c")],
        "k long, bt timestamp, label string",
    )
    out = {
        r["pid"]: r["label"]
        for r in asof_join(
            probe, build, key="k", probe_time="pt", build_time="bt",
            build_cols=("label",),
        ).collect()
    }
    assert out[1] == "c"  # latest before t=10
    assert out[2] == "b"  # equal time counts (<= semantics)
    assert out[3] is None  # nothing at or before t=0
    assert out[4] is None  # key with no build rows (left join)


def test_asof_inner_drops_unmatched(spark):
    probe = spark.createDataFrame(
        [(1, 10, _t(10)), (2, 99, _t(10))], "pid long, k long, pt timestamp"
    )
    build = spark.createDataFrame([(10, _t(1), "a")], "k long, bt timestamp, label string")
    rows = asof_join(
        probe, build, key="k", probe_time="pt", build_time="bt",
        build_cols=("label",), how="inner",
    ).collect()
    assert [r["pid"] for r in rows] == [1]


def test_range_join_boundaries(spark):
    intervals = spark.createDataFrame(
        [(100, 1, _t(0), _t(60))], "iid long, k long, s timestamp, e timestamp"
    )
    points = spark.createDataFrame(
        [
            (1, 1, _t(0)),     # inclusive start
            (2, 1, _t(59)),    # inside (and in a later bucket than start)
            (3, 1, _t(60)),    # exclusive end
            (4, 2, _t(30)),    # wrong key
        ],
        "pid long, k long, pt timestamp",
    )
    rows = range_join(
        points, intervals, key="k", point_time="pt",
        start_col="s", end_col="e", bucket_seconds=600,
    ).collect()
    assert sorted(r["pid"] for r in rows) == [1, 2]


def test_asof_null_build_attribute_not_stitched(spark):
    """A NULL in the latest build row must be returned as NULL — not
    replaced by an older row's value (atomic row carry)."""
    probe = spark.createDataFrame(
        [(1, 10, _t(10))], "pid long, k long, pt timestamp"
    )
    build = spark.createDataFrame(
        [(10, _t(1), "old", 5.0), (10, _t(9), None, 7.0)],
        "k long, bt timestamp, label string, score double",
    )
    [row] = asof_join(
        probe, build, key="k", probe_time="pt", build_time="bt",
        build_cols=("label", "score"),
    ).collect()
    assert row["label"] is None  # latest row's NULL, not 'old'
    assert row["score"] == 7.0  # from the same (latest) row


def test_asof_inner_keeps_match_with_null_first_col(spark):
    probe = spark.createDataFrame(
        [(1, 10, _t(10))], "pid long, k long, pt timestamp"
    )
    build = spark.createDataFrame(
        [(10, _t(1), None, 5.0)],
        "k long, bt timestamp, label string, score double",
    )
    rows = asof_join(
        probe, build, key="k", probe_time="pt", build_time="bt",
        build_cols=("label", "score"), how="inner",
    ).collect()
    assert len(rows) == 1 and rows[0]["score"] == 5.0


def _dir_fixture(spark):
    probe = spark.createDataFrame(
        [(1, 10, _t(10)), (2, 10, _t(5)), (3, 10, _t(0)), (4, 10, _t(100)),
         (5, 10, _t(7))],
        "pid long, k long, pt timestamp",
    )
    build = spark.createDataFrame(
        [(10, _t(1), "a"), (10, _t(5), "b"), (10, _t(9), "c")],
        "k long, bt timestamp, label string",
    )
    return probe, build


def test_asof_forward_picks_earliest_at_or_after(spark):
    probe, build = _dir_fixture(spark)
    out = {
        r["pid"]: r["label"]
        for r in asof_join(
            probe, build, key="k", probe_time="pt", build_time="bt",
            build_cols=("label",), direction="forward",
        ).collect()
    }
    assert out[3] == "a"   # next build after t=0
    assert out[2] == "b"   # equal time counts (>= semantics)
    assert out[5] == "c"   # t=7 -> next is t=9
    assert out[1] is None  # nothing after t=10
    assert out[4] is None


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    probe, build = _dir_fixture(spark)
    out = {
        r["pid"]: r["label"]
        for r in asof_join(
            probe, build, key="k", probe_time="pt", build_time="bt",
            build_cols=("label",), direction="nearest",
        ).collect()
    }
    assert out[5] == "b"   # t=7: 2-min gap both ways -> tie to backward
    assert out[1] == "c"   # t=10: back gap 1 (c@9) beats fwd none
    assert out[2] == "b"   # t=5: exact hit is the backward match
    assert out[3] == "a"   # t=0: only forward exists
    assert out[4] == "c"   # t=100: only backward exists


def test_asof_nearest_tie_goes_backward_and_nulls_fall_through(spark):
    probe = spark.createDataFrame(
        [(1, 7, _t(7)), (2, 7, _t(0)), (3, 7, _t(100))],
        "pid long, k long, pt timestamp",
    )
    build = spark.createDataFrame(
        [(7, _t(5), "b"), (7, _t(9), "c")],
        "k long, bt timestamp, label string",
    )
    out = {
        r["pid"]: r["label"]
        for r in asof_join(
            probe, build, key="k", probe_time="pt", build_time="bt",
            build_cols=("label",), direction="nearest",
        ).collect()
    }
    assert out[1] == "b"  # equal 2-minute gaps: tie to backward
    assert out[2] == "b"  # only forward exists (t=0 -> b@5 is forward)
    assert out[3] == "c"  # only backward exists


def test_asof_nearest_on_date_typed_time_columns(spark):
    # DateType cannot cast to double; nearest must use day-granularity
    # datediff rather than failing at analysis (ADVICE round-4 regression)
    import datetime as dt

    d = dt.date
    probe = spark.createDataFrame(
        [(1, 7, d(2024, 1, 10)), (2, 7, d(2024, 1, 2))],
        "pid long, k long, pt date",
    )
    build = spark.createDataFrame(
        [(7, d(2024, 1, 1), "a"), (7, d(2024, 1, 12), "b")],
        "k long, bt date, label string",
    )
    out = {
        r["pid"]: r["label"]
        for r in asof_join(
            probe, build, key="k", probe_time="pt", build_time="bt",
            build_cols=("label",), direction="nearest",
        ).collect()
    }
    assert out[1] == "b"  # Jan 10: 2 days to b@12 beats 9 days to a@1
    assert out[2] == "a"  # Jan 2: 1 day back beats 10 days forward
