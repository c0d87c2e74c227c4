"""Property-based roundtrip: apply(old, snapshot_diff(old, new)) == new.

Hypothesis generates arbitrary old/new table pairs (overlapping keys,
NULLs everywhere, value collisions); the diff→apply cycle must
reconstruct the new state exactly — including the null-vs-mask
subtleties (a NULL that means "cleared" vs a NULL that means
"untouched").
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trignis_spark.operators import changefeed as cf

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
NUMS = st.one_of(st.none(), st.sampled_from([1.0, 2.5, -3.0]))


def table_strategy():
    row = st.tuples(KEYS, VALS, NUMS)
    return st.lists(row, min_size=0, max_size=7, unique_by=lambda r: r[0])


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, s, x) for k, s, x in rows], "pk long, status string, amount double"
    )


def _canon(df):
    return sorted(
        (r["pk"], r["status"], r["amount"]) for r in df.collect()
    )


@pytest.mark.usefixtures("spark")
class TestRoundtrip:
    @given(old_rows=table_strategy(), new_rows=table_strategy())
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_diff_then_apply_reconstructs_new(self, spark, old_rows, new_rows):
        old, new = _df(spark, old_rows), _df(spark, new_rows)
        diff = cf.snapshot_diff(
            old, new, key_cols=("pk",), tracked_cols=("status", "amount")
        )
        rebuilt = cf.apply_changes(
            old, diff, key_cols=("pk",), tracked_cols=("status", "amount")
        )
        assert _canon(rebuilt) == _canon(new)


def test_apply_respects_null_vs_mask(spark):
    """Masked-NULL clears; unmasked-NULL leaves the old value untouched."""
    old = _df(spark, [(1, "keep", 10.0), (2, "x", 20.0)])
    changes = spark.createDataFrame(
        [
            # clear status (masked, payload NULL); amount untouched
            ("U", ["status"], 1, None, None),
            # full-row update (NULL mask): everything from payload
            ("U", None, 2, "y", None),
        ],
        "operation string, changed array<string>, pk long, status string, amount double",
    )
    out = {
        r["pk"]: r
        for r in cf.apply_changes(
            old, changes, key_cols=("pk",), tracked_cols=("status", "amount")
        ).collect()
    }
    assert out[1]["status"] is None  # cleared
    assert out[1]["amount"] == 10.0  # untouched
    assert out[2]["status"] == "y" and out[2]["amount"] is None  # full row


def test_apply_after_masking_equals_apply_unmasked(spark):
    """Masking NULLs out unmasked payload columns — applying a masked
    diff must give the same result (apply ignores unmasked columns)."""
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _df(spark, [(1, "a2", 1.0), (2, "b", 9.0), (4, "d", 4.0)])
    diff = cf.snapshot_diff(old, new, ("pk",), ("status", "amount"))
    masked = cf.mask_columns(diff, tracked=("status", "amount"))
    a = cf.apply_changes(old, diff, ("pk",), ("status", "amount"))
    b = cf.apply_changes(old, masked, ("pk",), ("status", "amount"))
    assert _canon(a) == _canon(b) == _canon(new)
