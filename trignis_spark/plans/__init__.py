"""Physical-plan introspection: pushdown/broadcast/pruning assertions."""

from trignis_spark.plans.explain import (  # noqa: F401
    assert_broadcast_join,
    assert_max_exchanges,
    assert_no_cartesian_product,
    assert_pushed_filter,
    assert_read_schema_pruned,
    count_exchanges,
    plan_str,
)
