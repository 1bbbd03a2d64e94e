"""Physical-plan introspection helpers (scale-assertion toolkit)."""

from datamine_v2_0_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
    python_eval_nodes,
    read_schema,
)
