from dic_a1_spark.plans.explain import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    plan_audit,
    pushed_filters,
)
