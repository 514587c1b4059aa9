from bloomy_etl_spark.plans.explain import assert_broadcast_join, assert_pushed_filters, plan_string

__all__ = ["assert_broadcast_join", "assert_pushed_filters", "plan_string"]
