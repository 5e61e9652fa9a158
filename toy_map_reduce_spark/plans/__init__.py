from toy_map_reduce_spark.plans.explain import explain_str, plan_properties  # noqa: F401
