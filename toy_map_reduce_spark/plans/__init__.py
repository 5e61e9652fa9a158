from toy_map_reduce_spark.plans.explain import (  # noqa: F401
    build_side_risk,
    explain_str,
    missed_broadcast,
    parse_plan_tree,
    plan_properties,
    single_partition_sites,
)
