from toy_map_reduce_spark.plans.explain import (  # noqa: F401
    explain_str,
    plan_properties,
    single_partition_sites,
)
