from uda_spark.plans.explain import plan_str, count_exchanges, pushed_filters, codegen_stages

__all__ = ["plan_str", "count_exchanges", "pushed_filters", "codegen_stages"]
