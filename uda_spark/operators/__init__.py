from uda_spark.operators import kv, sort, agg, join, window, setops, dedup, similarity, workloads  # noqa: F401
