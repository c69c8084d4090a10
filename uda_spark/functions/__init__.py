from uda_spark.functions import portable, text, vector  # noqa: F401
