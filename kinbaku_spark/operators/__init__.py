from kinbaku_spark.operators import dedup, similarity, text  # noqa: F401
