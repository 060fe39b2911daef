from csvb_spark.operators import dedup, multimodal, similarity, text  # noqa: F401
