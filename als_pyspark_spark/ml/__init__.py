from als_pyspark_spark.ml.als import ALSEngine, ALSParams  # noqa: F401
