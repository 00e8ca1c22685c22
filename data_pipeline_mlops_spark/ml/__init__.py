from data_pipeline_mlops_spark.ml import cf, evaluate, interactions  # noqa: F401
