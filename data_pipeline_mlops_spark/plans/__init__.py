from data_pipeline_mlops_spark.plans import medallion  # noqa: F401
