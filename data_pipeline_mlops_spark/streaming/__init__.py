from data_pipeline_mlops_spark.streaming import alert_stream, microbatch  # noqa: F401
