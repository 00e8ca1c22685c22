from data_pipeline_mlops_spark.ml import (  # noqa: F401
    cf,
    evaluate,
    interactions,
    ivf,
    model_registry,
)
