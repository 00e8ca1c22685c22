from data_pipeline_mlops_spark.functions import (  # noqa: F401
    dedup_text,
    multimodal,
    similarity,
    text,
)
