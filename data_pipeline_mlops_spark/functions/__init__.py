from data_pipeline_mlops_spark.functions import (  # noqa: F401
    bpe,
    dedup_text,
    mixture,
    multimodal,
    sketch,
    similarity,
    text,
)
