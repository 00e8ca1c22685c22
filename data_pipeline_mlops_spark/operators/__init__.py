from data_pipeline_mlops_spark.operators import (  # noqa: F401
    aggregate,
    alerts,
    clean,
    dedup,
    exact,
    joins,
    setops,
    skew,
    topk,
)
