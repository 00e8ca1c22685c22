"""data_pipeline_mlops_spark — a PySpark-native analytics engine.

Re-expresses the computations of the reference e-commerce MLOps platform
(TienDoan274/Data-Pipeline-MLOPS) as first-class, parameterized PySpark
operators: medallion ETL cleaning rules, dashboard aggregations,
item-item collaborative filtering, streaming alert rules — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Design: DataFrame/SQL-first so Catalyst handles pushdown, pruning, join
strategy, and AQE; Pandas UDFs only where built-ins can't express the
semantics. See SURVEY.md for the reference inventory this covers.
"""

__version__ = "0.1.0"

from data_pipeline_mlops_spark.session import get_spark  # noqa: F401
