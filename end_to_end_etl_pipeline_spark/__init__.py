"""end_to_end_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``Raviawana/end-to-end-ETL-pipeline``
(a metadata-driven Bronze → Silver → Gold lakehouse pipeline; see
SURVEY.md), generalized into composable, config-driven operators and
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick the physical strategy.
No custom IR, no parser, no RDDs. Python UDFs only where built-ins
genuinely can't express the semantics (Arrow-batched pandas UDFs, never
row-at-a-time).
"""

from end_to_end_etl_pipeline_spark.session import create_spark_session

__all__ = ["create_spark_session"]

__version__ = "0.1.0"
