from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, EngineQuery, register

__all__ = ["REGISTRY", "EngineQuery", "register"]
