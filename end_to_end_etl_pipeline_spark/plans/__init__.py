from end_to_end_etl_pipeline_spark.plans.medallion import MedallionPipeline

__all__ = ["MedallionPipeline"]
