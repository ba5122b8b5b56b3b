from end_to_end_etl_pipeline_spark.sinks.writers import (
    ParquetCatalog,
    clustered_rewrite,
    write_append,
    write_csv,
    write_overwrite,
)

__all__ = [
    "ParquetCatalog",
    "clustered_rewrite",
    "write_append",
    "write_csv",
    "write_overwrite",
]
