from end_to_end_etl_pipeline_spark.sinks.writers import (
    ParquetCatalog,
    clustered_rewrite,
    write_append,
    write_csv,
    write_jsonl_sharded,
    write_orc,
    write_overwrite,
    write_sorted,
)

__all__ = [
    "BucketedSCD2",
    "ManifestCatalog",
    "ParquetCatalog",
    "clustered_rewrite",
    "write_append",
    "write_csv",
    "write_jsonl_sharded",
    "write_orc",
    "write_overwrite",
    "write_sorted",
]

_LAZY = ("ManifestCatalog", "BucketedSCD2")


def __getattr__(name):
    # PEP 562 lazy export: operators/scd.py imports sinks.writers,
    # and sinks.manifest imports operators/scd — importing manifest
    # eagerly here would close that loop into a circular import.
    if name in _LAZY:
        from end_to_end_etl_pipeline_spark.sinks import manifest

        return getattr(manifest, name)
    raise AttributeError(name)
