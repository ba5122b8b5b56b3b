"""SparkSession factory.

Capability rebuild of the reference's ``utils/sparksession.py:3-12``
(SparkSession.builder + shuffle partitions + AQE), with the observed
defects fixed (SURVEY.md §2.11-1):

* the reference misspells the AQE key (``spark.sql.adaptive.enable``,
  missing ``d``) so AQE is silently left at platform default — we set
  ``spark.sql.adaptive.enabled`` correctly;
* a fixed ``spark.sql.shuffle.partitions=200`` is wrong at both ends of
  the scale — we default it to the local core count and let AQE
  coalesce, and make it configurable for cluster deployments;
* session timezone pinned to UTC so timestamp semantics are stable
  across engines (Spark is session-TZ, most oracles are UTC-naive).

On a real cluster the same factory is used with ``master=None`` (defer
to spark-submit) and a larger ``shuffle_partitions`` (rule of thumb:
2-3× total executor cores, then let AQE coalesce down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def create_spark_session(
    app_name: str = "end_to_end_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    enable_hive_support: bool = False,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    AQE is enabled (coalesce + skew-join) so runtime statistics fix the
    partition count and skew that static planning can't know; Arrow is
    enabled for the pandas-UDF operators (similarity/multimodal).

    ``enable_hive_support`` turns on the Hive metastore so
    ``saveAsTable``/``spark.table`` names persist ACROSS sessions —
    the reference's 3-level catalog addressing
    (``utils/sparksession.py:9`` ``enableHiveSupport``,
    ``ds2b_company_house.py:96``) via ``sinks.writers.MetastoreCatalog``.
    Without it the session catalog is in-memory: identical addressing
    within one session, nothing persisted at exit (the right default
    for tests and the sandbox — no Derby ``metastore_db`` droppings).
    ``warehouse_dir`` locates managed-table storage either way. Note
    ``getOrCreate`` reuses any live session; hive support must be
    chosen before the first session of the process.
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cores}]")
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    if enable_hive_support:
        if warehouse_dir:
            # keep Derby's metastore next to the warehouse, not in cwd
            builder = builder.config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={warehouse_dir.rstrip('/')}"
                "/metastore_db;create=true",
            )
        builder = builder.enableHiveSupport()
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
