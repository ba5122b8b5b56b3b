"""IVF-partitioned ANN storage: the physical-layout half of the IVF
search tier (`operators/similarity.cosine_topk_ivf` is the in-plan
half). The corpus is persisted with one manifest bucket dir per
coarse cell, and a top-k query READS only the probed cells' dirs —
the scan reduction stops being a plan-level filter and becomes
storage-level partition pruning, which is what makes IVF pay off at
100 TB (nprobe/cells of the bytes, not just of the rows).

Index build = one partitioned write + one tiny centroids table
(cells × dim rows, `replace_atomic`). Query = rank cells against the
broadcast centroids, collect the probed cell ids (queries × nprobe
ints — model-parameter scale, like the PQ codebooks), manifest-read
exactly those bucket dirs, exact-score, WindowGroupLimit top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.similarity import (
    cosine,
    label_centroids_array,
)
from end_to_end_etl_pipeline_spark.sinks.manifest import BUCKET_COL, ManifestCatalog


def write_ivf_store(
    catalog: ManifestCatalog,
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str,
    cell_col: str,
    table: str,
    dim: int | None = None,
) -> None:
    """Persist ``corpus`` cell-partitioned (manifest bucket dirs keyed
    by the cell id) plus a ``<table>__centroids`` side table. The cell
    column is duplicated into the data so bucket-scoped reads keep it
    (partition columns vanish on subdir scans)."""
    df = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        F.col(cell_col).cast("int").alias("cell"),
    ).withColumn(BUCKET_COL, F.col("cell"))
    data_dir = catalog._new_data_dir(table)
    df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
    bucket_dirs: dict[str, list[str]] = {}
    for p in catalog.fs.listdir(data_dir):
        base = p.rsplit("/", 1)[-1]
        if base.startswith(f"{BUCKET_COL}="):
            bucket_dirs[base.split("=", 1)[1]] = [p]
    catalog._commit(
        table,
        {
            "dirs": None,
            "bucket_dirs": bucket_dirs,
            "n_buckets": len(bucket_dirs),
            "bucket_keys": ["cell"],
            # NOT the catalog's default pmod(hash(keys)) bucketing —
            # bucket id IS the cell value. optimize()/BucketedSCD2
            # check this marker and refuse to rewrite with the hash fn.
            "bucket_fn": "identity",
            "ivf_id_col": corpus_id,
            "ivf_vec_col": vec_col,
        },
    )
    cent = label_centroids_array(
        corpus.select(F.col(cell_col).alias("label"), F.col(vec_col)),
        "label",
        vec_col,
        dim=dim,
    )
    catalog.replace_atomic(cent, f"{table}__centroids")


def ivf_store_topk(
    catalog: ManifestCatalog,
    table: str,
    queries: DataFrame,
    query_id: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 2,
    exclude_self: bool = True,
) -> tuple[DataFrame, list[int]]:
    """Top-k cosine over the stored corpus, scanning only the probed
    cells' bucket dirs. Returns ``(result, probed_cells)`` so callers
    (and tests) can assert the physical scan set; result columns are
    (query_id, match_id, cosine), 6dp-rounded, ties to lowest id —
    identical to ``cosine_topk_ivf`` whenever the probe sets agree."""
    cent = catalog.read(f"{table}__centroids")
    qq = queries.select(
        F.col(query_id).alias("query_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "v"),
    ).select("query_id", (F.col("pos0") + 1).alias("pos"), "v")
    qcent = (
        qq.join(F.broadcast(cent), "pos")
        .groupBy("query_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("cv")).alias("d"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("qn"),
            F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cn"),
        )
        .withColumn("score", F.round(F.col("d") / (F.col("qn") * F.col("cn")), 6))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    # collect the probe assignment ONCE (queries x nprobe pairs —
    # model-parameter scale) and re-enter it as a literal frame, so
    # the centroid-ranking subplan doesn't execute a second time
    # inside the scored join
    probed_rows = [
        (r["query_id"], int(r["label"]))
        for r in qcent.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "label")
        .collect()
    ]
    spark = queries.sparkSession
    # derive the probe schema from the actual query-id DataType: a
    # hardcoded 'query_id long' would reject string/decimal doc ids
    # that the rest of the operator (ivf_id_col) handles fine
    from pyspark.sql.types import IntegerType, StructField, StructType

    qid_type = queries.schema[query_id].dataType
    probed_schema = StructType(
        [
            StructField("query_id", qid_type, True),
            StructField("cell", IntegerType(), True),
        ]
    )
    probed = spark.createDataFrame(probed_rows, probed_schema)
    cells = sorted({c for _, c in probed_rows})

    manifest = catalog.latest_manifest(table)
    id_col = manifest["ivf_id_col"]  # persisted at write time: never
    # inferred from column order, which rewrites could change
    stored = catalog.read(table, buckets=cells)
    c = stored.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        "cell",
    ).withColumn(
        "__cv_norm",
        F.sqrt(F.aggregate(
            F.transform("__cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn(
        "__qv_norm",
        F.sqrt(F.aggregate(
            F.transform("__qv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )),
    )
    scored = c.join(F.broadcast(probed.join(q, "query_id")), "cell")
    if exclude_self:
        scored = scored.filter(F.col("match_id") != F.col("query_id"))
    # zero-norm vectors make the cosine NULL (x/0.0 in double) and
    # would otherwise occupy top-k slots when a query has < k real
    # matches — same guard as cosine_topk / cosine_topk_ivf, keeping
    # the documented 'identical whenever probe sets agree' contract
    scored = scored.filter((F.col("__qv_norm") > 0) & (F.col("__cv_norm") > 0))
    scored = scored.withColumn(
        "cosine",
        F.round(
            cosine(F.col("__qv"), F.col("__cv"), F.col("__qv_norm"), F.col("__cv_norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    result = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "match_id", "cosine")
    )
    return result, cells
