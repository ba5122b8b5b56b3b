"""Embedding-space operators over ``embeddings`` (BASELINE.json north
star): brute-force cosine top-k (the correctness baseline for ANN) and
per-label centroids. LSH-bucketed ANN joins here as it lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries.catalog import load, register


@register(
    "label_centroids",
    oracle="""
    SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) AS centroid_v, count(*) AS n
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
    doc="Per-label centroid via posexplode + groupBy(label, pos) — array agg at scale.",
    tags=("north-star", "vectors"),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    )
    return (
        exploded.withColumn("pos", (F.col("pos0") + 1).cast("int"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("centroid_v"), F.count("*").alias("n"))
        .drop("pos0")
    )
