"""Training-data text operators over ``documents`` (BASELINE.json
north star): exact dedup, quality scoring, token counting — each with a
DuckDB oracle. Near-dup (MinHash/Jaccard) queries join in this module
as they land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.dedup import dedup_exact_hash
from end_to_end_etl_pipeline_spark.queries.catalog import load, register


@register(
    "dedup_exact_text",
    oracle="""
    SELECT min(doc_id) AS doc_id, md5(coalesce(text, '␀')) AS content_hash
    FROM documents GROUP BY 2
    """,
    doc="Exact content dedup via dedup_exact_hash: groupBy(hash).min(id) + semi-join.",
    tags=("north-star", "dedup"),
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup_exact_hash(docs, ["text"], "doc_id").select("doc_id", "content_hash")


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT)
             AS n_tokens,
           round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
                 / length(text), 6) AS space_ratio,
           round(CAST(len(list_filter(string_split(text, ' '),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to')))
                      AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), w -> length(w) > 0)), 6)
             AS stopword_ratio
    FROM documents
    """,
    doc="Text quality scoring: token count, space ratio, stopword ratio.",
    tags=("north-star", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    stop = F.filter(
        F.split("text", " "),
        lambda w: w.isin("the", "a", "of", "and", "to"),
    )
    n_tokens = F.size(words).cast("long")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.round(
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))))
            .cast("double")
            / F.length("text"),
            6,
        ).alias("space_ratio"),
        F.round(F.size(stop).cast("double") / n_tokens, 6).alias("stopword_ratio"),
    )
