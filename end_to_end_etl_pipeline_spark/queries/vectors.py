"""Embedding-space queries over ``embeddings`` (BASELINE.json north
star): brute-force cosine top-k (the exactness baseline for ANN), an
IVF-style probed variant (the scale path), sign-LSH embedding
near-dup, and per-label centroids. All scoring is built-in
``zip_with``/``aggregate`` folds — JVM-side, no UDFs.

Determinism notes: scores are rounded to 6dp *before* ranking and
ties break on id, so orderings are bit-stable across engines; the LSH
hyperplanes are derived from md5 (no RNG) so the DuckDB oracles
reproduce the exact candidate sets. On this corpus the ``label``
column is a random partition, not a geometric cluster — the IVF query
therefore demonstrates (and oracle-verifies) the probe *machinery*;
recall vs. brute force is the usual nprobe/quantizer-quality dial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    ensure_codegen_fields,
    sign_lsh_near_dup_pairs,
)
from end_to_end_etl_pipeline_spark.queries.catalog import load, register

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _dim(emb: DataFrame) -> int:
    """Fixed embedding width, probed from one row (a single-row job
    over just the vector column — negligible, and it lets the
    centroid build run as per-index agg buffers instead of a
    posexplode that inflates the pre-agg row count × dim)."""
    return emb.select(F.size(F.col("embedding")).alias("d")).first()["d"]


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
    doc="Per-label centroid as dim scalar avg buffers in one "
    "groupBy(label) — element-wise array agg with no posexplode row "
    "inflation; the tiny cells × dim result is exploded post-agg.",
    tags=("north-star", "vectors"),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dim = _dim(emb)
    ensure_codegen_fields(spark, 2 * dim + 32)
    # element-then-cast: casting the whole array per buffer would be
    # O(dim²) per row (see operators/similarity.label_centroids_array)
    agg = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(F.col("embedding")[i].cast("double")).alias(f"__a{i}") for i in range(dim)],
    )
    return agg.select(
        "label",
        "n",
        F.posexplode(
            F.array(*[F.round(F.col(f"__a{i}"), 6) for i in range(dim)])
        ).alias("pos0", "centroid_v"),
    ).select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "centroid_v", "n")


@register(
    "cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS match_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT query_id, match_id, {_COS.format(a="qv", b="cv")} AS cosine
      FROM q JOIN c ON match_id <> query_id
    )
    SELECT query_id, match_id, cosine FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id) <= 5
    """,
    doc="Brute-force cosine top-5 for 10 query vectors — the ANN exactness "
    "baseline; corpus scanned once, queries broadcast.",
    tags=("north-star", "vectors", "bench"),
)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, "vec_id", "vec_id", "embedding", k=5
    )


@register(
    "cosine_topk_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS match_id, label, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    cent AS (
      SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) AS cv
      FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                   unnest(generate_series(1, len(embedding))) AS pos
            FROM embeddings)
      GROUP BY label, pos
    ),
    qq AS (SELECT query_id, CAST(pos AS INT) AS pos, v
           FROM (SELECT query_id, unnest(qv) AS v,
                        unnest(generate_series(1, len(qv))) AS pos FROM q)),
    qcent AS (
      SELECT query_id, label,
             round(sum(qq.v * cent.cv) /
                   (sqrt(sum(qq.v * qq.v)) * sqrt(sum(cent.cv * cent.cv))), 6) AS score
      FROM qq JOIN cent USING (pos) GROUP BY 1, 2
    ),
    probed AS (
      SELECT query_id, label FROM qcent
      QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, label) <= 2
    ),
    scored AS (
      SELECT q.query_id, c.match_id, {_COS.format(a="q.qv", b="c.cv")} AS cosine
      FROM probed p
      JOIN q ON q.query_id = p.query_id
      JOIN c ON c.label = p.label AND c.match_id <> q.query_id
    )
    SELECT query_id, match_id, cosine FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id) <= 5
    """,
    doc="IVF-style probed top-5: rank label-cell centroids per query, "
    "exact-score only the 2 nearest cells (corpus scanned ∝ nprobe/cells).",
    tags=("north-star", "vectors"),
)
def cosine_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 10),
        emb,
        "vec_id",
        "vec_id",
        "embedding",
        "label",
        k=5,
        nprobe=2,
        dim=_dim(emb),
    )


@register(
    "embedding_near_dup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    planes AS (
      SELECT p, pos,
             CAST(strpos('0123456789abcdef',
                         substring(md5(CAST(p AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1)) - 1
                  AS DOUBLE) - 7.5 AS h
      FROM (SELECT unnest(generate_series(0, 7)) AS p),
           (SELECT unnest(generate_series(1, 64)) AS pos)
    ),
    vv AS (SELECT vec_id, pos, v
           FROM (SELECT vec_id, unnest(v) AS v,
                        unnest(generate_series(1, len(v))) AS pos FROM corpus)),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
      FROM (SELECT vv.vec_id, planes.p, sum(vv.v * planes.h) AS d
            FROM vv JOIN planes ON vv.pos = planes.pos GROUP BY 1, 2)
      GROUP BY vec_id
    ),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, {_COS.format(a="a.v", b="b.v")} AS cosine
    FROM cand JOIN corpus a ON a.vec_id = id_a JOIN corpus b ON b.vec_id = id_b
    WHERE {_COS.format(a="a.v", b="b.v")} >= 0.9999
    """,
    doc="Embedding near-dup via 8-hyperplane sign-LSH buckets (md5-derived "
    "planes, no RNG) + exact cosine >= 0.9999 verify; exact-copy variants "
    "(vec_id+1M, every 10th) planted so detection has targets.",
    tags=("north-star", "vectors", "dedup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    variants = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(variants)
    return sign_lsh_near_dup_pairs(
        corpus, "vec_id", "embedding", num_planes=8, threshold=0.9999
    )
