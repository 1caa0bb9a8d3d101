"""Similarity search over the `embeddings` fixture (SURVEY Phase 6).

Brute-force cosine top-k is the oracle-checked baseline. Parity trick:
float32 components are cast to DECIMAL(18,9) (identical lossy rounding
in both engines), dot products and norms are then *exact* decimal sums
— order-independent — and the final cosine is one identical double
expression. No tolerance needed.

The LSH-bucketed scale path (random-hyperplane signatures) lives in
``operators/similarity.py`` and is rows-only checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

QUERY_VEC_ID = 0
TOP_K = 10


def _components(df: DataFrame) -> DataFrame:
    """Explode vectors into (vec_id, pos, comp DECIMAL(18,9)) rows —
    the relational form that scales: at 100 TB the explode is a flat
    map (no shuffle) and the dot-product groupBy shuffles once on
    vec_id, partially aggregated map-side."""
    return df.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "comp_raw"),
    ).select(
        "vec_id", "pos",
        F.col("comp_raw").cast("double").cast("decimal(18,9)").alias("comp"))


@register(
    "sim1_l2_norms",
    """
    WITH comps AS (
      SELECT vec_id,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9)) AS comp
      FROM embeddings
    )
    SELECT vec_id,
           round(sqrt(CAST(sum(comp * comp) AS DOUBLE)), 12) AS l2_norm
    FROM comps
    GROUP BY vec_id
    """,
    doc="Similarity: per-vector L2 norm via exact decimal sum of "
        "squares (F9 at array scale)")
def l2_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id",
        F.explode("embedding").alias("comp_raw")
    ).select("vec_id", F.col("comp_raw").cast("double").cast("decimal(18,9)").alias("comp"))
    return comps.groupBy("vec_id").agg(
        F.round(F.sqrt(F.sum(F.col("comp") * F.col("comp"))
                        .cast("double")), 12).alias("l2_norm"))


COSINE_TOPK_ORACLE = f"""
WITH comps AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9)) AS comp
  FROM embeddings
), q AS (
  SELECT pos, comp AS qcomp FROM comps WHERE vec_id = {QUERY_VEC_ID}
), dots AS (
  SELECT c.vec_id,
         CAST(sum(c.comp * q.qcomp) AS DOUBLE) AS dot,
         CAST(sum(c.comp * c.comp) AS DOUBLE) AS nsq
  FROM comps c JOIN q ON q.pos = c.pos
  WHERE c.vec_id <> {QUERY_VEC_ID}
  GROUP BY c.vec_id
), qn AS (
  SELECT CAST(sum(qcomp * qcomp) AS DOUBLE) AS qsq FROM q
)
SELECT vec_id, round(dot / (sqrt(nsq) * sqrt(qsq)), 12) AS cosine
FROM dots, qn
ORDER BY round(dot / (sqrt(nsq) * sqrt(qsq)), 12) DESC, vec_id
LIMIT {TOP_K}
"""


@register(
    "sim2_cosine_topk",
    COSINE_TOPK_ORACLE,
    doc="Similarity: brute-force cosine top-k against a query vector — "
        "the ANN baseline. Decimal-exact dot products; broadcast of "
        "the 64-row query side; TakeOrderedAndProject for the top-k")
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = _components(emb)
    q = (comps.filter(F.col("vec_id") == QUERY_VEC_ID)
              .select("pos", F.col("comp").alias("qcomp")))
    dots = (comps.filter(F.col("vec_id") != QUERY_VEC_ID)
                 .join(F.broadcast(q), "pos")
                 .groupBy("vec_id")
                 .agg(F.sum(F.col("comp") * F.col("qcomp")).cast("double")
                       .alias("dot"),
                      F.sum(F.col("comp") * F.col("comp")).cast("double")
                       .alias("nsq")))
    qsq = (q.agg(F.sum(F.col("qcomp") * F.col("qcomp")).cast("double")
                  .alias("qsq")))
    cosine = F.round(F.col("dot")
                     / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("qsq"))), 12)
    return (dots.crossJoin(F.broadcast(qsq))
                .select("vec_id", cosine.alias("cosine"))
                .orderBy(F.desc("cosine"), F.asc("vec_id"))
                .limit(TOP_K))


@register(
    "sim3_label_centroid_dot",
    """
    WITH comps AS (
      SELECT e.label, e.vec_id,
             generate_subscripts(e.embedding, 1) AS pos,
             CAST(CAST(unnest(e.embedding) AS DOUBLE) AS DECIMAL(18,9)) AS comp
      FROM embeddings e
    ), cent AS (
      SELECT label, pos,
             CAST(count(*) AS BIGINT) AS nv,
             CAST(sum(comp) AS DOUBLE) / count(*) AS c
      FROM comps GROUP BY label, pos
    )
    SELECT label,
           CAST(max(nv) AS BIGINT) AS n_vecs,
           round(sqrt(sum(c * c)), 9) AS centroid_norm
    FROM cent
    GROUP BY label
    """,
    doc="Similarity/IVF: per-label centroid (the coarse-quantizer "
        "training step of an IVF index) + its norm; centroid sums are "
        "decimal-exact, the 64-term norm sum is rounded to 9 dp")
def label_centroid_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select("label", "vec_id",
                       F.posexplode("embedding").alias("pos", "comp_raw")) \
               .select("label", "pos",
                       F.col("comp_raw").cast("double").cast("decimal(18,9)").alias("comp"))
    cent = comps.groupBy("label", "pos").agg(
        F.count("*").cast("bigint").alias("nv"),
        (F.sum("comp").cast("double") / F.count("*")).alias("c"))
    return cent.groupBy("label").agg(
        F.max("nv").cast("bigint").alias("n_vecs"),
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 9)
         .alias("centroid_norm"))
