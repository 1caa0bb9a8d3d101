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
        "the ANN baseline. Array-native plan: ONE scan of the big side "
        "with the query vector broadcast beside it, the 64-term dot "
        "product as an exact decimal fold per row, then "
        "TakeOrderedAndProject for the top-k. No component explode, no "
        "groupBy — the plan a 100 TB brute-force pass wants")
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import decimal_components, decimal_dot

    emb = load_table(spark, sf_dir, "embeddings")
    dec = emb.select("vec_id",
                     decimal_components(F.col("embedding")).alias("v"))
    q = (dec.filter(F.col("vec_id") == QUERY_VEC_ID)
            .select(F.col("v").alias("qv")))
    scored = (dec.filter(F.col("vec_id") != QUERY_VEC_ID)
                 .crossJoin(F.broadcast(q))
                 .select("vec_id",
                         decimal_dot(F.col("v"), F.col("qv")).alias("dot"),
                         decimal_dot(F.col("v"), F.col("v")).alias("nsq"),
                         decimal_dot(F.col("qv"), F.col("qv")).alias("qsq")))
    cosine = F.round(F.col("dot")
                     / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("qsq"))), 12)
    return (scored.select("vec_id", cosine.alias("cosine"))
                  .orderBy(F.desc("cosine"), F.asc("vec_id"))
                  .limit(TOP_K))


NEARDUP_TOP_PAIRS = 20

DX3_ORACLE = f"""
WITH comps AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9)) AS comp
  FROM embeddings
), nsq AS (
  SELECT vec_id, CAST(sum(comp * comp) AS DOUBLE) AS n2
  FROM comps GROUP BY vec_id
), dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         CAST(sum(a.comp * b.comp) AS DOUBLE) AS dot
  FROM comps a
  JOIN comps b ON b.label = a.label AND b.pos = a.pos
              AND a.vec_id < b.vec_id
  GROUP BY 1, 2, 3
)
SELECT vec_a, vec_b, CAST(label AS BIGINT) AS label,
       round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 12) AS cosine
FROM dots
JOIN nsq na ON na.vec_id = vec_a
JOIN nsq nb ON nb.vec_id = vec_b
ORDER BY round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 12) DESC, vec_a, vec_b
LIMIT {NEARDUP_TOP_PAIRS}
"""


@register(
    "dx3_embedding_cosine_neardup",
    DX3_ORACLE,
    doc="Dedup (near, embedding-cosine): top near-duplicate pairs by "
        "exact pairwise cosine *within a coarse bucket* (label = the "
        "IVF cell). Bucketing is what makes this O(sum b_i^2) instead "
        "of O(N^2) at 100 TB — all-pairs only ever happens inside a "
        "bounded bucket, and buckets shuffle independently. Decimal-"
        "exact dot products → bit-identical to the DuckDB oracle")
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import decimal_components, decimal_dot as dot

    emb = load_table(spark, sf_dir, "embeddings")
    # Array-native plan: one self-join on the bucket key (no component
    # explode shuffle); the 64-term dot product runs inside zip_with/
    # aggregate per pair-row, JVM-side, with exact DECIMAL accumulation.
    # Norms are per-VECTOR quantities — computed once on the N rows
    # before the join, not refolded on every one of the O(N²/buckets)
    # pair rows (measured 3× on the pairwise stage).
    dec = emb.select(
        "vec_id", "label",
        decimal_components(F.col("embedding")).alias("v"))
    dec = dec.withColumn("nsq", dot(F.col("v"), F.col("v")))
    a, b = dec.alias("a"), dec.alias("b")
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"),
                     F.col("a.label").cast("bigint").alias("label"),
                     dot(F.col("a.v"), F.col("b.v")).alias("dot"),
                     F.col("a.nsq").alias("na2"),
                     F.col("b.nsq").alias("nb2")))
    cosine = F.round(F.col("dot")
                     / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))), 12)
    return (pairs.select("vec_a", "vec_b", "label", cosine.alias("cosine"))
                 .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
                 .limit(NEARDUP_TOP_PAIRS))


# Fixed-point trick for sim4: comp → integer nano-units (exact BIGINT),
# centroid = per-(label,pos) SUM of those (exact BIGINT), vector·centroid
# = sum of DECIMAL(19,0) products (exact DECIMAL(38,0)). Both engines do
# identical integer arithmetic; the only float op is one final division.
SIM4_ORACLE = """
WITH comps AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9))
              * 1000000000 AS BIGINT) AS ci
  FROM embeddings
), cent AS (
  SELECT label AS clabel, pos,
         CAST(sum(ci) AS BIGINT) AS csum,
         CAST(count(*) AS BIGINT) AS nv
  FROM comps GROUP BY label, pos
), scored AS (
  SELECT c.vec_id, t.clabel,
         CAST(sum(CAST(c.ci AS DECIMAL(19,0))
                  * CAST(t.csum AS DECIMAL(19,0))) AS DOUBLE)
           / (max(t.nv) * 1e18) AS score
  FROM comps c JOIN cent t ON t.pos = c.pos
  GROUP BY c.vec_id, t.clabel
), ranked AS (
  SELECT vec_id, clabel, score,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, clabel) AS rn
  FROM scored
)
SELECT vec_id, CAST(clabel AS BIGINT) AS assigned_label,
       round(score, 9) AS score
FROM ranked WHERE rn = 1
"""


@register(
    "sim4_ivf_assign",
    SIM4_ORACLE,
    doc="Similarity/IVF: assign every vector to its nearest coarse "
        "centroid (mean-dot argmax) — the IVF probe step. Centroids "
        "are a tiny broadcast side (n_labels × dims); the big side "
        "streams through one groupBy, so the assignment is a single "
        "shuffle at any scale. Fixed-point integer arithmetic keeps "
        "Spark and DuckDB bit-identical")
def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "c")
    ).select(
        "vec_id", "label", "pos",
        (F.col("c").cast("double").cast("decimal(18,9)")
         * F.lit(1000000000)).cast("bigint").alias("ci"))
    cent = (comps.groupBy(F.col("label").alias("clabel"), "pos")
                 .agg(F.sum("ci").cast("bigint").alias("csum"),
                      F.count("*").cast("bigint").alias("nv")))
    prod = (F.col("ci").cast("decimal(19,0)")
            * F.col("csum").cast("decimal(19,0)"))
    scored = (comps.join(F.broadcast(cent), "pos")
              .groupBy("vec_id", "clabel")
              .agg((F.sum(prod).cast("double")
                    / (F.max("nv") * F.lit(1e18))).alias("score")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("clabel"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("vec_id",
                          F.col("clabel").cast("bigint")
                           .alias("assigned_label"),
                          F.round("score", 9).alias("score")))


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
