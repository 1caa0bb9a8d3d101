"""Approximate-nearest-neighbor search: LSH-bucketed cosine top-k.

The brute-force baseline (queries/similarity.py sim1_sim2) scans every
vector per query — O(N·d). The scale path here:

1. **Random-hyperplane LSH**: J pseudo-random ±1 hyperplanes (derived
   deterministically from ``xxhash64(plane, dim)`` — no stored model,
   identical on every executor). Bucket id = J-bit sign pattern of the
   dot products. ARRAY-NATIVE: all J dots are per-row folds over the
   embedding array (transform + aggregate, JVM codegen) — zero
   explode, zero extra shuffle; the signature stage is a pure map.
   Components are fixed-point BIGINT nano-units, so each dot is an
   exact integer and the sign bit can never flip between runs or
   engines (no order-dependent float summation).
2. Candidates = vectors in the query's bucket **plus all Hamming-1
   neighbor buckets** (flip each of the J bits) for recall; exact
   cosine re-ranking only within that small set.

At 100 TB the bucket column becomes the partition key of the stored
index table, so a query prunes to J+1 of 2^J partitions
(predicate-pushdown on bucket id) instead of a full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries.registry import register

NUM_PLANES = 8
QUERY_VEC_ID = 0
TOP_K = 10


def _sign_bit(plane: int, pos: Column) -> Column:
    """Deterministic hyperplane sign selector for (plane, dim):
    True → +1, False → -1. Same bit stream as round 1's
    ``_sign_component`` (xxhash64 >> 3 & 1)."""
    return (F.shiftright(F.xxhash64(F.lit(plane), pos), 3)
            .bitwiseAND(F.lit(1)) == 1)


def _fixed_point(vec: Column) -> Column:
    """float components → exact BIGINT nano-units (|c| ≤ ~10 ⇒ a
    64-term signed sum stays far below 2^63 — overflow-free)."""
    return F.transform(
        vec, lambda x: (x.cast("double").cast("decimal(18,9)")
                        * F.lit(1000000000)).cast("bigint"))


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding",
                num_planes: int = NUM_PLANES) -> DataFrame:
    """(id, bucket) — J-bit random-hyperplane signature per vector,
    computed entirely inside the row: for each plane j, the signed
    fold  sum_i ±ci_i  (sign from xxhash64(j, i)), then the J sign
    bits packed into one BIGINT. A pure map — no explode, no join,
    no shuffle."""
    ci = _fixed_point(F.col(vec_col))

    def signed_term(j):
        # factory so each plane's lambda closes over its own j
        return lambda x, i: F.when(_sign_bit(j, i), x).otherwise(-x)

    bucket = None
    for j in range(num_planes):
        dot_j = F.aggregate(
            F.transform(ci, signed_term(j)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x)
        bit = F.when(dot_j > 0, F.lit(1).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, j)
        bucket = term if bucket is None else bucket + term
    return emb.select(id_col, bucket.alias("bucket"))


def bucket_histogram(emb: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(bucket, n_vecs) occupancy — the skew diagnostic you run before
    choosing the partition key at scale."""
    return (lsh_buckets(emb, id_col, vec_col)
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_vecs")))


def ann_cosine_topk(emb: DataFrame, query_id: int = QUERY_VEC_ID,
                    k: int = TOP_K,
                    num_planes: int = NUM_PLANES) -> DataFrame:
    """Bucketed ANN: exact cosine re-ranking inside the query's LSH
    bucket and its Hamming-1 neighbors. Returns
    (vec_id, cosine, bucket, bucket_occupancy)."""
    from ..functions import decimal_components, decimal_dot

    buckets = lsh_buckets(emb, num_planes=num_planes)
    occupancy = (buckets.groupBy("bucket")
                 .agg(F.count("*").cast("bigint")
                      .alias("bucket_occupancy")))

    # query bucket + its J Hamming-1 neighbors, as a tiny exploded set
    probe = (buckets.filter(F.col("vec_id") == query_id)
             .select(F.explode(F.array(
                 F.col("bucket"),
                 *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
                   for j in range(num_planes)])).alias("bucket")))
    cands = (buckets.join(F.broadcast(probe), "bucket")
                    .filter(F.col("vec_id") != query_id))

    dec = emb.select("vec_id",
                     decimal_components(F.col("embedding")).alias("v"))
    q = (dec.filter(F.col("vec_id") == query_id)
            .select(F.col("v").alias("qv"),
                    decimal_dot(F.col("v"), F.col("v")).alias("qsq")))
    scored = (dec.join(cands, "vec_id")
                 .crossJoin(F.broadcast(q))
                 .select("vec_id", "bucket",
                         decimal_dot(F.col("v"), F.col("qv")).alias("dot"),
                         decimal_dot(F.col("v"), F.col("v")).alias("nsq"),
                         "qsq"))
    cosine = F.col("dot") / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("qsq")))
    return (scored.join(F.broadcast(occupancy), "bucket")
            .select("vec_id", F.round(cosine, 9).alias("cosine"),
                    "bucket", "bucket_occupancy")
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def ivf_search_topk(emb: DataFrame, query_id: int = QUERY_VEC_ID,
                    k: int = TOP_K, nprobe: int = 2,
                    cell_col: str = "label") -> DataFrame:
    """IVF probe search — the other half of the sim3/sim4 IVF story:
    coarse-quantize (per-cell centroids, one wide aggregate), rank the
    query's ``nprobe`` nearest cells by centroid dot product, then
    exact cosine re-rank ONLY inside those cells.

    Scale shape: the centroid table is L rows (broadcast); the probe
    set is ``nprobe`` cell ids (broadcast semi-join). With the corpus
    stored partitioned by cell id, the semi-join becomes partition
    pruning — a query touches nprobe/L of the data instead of a full
    scan (the IVF index contract). Returns (vec_id, cosine, cell).

    Arithmetic is the engine's fixed-point discipline (nano-unit
    BIGINT components, int64 hi/lo dot folds, sim3/dx3 pattern), so
    the whole search — cell ranking AND re-rank scores — is exactly
    restatable in ANSI SQL; see IVF_PROBE_ORACLE.
    """
    from ..queries.similarity import _fixed_dot

    dec = emb.select("vec_id", F.col(cell_col).alias("cell"),
                     _fixed_point(F.col("embedding")).alias("ci"))
    q = (dec.filter(F.col("vec_id") == query_id)
            .select(F.col("ci").alias("qci"),
                    (_fixed_dot("ci", "ci").cast("double")
                     / F.lit(1e18)).alias("qsq")))

    # train: per-cell centroid sums via one wide aggregate (exact
    # int64: |Σci| ≤ nv·2^31); centroid·query divides by the cell
    # count only to report a mean-scaled score — the /nv rescale is
    # per-cell, so ranking mirrors the oracle exactly, not just up to
    # scale. split 2^20 in the fold is valid while nv ≤ ~32k per cell
    # (beyond that: sample per cell to train, standard IVF practice).
    csum = (dec.groupBy("cell")
            .agg(F.array(*[
                F.sum(F.element_at("ci", i + 1)).alias(f"s{i}")
                for i in range(64)]).alias("csum"),
                F.count("*").cast("bigint").alias("nv")))
    probe = (csum.crossJoin(F.broadcast(q.select("qci")))
             .select("cell",
                     (_fixed_dot("qci", "csum", split=1 << 20)
                      .cast("double") / (F.col("nv") * F.lit(1e18)))
                     .alias("cdot"))
             .orderBy(F.desc("cdot"), F.asc("cell"))
             .limit(nprobe)
             .select("cell"))

    cands = dec.join(F.broadcast(probe), "cell", "left_semi") \
               .filter(F.col("vec_id") != query_id)
    scored = (cands.crossJoin(F.broadcast(q))
              .select("vec_id", "cell",
                      (_fixed_dot("ci", "qci").cast("double")
                       / F.lit(1e18)).alias("dot"),
                      (_fixed_dot("ci", "ci").cast("double")
                       / F.lit(1e18)).alias("nsq"),
                      "qsq"))
    cosine = F.round(F.col("dot")
                     / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("qsq"))), 9)
    return (scored.select("vec_id", cosine.alias("cosine"),
                          F.col("cell").cast("bigint").alias("cell"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


# Exact SQL restatement of ivf_search_topk (defaults: query 0, k=10,
# nprobe=2): fixed-point nano-unit components, exact integer dots
# (DECIMAL(19,0) products — the engine's int64 hi/lo fold recombines
# to the same value), identical final float expressions.
IVF_PROBE_ORACLE = f"""
WITH comps AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9))
              * 1000000000 AS BIGINT) AS ci
  FROM embeddings
), q AS (
  SELECT pos, ci AS qci FROM comps WHERE vec_id = {QUERY_VEC_ID}
), qn AS (
  SELECT CAST(sum(CAST(qci AS DECIMAL(19,0)) * CAST(qci AS DECIMAL(19,0)))
              AS DOUBLE) / 1e18 AS qsq
  FROM q
), cent AS (
  SELECT label, pos, CAST(sum(ci) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS nv
  FROM comps GROUP BY label, pos
), cdot AS (
  SELECT c.label,
         CAST(sum(CAST(c.s AS DECIMAL(19,0)) * CAST(q.qci AS DECIMAL(19,0)))
              AS DOUBLE) / (max(c.nv) * 1e18) AS cdot
  FROM cent c JOIN q ON q.pos = c.pos
  GROUP BY c.label
), probe AS (
  SELECT label FROM cdot ORDER BY cdot DESC, label LIMIT 2
), dots AS (
  SELECT ca.vec_id, ca.label,
         CAST(sum(CAST(ca.ci AS DECIMAL(19,0)) * CAST(q.qci AS DECIMAL(19,0)))
              AS DOUBLE) / 1e18 AS dot,
         CAST(sum(CAST(ca.ci AS DECIMAL(19,0)) * CAST(ca.ci AS DECIMAL(19,0)))
              AS DOUBLE) / 1e18 AS nsq
  FROM comps ca
  JOIN probe p ON p.label = ca.label
  JOIN q ON q.pos = ca.pos
  WHERE ca.vec_id <> {QUERY_VEC_ID}
  GROUP BY 1, 2
)
SELECT vec_id,
       round(dot / (sqrt(nsq) * sqrt(qn.qsq)), 9) AS cosine,
       CAST(label AS BIGINT) AS cell
FROM dots, qn
ORDER BY round(dot / (sqrt(nsq) * sqrt(qn.qsq)), 9) DESC, vec_id
LIMIT {TOP_K}
"""


@register(
    "sx3_ivf_probe_topk", IVF_PROBE_ORACLE,
    doc="Similarity scale path, ORACLE-CHECKED: the IVF probe search "
        "(rank cells by centroid dot, exact cosine re-rank inside the "
        "nprobe nearest cells only — the partition-pruning index "
        "contract at 100 TB). Unlike the LSH rows this is fully "
        "deterministic data-derived math (labels are data, centroids "
        "are means), so the whole search is restated in SQL and the "
        "driver hash-checks both the pruning decision and the scores")
def ivf_probe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_search_topk(emb)


@register(
    "sx1_sx2_ann_lsh_topk", None,
    doc="Similarity scale path: random-hyperplane LSH bucketing "
        "(array-native per-row folds — zero explode/shuffle before "
        "the bucket join; fixed-point dots so bucket bits are "
        "deterministic) + Hamming-1 neighbor probing + in-bucket "
        "exact cosine re-rank, with each hit's bucket occupancy (the "
        "sx2 histogram fold-in, the skew diagnostic for the partition "
        "key). Rows-only: xxhash64-derived hyperplanes are engine-"
        "specific. Recall vs sim1_sim2 brute force asserted in tests")
def ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_cosine_topk(emb)
