"""Sorts / limits / top-k (SURVEY §2.6 T1-T5).

Scale notes: ``orderBy().limit(k)`` plans as TakeOrderedAndProject —
each partition keeps its local top-k, only k×partitions rows reach the
driver-side merge; no global sort materializes. T1's global sort is a
range-partitioned exchange (sampled boundaries), the one case where a
total order is genuinely required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "t1_global_sort_rank",
    """
    SELECT event_id, ts,
           CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT)
             AS time_rank
    FROM events
    """,
    doc="T1: global sort by timestamp, materialized as a rank column "
        "so the hash check captures the order "
        "(point3d_transformation.py:24). Scale-out form: rank = "
        "per-hour-bucket row_number + broadcast prefix-sum offsets "
        "(operators/prefix_sum.py), then a range-partitioned orderBy "
        "for the output order — no single-task global window")
def global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix_sum import bucketed_row_number

    events = load_table(spark, sf_dir, "events")
    numbered = bucketed_row_number(
        events, F.date_trunc("hour", F.col("ts")), ["ts", "event_id"],
        out="time_rank")
    return (numbered.select("event_id", "ts", "time_rank")
                    .orderBy("time_rank"))


@register(
    "t2_t3_t5_topk_order_sample",
    """
    SELECT 'topk' AS method, o_orderkey AS key_num,
           CAST(o_totalprice AS DOUBLE) AS metric,
           CAST(NULL AS VARCHAR) AS source
    FROM (SELECT o_orderkey, o_totalprice
          FROM orders
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 10)
    UNION ALL
    SELECT 'head' AS method, key_num, CAST(NULL AS DOUBLE) AS metric,
           source
    FROM (SELECT CAST(doc_id AS BIGINT) AS key_num, source
          FROM documents
          ORDER BY CAST(doc_id AS BIGINT)
          LIMIT 20)
    """,
    doc="T2+T3+T5 in one tagged union: top-k with full tie-break — 10 "
        "worst poses analog (extrinsic_calibration.py:237-240) — plus "
        "the deterministic head sample under *numeric* key order (the "
        "first row is the numerically-first key, calculate.py:56 "
        "sorted(keys,key=int)[0]; the 20-row limit is the first-20-"
        "poses PnP init sample, extrinsic_calibration.py:41-42). Both "
        "branches plan as TakeOrderedAndProject — per-partition local "
        "top-k, k×partitions rows to the driver merge, no global sort")
def topk_order_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    topk = (orders.select("o_orderkey", "o_totalprice")
                  .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
                  .limit(10)
                  .select(F.lit("topk").alias("method"),
                          F.col("o_orderkey").alias("key_num"),
                          F.col("o_totalprice").cast("double")
                           .alias("metric"),
                          F.lit(None).cast("string").alias("source")))
    docs = load_table(spark, sf_dir, "documents")
    head = (docs.select(F.col("doc_id").cast("bigint").alias("key_num"),
                        "source")
                .orderBy("key_num").limit(20)
                .select(F.lit("head").alias("method"), "key_num",
                        F.lit(None).cast("double").alias("metric"),
                        "source"))
    return topk.unionByName(head)


@register(
    "t4_argmin_argmax",
    """
    SELECT l_orderkey,
           arg_min(l_partkey, l_extendedprice * 1000 + l_linenumber)
             AS cheapest_part,
           arg_max(l_partkey, l_extendedprice * 1000 + l_linenumber)
             AS priciest_part
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="T4: argmin/argmax by expression — corner classification "
        "TL=argmin(x+y) etc. (pixel_processing.py:51-62); the ranking "
        "expression embeds the unique l_linenumber so ties are "
        "impossible and min_by is deterministic")
def argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_extendedprice") * 1000 + F.col("l_linenumber")
    return li.groupBy("l_orderkey").agg(
        F.min_by("l_partkey", key).alias("cheapest_part"),
        F.max_by("l_partkey", key).alias("priciest_part"))


