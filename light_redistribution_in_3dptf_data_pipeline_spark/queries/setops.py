"""Set operations (SURVEY §2.7 X1-X3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "x1_intersect_keys",
    """
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="X1: key-set intersection (extrinsic_calibration.py:349-351 "
        "pixel_keys & world_keys)")
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (customer.select(F.col("c_custkey").alias("custkey"))
            .intersect(orders.select(F.col("o_custkey").alias("custkey"))))


@register(
    "x2_except_keys",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="X2: key-set difference (point3d_transformation.py:133-135 all "
        "poses minus missing)")
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (customer.select(F.col("c_custkey").alias("custkey"))
            .subtract(orders.select(F.col("o_custkey").alias("custkey"))))


@register(
    "x3_union_tagged",
    """
    SELECT event_id, 'click' AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'purchase' AS kind FROM events
    WHERE event_type = 'purchase'
    """,
    doc="X3: union of per-slice results into one collection "
        "(extrinsic_calibration.py:128 accumulation)")
def union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = (events.filter(F.col("event_type") == "click")
                    .select("event_id", F.lit("click").alias("kind")))
    buys = (events.filter(F.col("event_type") == "purchase")
                  .select("event_id", F.lit("purchase").alias("kind")))
    return clicks.unionByName(buys)
