"""Joins (SURVEY §2.3 J1-J6).

Join-strategy notes for 100 TB:
- J1/J2: fact-to-fact joins shuffle on the key; the filtered/dim side is
  broadcast (explicit ``F.broadcast``) so only the big side scans.
- J3: the generated side is tiny → broadcast; the row_number side needs
  a total order — at scale, derive the index from a monotonic key
  arithmetic instead of a global sort when the key is dense.
- J4/J6: semi/anti joins never materialize the probe side's payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "j1_fanout_broadcast_join",
    """
    SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_partkey
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    doc="J1: 1→N fan-out equi-join on derived key, small side broadcast "
        "(act_img.py:292-295 pose→5 exposures)")
def fanout_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
                   .select("o_orderkey", "o_orderpriority")
    return (li.join(F.broadcast(urgent),
                    li.l_orderkey == urgent.o_orderkey)
              .select("o_orderkey", "o_orderpriority",
                      "l_linenumber", "l_partkey"))


@register(
    "j2_key_intersection_join",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_spend
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="J2: inner join on intersecting key sets + grouped agg "
        "(extrinsic_calibration.py:349-360 pixel∩world)")
def key_intersection_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (orders.join(F.broadcast(customer),
                        orders.o_custkey == customer.c_custkey)
                  .groupBy("c_custkey", "c_name")
                  .agg(F.count("*").cast("bigint").alias("n_orders"),
                       F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                        .cast("double").alias("total_spend")))


@register(
    "j3_positional_index_join",
    """
    WITH numbered AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
      FROM orders
    )
    SELECT g.idx, g.gen_val, n.o_orderkey, n.o_totalprice
    FROM (SELECT CAST(s.g AS BIGINT) AS idx,
                 CAST(s.g AS DOUBLE) * 1.5 AS gen_val
          FROM generate_series(0, 99) s(g)) g
    JOIN numbered n ON n.idx = g.idx
    """,
    doc="J3: positional join — generated sequence index ↔ row_number of "
        "a deterministically ordered table "
        "(point3d_transformation.py:148-163 dict-key→list-index)")
def positional_index_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    numbered = orders.select(
        "o_orderkey", "o_totalprice",
        (F.row_number().over(w) - 1).cast("bigint").alias("idx"))
    gen = spark.range(0, 100).select(
        F.col("id").cast("bigint").alias("idx"),
        (F.col("id").cast("double") * 1.5).alias("gen_val"))
    return (numbered.join(F.broadcast(gen), "idx")
                    .select("idx", "gen_val", "o_orderkey", "o_totalprice"))


@register(
    "j4_j6_semi_anti_join",
    """
    WITH urgent AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT 'semi' AS side, c.c_custkey, c.c_name
    FROM customer c
    SEMI JOIN urgent u ON u.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'anti' AS side, c.c_custkey, c.c_name
    FROM customer c
    ANTI JOIN urgent u ON u.o_custkey = c.c_custkey
    """,
    doc="J4+J6: existence semi-join and its anti complement against a "
        "FILTERED probe (urgent orders) so both branches are non-empty "
        "and the result partitions the customer table exactly "
        "(point3d_transformation.py:133-135 exclude-missing; "
        ":149-156 process-if-present). Semi/anti never materialize "
        "the probe payload; at scale the filtered probe side is "
        "broadcast-sized")
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                    .select("o_custkey"))
    semi = (customer.join(urgent, customer.c_custkey == urgent.o_custkey,
                          "left_semi")
                    .select(F.lit("semi").alias("side"),
                            "c_custkey", "c_name"))
    anti = (customer.join(urgent, customer.c_custkey == urgent.o_custkey,
                          "left_anti")
                    .select(F.lit("anti").alias("side"),
                            "c_custkey", "c_name"))
    return semi.unionByName(anti)


@register(
    "j7_j8_temporal_joins",
    """
    WITH l AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ), asof_side AS (
      SELECT l.user_id, l.ts, l.event_id, r.purchase_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND r.ts <= l.ts
    ), intervals AS (
      SELECT p_partkey, p_retailprice - 3.0 AS lo, p_retailprice + 3.0 AS hi
      FROM part WHERE p_partkey <= 40
    ), rng AS (
      SELECT i.p_partkey, e.event_id, e.value
      FROM events e JOIN intervals i
        ON e.value * 10.0 BETWEEN i.lo AND i.hi
    )
    SELECT 'asof' AS side, event_id, CAST(user_id AS BIGINT) AS key,
           ts, purchase_value AS val
    FROM asof_side
    UNION ALL
    SELECT 'range' AS side, event_id, CAST(p_partkey AS BIGINT) AS key,
           CAST(NULL AS TIMESTAMP) AS ts, value AS val
    FROM rng
    """,
    doc="J7+J8 composite (custom operators Spark lacks natively), "
        "union-tagged like j4_j6. ASOF side: every click gains the "
        "user's most recent purchase value at or before it — the "
        "union-tag + per-key window formulation (ONE shuffle on the "
        "key, no range condition near a join operator, so no "
        "nested-loop blowup at scale; operators/temporal_joins.py); "
        "oracle is DuckDB's native ASOF LEFT JOIN, right side deduped "
        "per (key, ts) so the match is well-defined in both engines. "
        "RANGE side: probes matched to overlapping intervals by "
        "exploding intervals into fixed-width bins and equi-joining "
        "on the bin key, then exact-filtering — hash join instead of "
        "the nested loop Spark would otherwise plan for a pure range "
        "predicate")
def temporal_joins_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_joins import asof_join, binned_range_join

    events = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")

    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id"))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.max("value").alias("purchase_value")))
    asof = (asof_join(clicks, purchases, key="user_id", ts="ts",
                      payload=["purchase_value"], suffix="")
            .select(F.lit("asof").alias("side"), "event_id",
                    F.col("user_id").cast("bigint").alias("key"),
                    "ts", F.col("purchase_value").alias("val")))

    probes = events.select("event_id",
                           (F.col("value") * 10.0).alias("scaled"),
                           "value")
    intervals = (part.filter(F.col("p_partkey") <= 40)
                 .select("p_partkey",
                         (F.col("p_retailprice") - 3.0).alias("lo"),
                         (F.col("p_retailprice") + 3.0).alias("hi")))
    rng = (binned_range_join(probes, intervals, "scaled", "lo", "hi",
                             bin_width=8.0)
           .select(F.lit("range").alias("side"), "event_id",
                   F.col("p_partkey").cast("bigint").alias("key"),
                   F.lit(None).cast("timestamp").alias("ts"),
                   F.col("value").alias("val")))
    return asof.unionByName(rng)
