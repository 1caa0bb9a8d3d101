"""Set operations (SURVEY §2.7 X1-X3), one union-tagged composite.

X1 intersect and X2 except run on the customer/orders key domain; the
except branch subtracts only the *urgent-order* customers so its result
is non-empty (an all-keys subtraction would trivially return zero rows
and prove nothing). X3 is the union-of-tagged-slices pattern — and the
composite's own UNION ALL of four branches is exactly that operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "x1_x2_x3_setops",
    """
    WITH urgent AS (
      SELECT o_custkey AS key_id FROM orders
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT 'intersect' AS op, key_id FROM (
      SELECT c_custkey AS key_id FROM customer
      INTERSECT
      SELECT o_custkey AS key_id FROM orders
    )
    UNION ALL
    SELECT 'except' AS op, key_id FROM (
      SELECT c_custkey AS key_id FROM customer
      EXCEPT
      SELECT key_id FROM urgent
    )
    UNION ALL
    SELECT 'click' AS op, event_id AS key_id FROM events
    WHERE event_type = 'click'
    UNION ALL
    SELECT 'purchase' AS op, event_id AS key_id FROM events
    WHERE event_type = 'purchase'
    """,
    doc="X1+X2+X3: key-set intersection "
        "(extrinsic_calibration.py:349-351 pixel_keys & world_keys), "
        "key-set difference against the filtered urgent-customer set "
        "so the result is non-empty "
        "(point3d_transformation.py:133-135 all poses minus missing), "
        "and union-of-tagged-slices accumulation "
        "(extrinsic_calibration.py:128) — one tagged result")
def setops_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    ckeys = customer.select(F.col("c_custkey").alias("key_id"))
    okeys = orders.select(F.col("o_custkey").alias("key_id"))
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                    .select(F.col("o_custkey").alias("key_id")))
    inter = (ckeys.intersect(okeys)
             .select(F.lit("intersect").alias("op"), "key_id"))
    exc = (ckeys.subtract(urgent)
           .select(F.lit("except").alias("op"), "key_id"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.lit("click").alias("op"),
                      F.col("event_id").alias("key_id")))
    buys = (events.filter(F.col("event_type") == "purchase")
            .select(F.lit("purchase").alias("op"),
                    F.col("event_id").alias("key_id")))
    return inter.unionByName(exc).unionByName(clicks).unionByName(buys)
