"""Aggregations (SURVEY §2.4 A1-A9 + cube/rollup capability demo).

Exactness discipline: measures are 2-decimal money in the fixtures, so
``CAST(x AS DECIMAL(18,2))`` is lossless, sums are exact integers
scaled by 100, and converting the exact sum to DOUBLE yields the same
bits in Spark and DuckDB regardless of aggregation order. Derived
doubles (averages, RMS) divide *after* the exact sum so both engines
perform the identical single floating-point operation.

Scale notes: every groupBy here benefits from Spark's partial (map-
side) aggregation automatically; high-cardinality groupBys (per-order)
shuffle once on the group key. Decimal aggregation is still codegen'd
JVM-side — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _dbl(col: F.Column) -> F.Column:
    """Exact-decimal → DOUBLE via a string round-trip. A direct
    ``CAST(decimal AS DOUBLE)`` stops being engine-portable once the
    scaled value exceeds 2^53: Spark converts correctly rounded, but
    DuckDB divides by 10^scale in floats and lands 1-2 ulp off
    (observed at sf0.1 on sumsq/sum_charge). Decimal→string is exact
    digits in both engines and string→double is correctly rounded in
    both, so this route is bit-identical at ANY magnitude. Oracles
    restate it as CAST(CAST(x AS VARCHAR) AS DOUBLE)."""
    return col.cast("string").cast("double")


@register(
    "a1_a2_collect_having",
    """
    SELECT l_orderkey,
           string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_list,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(*) >= 5
    """,
    doc="A1+A2: group + collect_list (handlehdrgen.py:14-21 paths per "
        "pose) with the HAVING count>=k complete-exposure-group filter "
        "(handlehdrgen.py:25-27) in one grouped pass; the list is "
        "sorted + joined to a string so the value-hash is "
        "order-insensitive")
def collect_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_orderkey")
              .agg(F.array_join(F.sort_array(
                       F.collect_list("l_linenumber")), ",")
                    .alias("line_list"),
                   F.count("*").cast("bigint").alias("n_lines"))
              .filter(F.col("n_lines") >= 5))


@register(
    "a4_a6_a7_a8_a9_a11_stats",
    """
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sum_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sumsq_price,
             CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
             CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
             CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
             CAST(min(l_quantity) AS DOUBLE) AS min_qty,
             CAST(max(l_quantity) AS DOUBLE) AS max_qty,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE)
               / count(*) AS order_mean
      FROM lineitem GROUP BY l_orderkey
    ), mm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(order_mean AS DECIMAL(18,6)))
                       AS VARCHAR) AS DOUBLE)
               / count(*) AS mean_of_means
      FROM per_order
    ), resid AS (
      SELECT CAST(count(*) AS BIGINT) AS n_residuals,
             CAST(CAST(sum(CAST(r AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS sum_residuals
      FROM (SELECT unnest([l_quantity, l_discount, l_tax]) AS r
            FROM lineitem)
    )
    SELECT n, sum_price, min_price, max_price,
           sum_price / n AS mean_price,
           sqrt(sumsq_price / n) AS rms_price,
           sqrt((sumsq_price - sum_price * sum_price / n) / n)
             AS std_price,
           median_qty, min_qty, max_qty, n_parts, n_supps,
           n_orders, mean_of_means, n_residuals, sum_residuals
    FROM s, mm, resid
    """,
    doc="A4+A6+A7+A8+A9+A11 composite (each side is a single-row "
        "aggregate; the cross joins are free): descriptive stats — "
        "mean/std/min/max/RMS from exact decimal sums "
        "(extrinsic_calibration.py:216-226) plus the exact "
        "interpolated median (:222), the one engine-difference risk "
        "(interpolation arithmetic); global per-column ranges "
        "(calculate.py:30-52) and distinct-key counts "
        "(act_img.py:313-314 — at 100 TB prefer "
        "approx_count_distinct, demo'd rows-only in a12); the "
        "two-level mean-of-means — overall reprojection error as "
        "mean of per-image means (camera_calib.py:104-113), inner "
        "mean re-stabilized to DECIMAL(18,6) so the outer sum is "
        "exact; and A9's explode-then-reaccumulate residual "
        "collection (solvepnp_ba.py:31-45 error concat)")
def descriptive_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The distinct counts run as their OWN single-column aggregates,
    # not inside the wide agg: two countDistincts in one agg make
    # Spark Expand every input row 3x through all aggregation buffers
    # (including the sort-based percentile) — measured 4x slower at
    # sf0.1, and at 100 TB the expand triples the shuffle. Split, each
    # is a two-stage partial-distinct on a pruned one-column scan, and
    # the one-row crossJoins are free.
    s = li.agg(
        F.count("*").cast("bigint").alias("n"),
        _dbl(F.sum(_dec("l_extendedprice"))).alias("sum_price"),
        _dbl(F.sum(_dec("l_extendedprice") * _dec("l_extendedprice")))
         .alias("sumsq_price"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        F.expr("percentile(l_quantity, 0.5)").cast("double")
         .alias("median_qty"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )
    parts = li.agg(F.countDistinct("l_partkey").cast("bigint")
                    .alias("n_parts"))
    supps = li.agg(F.countDistinct("l_suppkey").cast("bigint")
                    .alias("n_supps"))
    s = s.crossJoin(parts).crossJoin(supps).select(
        "n", "sum_price", "min_price", "max_price",
        (F.col("sum_price") / F.col("n")).alias("mean_price"),
        F.sqrt(F.col("sumsq_price") / F.col("n")).alias("rms_price"),
        F.sqrt((F.col("sumsq_price")
                - F.col("sum_price") * F.col("sum_price") / F.col("n"))
               / F.col("n")).alias("std_price"),
        "median_qty", "min_qty", "max_qty", "n_parts", "n_supps",
    )
    per_order = li.groupBy("l_orderkey").agg(
        (_dbl(F.sum(_dec("l_extendedprice"))) / F.count("*"))
        .alias("order_mean"))
    mm = per_order.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        (_dbl(F.sum(F.col("order_mean").cast("decimal(18,6)")))
         / F.count("*")).alias("mean_of_means"))
    resid = (li.select(F.explode(F.array("l_quantity", "l_discount",
                                         "l_tax")).alias("r"))
               .agg(F.count("*").cast("bigint").alias("n_residuals"),
                    _dbl(F.sum(F.col("r").cast("decimal(18,2)")))
                     .alias("sum_residuals")))
    return s.crossJoin(mm).crossJoin(resid)


@register(
    "a5_a10_pricing_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))))
                     AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         * (1 + CAST(l_tax AS DECIMAL(18,2))))
                     AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE)
             / count(*) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="A3+A5 + cube composite: TPC-H-Q1-style pricing summary — "
        "grouped exact-decimal sums + derived means over several "
        "measure columns at once: the column-wise vector mean "
        "(extrinsic_calibration.py:72-73 mean rvec/tvec over "
        "components) and the per-group mean "
        "(extrinsic_calibration.py:213-214 per-pose mean error) — "
        "computed under CUBE grouping sets (SURVEY §2.4 note), so "
        "the non-null group rows ARE the former a5 result and the "
        "subtotal/grand-total rows exercise the rollup capability in "
        "the same oracle-checked pass. Group columns are non-null in "
        "the fixtures, so grouping-set NULLs are unambiguous. "
        "Two-level shape: CUBE directly on the table Expands every "
        "input row 4x through the decimal buffers (measured 3.4x "
        "slower); instead the finest-grain groupBy aggregates once "
        "and the CUBE re-aggregates the tiny partial — exact because "
        "decimal sums and counts re-aggregate losslessly, and the "
        "only full-table pass is a plain partial-agg shuffle")
def pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("_qty"),
        F.sum(_dec("l_extendedprice")).alias("_base"),
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
         .alias("_disc"),
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))
              * (one + _dec("l_tax"))).alias("_charge"),
        F.count("*").alias("_n"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        _dbl(F.sum("_qty")).alias("sum_qty"),
        _dbl(F.sum("_base")).alias("sum_base_price"),
        _dbl(F.sum("_disc")).alias("sum_disc_price"),
        _dbl(F.sum("_charge")).alias("sum_charge"),
        (_dbl(F.sum("_qty")) / F.sum("_n")).alias("avg_qty"),
        F.sum("_n").cast("bigint").alias("count_order"),
    )


A12_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_ok,
       TRUE AS median_ok
FROM events
GROUP BY event_type
"""


@register(
    "a12_approx_sketches", A12_ORACLE,
    doc="A8 at scale: sketch aggregates — approx_count_distinct "
        "(HLL++, rsd=0.02) and percentile_approx (accuracy=10000) per "
        "group. Raw sketch estimates are engine-specific by design, so "
        "the checkable contract is the published ERROR BOUND, emitted "
        "as BOOLEAN verdicts: |approx−exact|/exact ≤ 5·rsd for the "
        "distinct count, and the approx median landing inside the "
        "exact 0.45–0.55 quantile envelope (rank error ≤ 1/accuracy = "
        "1e-4 ≪ 0.05). The oracle hard-checks n and exact_users in "
        "DuckDB and restates the verdicts as constant TRUE — a Spark "
        "run whose sketches drift past their bound turns a row red. "
        "Sketches are the 100 TB answer when exact distinct/median "
        "would shuffle the full key set; here the exact counterparts "
        "run beside them only to score the verdicts")
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = (events.groupBy("event_type")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.countDistinct("user_id").cast("bigint")
                 .alias("exact_users"),
                F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                F.percentile_approx("value", 0.5, 10000)
                 .alias("approx_median"),
                F.expr("percentile(value, array(0.45, 0.55))")
                 .alias("bounds")))
    return agg.select(
        "event_type", "n", "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         .cast("double") / F.col("exact_users") <= F.lit(0.10))
        .alias("users_ok"),
        ((F.col("approx_median") >= F.element_at("bounds", 1))
         & (F.col("approx_median") <= F.element_at("bounds", 2)))
        .alias("median_ok"))
