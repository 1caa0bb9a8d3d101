"""Scalar functions (SURVEY §2.8 F1-F12) + text-source parsing (S4, S7).

All JVM-side built-ins — no Python UDFs; every expression stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "f5_f6_f9_s7_event_deltas",
    """
    SELECT a.event_id,
           CAST(date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00',
                a.ts) AS DOUBLE) / 1000000.0 AS s_since_epoch_start,
           CAST(extract(hour FROM a.ts) AS BIGINT) AS hour_of_day,
           CAST(date_diff('microsecond', a.ts, b.ts) AS DOUBLE)
             / 1000000.0 AS dt_seconds,
           sqrt((a.value - b.value) * (a.value - b.value)
                + (CAST(a.user_id AS DOUBLE) - CAST(b.user_id AS DOUBLE))
                  * (CAST(a.user_id AS DOUBLE) - CAST(b.user_id AS DOUBLE)))
             AS dist,
           CAST(json_extract_string(a.props, '$.k') AS BIGINT) AS json_k
    FROM events a
    JOIN events b ON b.event_id = a.event_id + 1
    """,
    doc="F5/F6+F9+S7: epoch↔timestamp conversion, second-resolution "
        "differences between consecutive events "
        "(point3d_transformation.py:22,42-43), the Euclidean "
        "distance between the paired rows "
        "(extrinsic_calibration.py:212 ||pix - proj||), and JSON "
        "field extraction from the props column (pose_filter.py:9-13 "
        "commented id→pose JSON map) — one consecutive-row self-join "
        "carries all four scalar families")
def event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    a = events.alias("a")
    b = events.alias("b")
    du = F.col("a.value") - F.col("b.value")
    dv = (F.col("a.user_id").cast("double")
          - F.col("b.user_id").cast("double"))
    return (a.join(b, F.col("b.event_id") == F.col("a.event_id") + 1)
             .select(
                 F.col("a.event_id").alias("event_id"),
                 ((F.unix_micros(F.col("a.ts")) - F.unix_micros(t0))
                  .cast("double") / F.lit(1000000.0))
                 .alias("s_since_epoch_start"),
                 F.hour(F.col("a.ts")).cast("bigint").alias("hour_of_day"),
                 ((F.unix_micros(F.col("b.ts"))
                   - F.unix_micros(F.col("a.ts"))).cast("double")
                  / F.lit(1000000.0)).alias("dt_seconds"),
                 F.sqrt(du * du + dv * dv).alias("dist"),
                 F.get_json_object(F.col("a.props"), "$.k")
                  .cast("bigint").alias("json_k")))


# Fixed 4x4 homogeneous transform (row-major), the reference's pose
# matrix pattern (point3d_transformation.py:109-120). Values chosen to
# be exactly representable so the expression arithmetic is reproducible.
T4X4 = (
    (0.5, -0.25, 0.0, 10.0),
    (0.25, 0.5, 0.0, -5.0),
    (0.0, 0.0, 1.0, 2.5),
)


@register(
    "f1_f3_f11_f15_string_array_ops",
    """
    WITH built AS (
      SELECT l_orderkey, l_linenumber,
             printf('%d_%d.JPG', l_orderkey, l_linenumber) AS fname,
             list_concat([l_quantity, l_discount, l_tax], [1.0]) AS homo
      FROM lineitem
      WHERE l_orderkey <= 400
    )
    SELECT l_orderkey, l_linenumber, fname,
           CAST(split_part(fname, '_', 1) AS BIGINT) AS parsed_stem,
           CAST(len(homo) AS BIGINT) AS n_homo,
           homo[4] AS homo_last,
           homo[2] AS second_comp,
           (homo[1] * 0.5 + homo[2] * 0.5) + homo[3] * 0.5 AS scaled_sum
    FROM built
    """,
    doc="F1+F3+F11+F15 composite (one map over lineitem): filename "
        "formatting f'{group}_{num}.JPG' (file_rename_sort.py:12) "
        "re-parsed with split_part+cast — the stem.split('_')[0] "
        "pose-id derivation (act_img.py:169) — checked end-to-end; "
        "plus array ops — hstack-ones (concat(arr, array(1.0)), the "
        "homogeneous-coordinate pattern of "
        "point3d_transformation.py:116), element slicing, and a "
        "constant-rescale fold (camera_calib.py:115-119 fx/=scale). "
        "The Spark side is a genuine array fold (transform + "
        "aggregate, left-to-right like the oracle's explicit sum)")
def string_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fname = F.format_string("%d_%d.JPG", "l_orderkey", "l_linenumber")
    arr = F.array("l_quantity", "l_discount", "l_tax")
    homo = F.concat(arr, F.array(F.lit(1.0)))
    scaled_sum = F.aggregate(
        F.transform(arr, lambda x: x * F.lit(0.5)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (li.filter(F.col("l_orderkey") <= 400)
              .select("l_orderkey", "l_linenumber",
                      fname.alias("fname"),
                      F.split_part(fname, F.lit("_"), F.lit(1))
                       .cast("bigint").alias("parsed_stem"),
                      F.size(homo).cast("bigint").alias("n_homo"),
                      F.element_at(homo, 4).alias("homo_last"),
                      F.element_at(homo, 2).alias("second_comp"),
                      scaled_sum.alias("scaled_sum")))


@register(
    "s4_robot_program_parse",
    r"""
    WITH rendered AS (
      SELECT l_orderkey, l_linenumber,
             printf('LIN {X %.3f, Y %.3f, Z %.3f, A %.3f, B %.3f, C %.3f, E1 0, E2 0} C_DIS',
                    l_quantity, l_extendedprice, l_discount,
                    l_tax, CAST(l_partkey AS DOUBLE),
                    CAST(l_suppkey AS DOUBLE)) AS line
      FROM lineitem WHERE l_orderkey <= 300
    ), parsed AS (
      SELECT l_orderkey, l_linenumber,
             list_transform(
               regexp_extract_all(line, '-?\d+\.\d+|-?\d+')[1:6],
               s -> CAST(s AS DOUBLE)) AS nums
      FROM rendered
    )
    SELECT l_orderkey, l_linenumber,
           nums[1] AS x, nums[2] AS y, nums[3] AS z,
           nums[4] AS a, nums[5] AS b, nums[6] AS c,
           0.5 * nums[1] + -0.25 * nums[2] + 0.0 * nums[3] + 10.0 AS tx,
           0.25 * nums[1] + 0.5 * nums[2] + 0.0 * nums[3] + -5.0 AS ty,
           0.0 * nums[1] + 0.0 * nums[2] + 1.0 * nums[3] + 2.5 AS tz
    FROM parsed
    """,
    doc="S4+F2+P2+F12: embedded-text source — render KUKA LIN lines, "
        "regexp_extract_all → cast → slice first 6 "
        "(pose_filter.py:15-3143), then push the parsed (x,y,z) "
        "through the 4x4 homogeneous base-frame transform as "
        "closed-form column expressions — no UDF "
        "(point3d_transformation.py:109-120 T @ [x,y,z,1])")
def robot_program_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rendered = (li.filter(F.col("l_orderkey") <= 300)
                  .select("l_orderkey", "l_linenumber",
                          F.format_string(
                              "LIN {X %.3f, Y %.3f, Z %.3f, A %.3f, "
                              "B %.3f, C %.3f, E1 0, E2 0} C_DIS",
                              "l_quantity", "l_extendedprice",
                              "l_discount", "l_tax",
                              F.col("l_partkey").cast("double"),
                              F.col("l_suppkey").cast("double"))
                          .alias("line")))
    nums = F.slice(
        F.transform(
            F.expr(r"regexp_extract_all(line, '-?\\d+\\.\\d+|-?\\d+', 0)"),
            lambda s: s.cast("double")),
        1, 6)
    parsed = rendered.select("l_orderkey", "l_linenumber",
                             nums.alias("nums"))
    x, y, z = (F.col("nums")[i] for i in range(3))
    transformed = [
        (F.lit(r0) * x + F.lit(r1) * y + F.lit(r2) * z + F.lit(t))
        .alias(name)
        for name, (r0, r1, r2, t) in zip(("tx", "ty", "tz"), T4X4)]
    return parsed.select(
        "l_orderkey", "l_linenumber",
        F.col("nums")[0].alias("x"), F.col("nums")[1].alias("y"),
        F.col("nums")[2].alias("z"), F.col("nums")[3].alias("a"),
        F.col("nums")[4].alias("b"), F.col("nums")[5].alias("c"),
        *transformed)


