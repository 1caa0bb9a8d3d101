"""Robot-program text source (SURVEY §2.1 S4, §2.8 F2/P2).

The reference embeds 3,124 KUKA ``LIN {X …, Y …, Z …, A …, B …, C …}``
lines in a string literal and regex-parses 6 floats per line
(``src/core/pose_filter.py:15-3143``). Spark-first: ``spark.read.text``
→ ``regexp_extract_all`` → cast → slice; the line number (recovered
with a window over a monotonic file offset, or here ``row_number``
over the original order via zipWithIndex-free trick) is the pose id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LIN_NUMBER_REGEX = r"-?\\d+\\.\\d+|-?\\d+"


def render_program(poses: DataFrame) -> DataFrame:
    """Render poses back to KUKA LIN text (the inverse, used by tests
    for round-trip checks and by the fixture generator)."""
    return poses.select(
        F.format_string(
            "LIN {X %.3f, Y %.3f, Z %.3f, A %.3f, B %.3f, C %.3f, "
            "E1 0, E2 0, E3 0, E4 0} C_DIS",
            "x", "y", "z", "a", "b", "c").alias("value"))


def parse_program(lines: DataFrame,
                  value_col: str = "value") -> DataFrame:
    """LIN text lines → (pose_id, x, y, z, a, b, c).

    Keeps only lines that parse to ≥6 numbers (P7 failure path);
    pose_id = 0-based position among parsed LIN lines, matching the
    reference's list index (pose_filter.py:3155-3158). The order
    anchor is a monotonic id captured at scan time — Spark gives no
    implicit row order, so we pin one explicitly (SURVEY §7 "what's
    hard": positional joins).
    """
    with_id = lines.select(
        F.monotonically_increasing_id().alias("file_order"),
        F.col(value_col).alias("line"))
    nums = F.expr(
        f"transform(regexp_extract_all(line, '{LIN_NUMBER_REGEX}', 0),"
        " s -> cast(s AS DOUBLE))")
    parsed = (with_id
              .filter(F.col("line").startswith("LIN "))
              .select("file_order", F.slice(nums, 1, 6).alias("nums"))
              .filter(F.size("nums") >= 6))
    w = Window.orderBy("file_order")
    return parsed.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("pose_id"),
        F.col("nums")[0].alias("x"), F.col("nums")[1].alias("y"),
        F.col("nums")[2].alias("z"), F.col("nums")[3].alias("a"),
        F.col("nums")[4].alias("b"), F.col("nums")[5].alias("c"))


def read_program(spark: SparkSession, path: str) -> DataFrame:
    """S4: read a robot program file and parse it."""
    return parse_program(spark.read.text(path))
