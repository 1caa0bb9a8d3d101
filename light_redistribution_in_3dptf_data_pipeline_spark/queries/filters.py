"""Projections / filters / predicates (SURVEY §2.2 P1-P7, §2.1 S1/S3).

All predicates are expressed declaratively so Catalyst pushes them into
the parquet scan (check ``PushedFilters`` in .explain) and prunes
columns (``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

EXCLUDED_KEYS = (51, 126, 722, 1414, 2203)  # reference's missing-pose ids
                                            # (point3d_transformation.py:129)


@register(
    "s1_scan_project_filter",
    """
    SELECT event_id, ts, value
    FROM events
    WHERE event_type = 'click'
    """,
    doc="S1/S3+P: pruned, pushed-down scan — projection of 3 of 6 "
        "columns with a pushed equality predicate (camera_calib.py:46 "
        "directory scan + early filtering)")
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (events.filter(F.col("event_type") == "click")
                  .select("event_id", "ts", "value"))


@register(
    "s2_p1_glob_suffix_views",
    """
    WITH files AS (
      SELECT printf('%d_%d.JPG', l_orderkey, l_linenumber) AS fname
      FROM lineitem
    )
    SELECT 'detect' AS view_name, CAST(count(*) AS BIGINT) AS n_files
    FROM files WHERE fname LIKE '%\\_1.JPG' ESCAPE '\\'
    UNION ALL
    SELECT 'all' AS view_name, CAST(count(*) AS BIGINT) AS n_files
    FROM files
    UNION ALL
    SELECT 'suffix' AS view_name, CAST(count(*) AS BIGINT) AS n_files
    FROM documents WHERE source LIKE '%1'
    """,
    doc="S2+P1: glob scan with pattern — the reference's two filtered "
        "views of one image dir, glob('*_0*.JPG') for detection frames "
        "vs glob('*.JPG') for all (act_img.py:267-268) — plus the bare "
        "suffix predicate, the '.JPG' endswith filter "
        "(point3d_transformation.py:20). On Spark the glob is a "
        "pathGlobFilter at listing time (pruned before any read) or an "
        "rlike/endswith predicate on the derived name column")
def glob_suffix_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    files = li.select(F.format_string("%d_%d.JPG", "l_orderkey",
                                      "l_linenumber").alias("fname"))
    detect = (files.filter(F.col("fname").rlike(r"_1\.JPG$"))
                   .agg(F.count("*").cast("bigint").alias("n_files"))
                   .select(F.lit("detect").alias("view_name"), "n_files"))
    all_v = (files.agg(F.count("*").cast("bigint").alias("n_files"))
                  .select(F.lit("all").alias("view_name"), "n_files"))
    suffix = (docs.filter(F.col("source").endswith("1"))
                  .agg(F.count("*").cast("bigint").alias("n_files"))
                  .select(F.lit("suffix").alias("view_name"), "n_files"))
    return detect.unionByName(all_v).unionByName(suffix)


@register(
    "p3_p4_p5_predicate_views",
    f"""
    SELECT 'p3_anti' AS pred, o_orderkey AS key_id
    FROM orders
    WHERE o_orderkey NOT IN {EXCLUDED_KEYS}
    UNION ALL
    SELECT 'p4_range' AS pred, l_orderkey * 10 + l_linenumber AS key_id
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    UNION ALL
    SELECT 'p5_dim' AS pred, p_partkey AS key_id
    FROM part
    WHERE p_size = 25
    """,
    doc="P3+P4+P5 union-tagged predicate views: index anti-filter on "
        "the literal missing-pose list "
        "(point3d_transformation.py:129-135), numeric bounds check "
        "(point3d_transformation.py:155), and the exact-dimension "
        "800x800 filter analog (cut600.py:25-27). Each branch is a "
        "pushed-down parquet predicate; the union is plan-parallel")
def predicate_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    p3 = (orders.filter(~F.col("o_orderkey").isin(list(EXCLUDED_KEYS)))
                .select(F.lit("p3_anti").alias("pred"),
                        F.col("o_orderkey").alias("key_id")))
    p4 = (li.filter(F.col("l_quantity").between(10, 20))
            .select(F.lit("p4_range").alias("pred"),
                    (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
                    .alias("key_id")))
    p5 = (part.filter(F.col("p_size") == 25)
              .select(F.lit("p5_dim").alias("pred"),
                      F.col("p_partkey").alias("key_id")))
    return p3.unionByName(p4).unionByName(p5)


@register(
    "p7_try_cast_failure_filter",
    """
    SELECT p_partkey,
           try_cast(split_part(p_brand, '#', 2) AS BIGINT) AS brand_num
    FROM part
    WHERE try_cast(split_part(p_brand, '#', 2) AS BIGINT) IS NOT NULL
    """,
    doc="P7+F4: parse-failure path via try_cast → null → filter "
        "(handlehdrgen.py:17-21 int(name) try/except)")
def try_cast_failure_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    brand_num = F.expr("try_cast(split_part(p_brand, '#', 2) AS BIGINT)")
    return (part.select("p_partkey", brand_num.alias("brand_num"))
                .filter(F.col("brand_num").isNotNull()))
