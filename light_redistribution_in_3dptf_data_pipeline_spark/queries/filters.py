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
    "s2_glob_filtered_views",
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
    """,
    doc="S2: glob scan with pattern — the reference's two filtered "
        "views of one image dir, glob('*_0*.JPG') for detection frames "
        "vs glob('*.JPG') for all (act_img.py:267-268). On Spark the "
        "pattern is a pathGlobFilter at listing time (pruned before "
        "any read) or an rlike predicate on the derived name column")
def glob_filtered_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    files = li.select(F.format_string("%d_%d.JPG", "l_orderkey",
                                      "l_linenumber").alias("fname"))
    detect = (files.filter(F.col("fname").rlike(r"_1\.JPG$"))
                   .agg(F.count("*").cast("bigint").alias("n_files"))
                   .select(F.lit("detect").alias("view_name"), "n_files"))
    all_v = (files.agg(F.count("*").cast("bigint").alias("n_files"))
                  .select(F.lit("all").alias("view_name"), "n_files"))
    return detect.unionByName(all_v)


@register(
    "p1_suffix_predicate",
    """
    SELECT doc_id, source
    FROM documents
    WHERE source LIKE '%1'
    """,
    doc="P1: suffix predicate, the '.JPG' filter analog "
        "(point3d_transformation.py:20)")
def suffix_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("source").endswith("1")).select("doc_id", "source")


@register(
    "p3_index_anti_filter",
    f"""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderkey NOT IN {EXCLUDED_KEYS}
    """,
    doc="P3: anti-filter on the literal missing-index list "
        "(point3d_transformation.py:129-135)")
def index_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (orders.filter(~F.col("o_orderkey").isin(list(EXCLUDED_KEYS)))
                  .select("o_orderkey", "o_orderstatus"))


@register(
    "p4_range_predicate",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    """,
    doc="P4: numeric bounds check (point3d_transformation.py:155)")
def range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_quantity").between(10, 20))
              .select("l_orderkey", "l_linenumber", "l_quantity"))


@register(
    "p5_dimension_predicate",
    """
    SELECT p_partkey, p_size
    FROM part
    WHERE p_size = 25
    """,
    doc="P5: exact-dimension predicate, the 800x800 filter analog "
        "(cut600.py:25-27)")
def dimension_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") == 25).select("p_partkey", "p_size")


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
