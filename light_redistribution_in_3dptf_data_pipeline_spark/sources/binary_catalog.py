"""Binary file-corpus source (SURVEY §2.1 S1-S3, §2.9 multimodal).

The reference's "database" of images is a directory where identity
lives in the filename ``{pose_id}_{exposure_idx}.JPG``
(``src/core/file_rename_sort.py:12``, ``src/core/act_img.py:267-268``).
Spark-first equivalent: ``binaryFile`` scan → derived key columns →
a *file catalog* DataFrame that every downstream stage joins/groups on.

Scale notes:
- ``pathGlobFilter`` prunes at listing time (S2's two glob views cost
  one listing each, no content read).
- Metadata-only pipelines (sessionization, group counting) must never
  touch ``content``: select pruning drops the binary column, so the
  scan reads file status only.
- Content-bearing stages repartition by ``pose_id`` so one task owns
  one pose's exposure bracket (the applyInPandas HDR-merge pattern).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType


def scan_files(spark: SparkSession, path: str,
               glob: str | None = None,
               with_content: bool = False) -> DataFrame:
    """S1/S2: directory scan as a DataFrame. Column-prunes away the
    binary payload unless asked for (metadata-only reads stat files,
    never opens them)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    cols = ["path", "modificationTime", "length"]
    if with_content:
        cols.append("content")
    return df.select(*cols)


def file_catalog(files: DataFrame) -> DataFrame:
    """Derive the reference's filename-encoded keys:
    stem ``{pose_id}_{exposure_idx}`` (act_img.py:169, F1/F4) with
    try_cast null-on-parse-failure semantics (P7)."""
    stem = F.element_at(F.split(F.element_at(F.split("path", "/"), -1),
                                r"\."), 1)
    return files.select(
        "*",
        F.expr(
            "try_cast(split_part(split_part(element_at(split(path, '/'), -1),"
            " '.', 1), '_', 1) AS INT)").alias("pose_id"),
        F.expr(
            "try_cast(split_part(split_part(element_at(split(path, '/'), -1),"
            " '.', 1), '_', 2) AS INT)").alias("exposure_idx"),
        stem.alias("stem"),
    )


def exposure_groups(catalog: DataFrame,
                    expected: int = 5) -> DataFrame:
    """A1/A2: exposure-bracket groups per pose with completeness flag
    (handlehdrgen.py:14-27): only complete groups feed HDR merge."""
    return (catalog
            .filter(F.col("pose_id").isNotNull())
            .groupBy("pose_id")
            .agg(F.sort_array(F.collect_list("path")).alias("paths"),
                 F.count("*").cast("int").alias("n_exposures"),
                 F.min("modificationTime").alias("first_ts"),
                 F.max("modificationTime").alias("last_ts"))
            .withColumn("complete", F.col("n_exposures") >= expected))


MetadataExtractor = Callable[[str, int], dict[str, str]]

# The reference's 5-bracket exposure ladder (calculate.py:107):
# new exposure time per position within a sorted 5-image group.
EXPOSURE_LADDER = (1 / 200, 1 / 800, 1 / 400, 1 / 100, 1 / 50)


def fake_exif_extract(path: str, length: int) -> dict[str, str]:
    """Deterministic stand-in for ``piexif.load`` (act_img.py:224):
    derives an EXIF-analog tag map from file identity. Same file →
    same map, so rewrite round-trips are testable without PIL/piexif."""
    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    return {
        "Make": "FAKE",
        "Model": "SEAM-1",
        "ExposureTime": f"{(length % 500) + 1}/1000000",
        "ISOSpeedRatings": str(100 * (1 + length % 4)),
        "ImageStem": stem,
    }


def with_metadata(catalog: DataFrame,
                  extractor: MetadataExtractor = fake_exif_extract
                  ) -> DataFrame:
    """S9 (read half): attach a ``metadata MAP<STRING,STRING>`` column —
    the EXIF tag dict of ``src/core/act_img.py:222-225`` as a first-
    class Spark column. The extractor is a seam like the image decoder:
    production injects a piexif-backed function over ``content``;
    the default derives deterministic tags from (path, length)."""
    @F.pandas_udf(MapType(StringType(), StringType()))
    def extract(path: pd.Series, length: pd.Series) -> pd.Series:
        return pd.Series([extractor(p, int(n))
                          for p, n in zip(path, length)])

    return catalog.withColumn("metadata",
                              extract(F.col("path"), F.col("length")))


def rewrite_metadata_key(df: DataFrame, key: str,
                         value_col: str) -> DataFrame:
    """S9 (write half): rewrite ONE key of the ``metadata`` map from
    ``value_col``, preserving every other tag — the load→mutate→dump
    EXIF round-trip of ``src/core/act_img.py:222-247`` /
    ``calculate.py:118-126`` as an Arrow-batched pandas_udf. Null
    values in ``value_col`` leave the row's metadata untouched (the
    reference's skip-incomplete-group path, calculate.py:108-110)."""
    @F.pandas_udf(MapType(StringType(), StringType()))
    def rewrite(meta: pd.Series, value: pd.Series) -> pd.Series:
        out = []
        for m, v in zip(meta, value):
            tags = dict(m) if m is not None else {}
            if v is not None:
                tags[key] = v
            out.append(tags)
        return pd.Series(out)

    return df.withColumn(
        "metadata", rewrite(F.col("metadata"), F.col(value_col)))


def batch_set_exposure_times(catalog: DataFrame,
                             exposures: tuple[float, ...] = EXPOSURE_LADDER,
                             group_size: int = 5) -> DataFrame:
    """S9 batch rewrite (``src/core/calculate.py:96-133``): sort files
    by name, chunk into ``group_size`` groups, set position *i*'s
    ExposureTime to ``exposures[i]`` as an EXIF rational
    ``(sec·1e6)/1000000``; groups with fewer than ``group_size`` files
    are left untouched, exactly like the reference's skip branch.

    Input must carry ``metadata`` (see ``with_metadata``). The group
    assignment is one global name order — fine for a single capture
    session's corpus; shard by directory/pose_id upstream at scale.
    """
    from pyspark.sql import Window

    w = Window.orderBy("path")
    ladder = F.array(*[F.lit(f"{int(e * 1e6)}/1000000")
                       for e in exposures])
    n_in_group = F.count("*").over(
        Window.partitionBy("_gid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    staged = (catalog
              .withColumn("_rn", F.row_number().over(w) - 1)
              .withColumn("_gid", F.floor(F.col("_rn") / group_size))
              .withColumn(
                  "_new_exposure",
                  F.when(n_in_group >= group_size,
                         F.element_at(ladder,
                                      (F.pmod(F.col("_rn"), group_size)
                                       + 1).cast("int")))))
    return (rewrite_metadata_key(staged, "ExposureTime", "_new_exposure")
            .drop("_rn", "_gid", "_new_exposure"))


def detect_missing_poses(catalog: DataFrame, group_size: int = 5,
                         gap_seconds: float = 12.0) -> DataFrame:
    """The reference's missing-pose detector on a real file catalog
    (point3d_transformation.py:11-62): order by mtime, chunk into
    capture groups, flag over-threshold gaps, running missing count."""
    from pyspark.sql import Window

    w_ts = Window.orderBy("modificationTime", "path")
    grouped = (catalog
               .select("path", "modificationTime",
                       F.row_number().over(w_ts).alias("rn"))
               .select("path", "modificationTime",
                       F.floor((F.col("rn") - 1) / group_size).alias("gid"))
               .groupBy("gid")
               .agg(F.min("modificationTime").alias("first_ts"),
                    F.max("modificationTime").alias("last_ts"),
                    F.count("*").cast("int").alias("n_files")))
    w_gid = Window.orderBy("gid")
    w_run = w_gid.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = (F.unix_micros(F.lead("first_ts").over(w_gid))
              - F.unix_micros(F.col("last_ts")))
    return (grouped
            .withColumn("gap_s", gap_us.cast("double") / 1e6)
            .withColumn("gap_flag",
                        F.when(gap_us > int(gap_seconds * 1e6), 1)
                         .otherwise(0))
            .withColumn("missing_before",
                        F.sum("gap_flag").over(w_run).cast("bigint"))
            .withColumn("missing_pose_idx",
                        F.when(F.col("gap_flag") == 1,
                               F.col("gid") + 1 + F.col("missing_before"))
                        .otherwise(F.lit(None).cast("bigint"))))
