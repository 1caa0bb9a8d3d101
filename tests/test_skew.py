"""Salted-join correctness: result multiset equals the plain join, and
the salt actually spreads a hot key across buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of probe rows share key 0 — the single-hot-key pathology
    probe = spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, F.lit(0))
         .otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("payload"))
    build = spark.range(0, 7).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim"))
    return probe, build


def test_salted_join_equals_plain_join(spark):
    probe, build = _skewed_frames(spark)
    plain = sorted(map(tuple, probe.join(build, "k")
                       .select("k", "rid", "payload", "dim").collect()))
    salted = sorted(map(tuple, salted_join(probe, build, "k",
                                           salt_buckets=8, salt_on="rid")
                        .select("k", "rid", "payload", "dim").collect()))
    assert salted == plain
    assert len(plain) == 2000  # every probe row matched exactly once


def test_salt_spreads_hot_key(spark):
    probe, _ = _skewed_frames(spark)
    salted = probe.withColumn(
        "_salt", F.pmod(F.hash(F.col("rid")), F.lit(8)))
    dist = (salted.filter(F.col("k") == 0)
            .groupBy("_salt").count().collect())
    assert len(dist) == 8                      # all buckets used
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)       # roughly even spread
