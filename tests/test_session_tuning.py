"""tune_for_scale: the shuffle-partition sizing knob (SURVEY scale
notes; exercised by bench.py so the 100 TB sizing logic is executed,
not just documented)."""

from __future__ import annotations

from light_redistribution_in_3dptf_data_pipeline_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS, tune_for_scale)


def test_small_input_keeps_default(spark):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        tune_for_scale(spark, 10 << 20)  # 10 MB: bench-scale input
        assert (int(spark.conf.get("spark.sql.shuffle.partitions"))
                == DEFAULT_SHUFFLE_PARTITIONS)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def test_large_input_scales_partitions(spark):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        hundred_tb = 100 << 40
        tune_for_scale(spark, hundred_tb)
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # one shuffle partition ~256 MB at the target scale
        assert parts == hundred_tb // (256 << 20)
        assert parts >= DEFAULT_SHUFFLE_PARTITIONS
        # monotone in input size
        tune_for_scale(spark, 2 * hundred_tb)
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) \
            == 2 * parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
