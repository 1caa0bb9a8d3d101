"""Edge-case semantics of the custom temporal join operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.operators.temporal_joins import (
    asof_join, binned_range_join)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_tie_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "l1"),   # before any right → null
         (1, _ts("2024-01-01T12:00:00"), "l2"),   # exact tie → matches
         (1, _ts("2024-01-01T13:00:00"), "l3"),   # after → latest prior
         (2, _ts("2024-01-01T12:30:00"), "l4")],  # other key isolated
        "k int, ts timestamp, lid string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 100.0),
         (1, _ts("2024-01-01T12:30:00"), 200.0),
         (2, _ts("2024-01-01T12:30:00"), 900.0)],
        "k int, ts timestamp, val double")
    out = {r.lid: r.val_r
           for r in asof_join(left, right, "k", "ts", ["val"]).collect()}
    assert out == {"l1": None, "l2": 100.0, "l3": 200.0, "l4": 900.0}


def test_asof_no_cross_key_leakage(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "a")],
        "k int, ts timestamp, lid string")
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01T11:00:00"), 5.0)],
        "k int, ts timestamp, val double")
    rows = asof_join(left, right, "k", "ts", ["val"]).collect()
    assert rows[0].val_r is None


def test_binned_range_join_matches_plain_predicate(spark):
    probes = spark.range(0, 500).select(
        F.col("id").alias("pid"), (F.col("id") * 0.7).alias("v"))
    intervals = spark.createDataFrame(
        [(i, i * 10.0, i * 10.0 + 7.5) for i in range(30)],
        "iid int, lo double, hi double")
    got = sorted((r.pid, r.iid) for r in binned_range_join(
        probes, intervals, "v", "lo", "hi", bin_width=16.0).collect())
    want = sorted((r.pid, r.iid) for r in probes.crossJoin(intervals)
                  .filter(F.col("v").between(F.col("lo"), F.col("hi")))
                  .collect())
    assert got == want and len(got) > 0
