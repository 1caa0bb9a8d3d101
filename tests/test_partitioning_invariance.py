"""Partition-count invariance — the cluster-determinism proof.

Every oracle-checked query claims a deterministic result, but the
parity suite runs under one fixed ``spark.sql.shuffle.partitions``.
On a real cluster that number is whatever the deployment sets, and a
query whose result depends on it (missing tie-break, order-dependent
float fold, per-partition sampling leak) would pass parity locally
and silently diverge at 1000 executors. These tests re-run the
partitioning-sensitive query families under different shuffle-
partition counts (a prime, and 2x the default) and require results
identical to the default-config run.

Families chosen for exposure, not coverage: global enumeration via
bucketed prefix-sums (w9/t1/w1), shuffle-order packing cumsum (tx11),
hash-Bernoulli + reservoir sampling (smp1), iterative label
propagation (dx4), LSH band joins (dx5), and the decimal-exact wide
aggregate (a4 composite).
"""

from __future__ import annotations

import pytest

from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES

from conftest import SF_DIR

SENSITIVE = [
    "w9_missing_pose_scalable",
    "w1_rownumber_bucket",
    "t1_global_sort_rank",
    "tx11_chunk_pack_split",
    "smp1_stratified_sample",
    "dx4_neardup_cluster_cc",
    "dx5_lsh_neardup_decision",
    "a4_a6_a7_a8_a9_a11_stats",
]

PARTITION_COUNTS = (7, 64)


def _rows(spark, name):
    return sorted(map(tuple,
                      QUERIES[name].builder(spark, SF_DIR).collect()))


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partitions(name, spark):
    key = "spark.sql.shuffle.partitions"
    default = spark.conf.get(key)
    baseline = _rows(spark, name)
    try:
        for n in PARTITION_COUNTS:
            spark.conf.set(key, str(n))
            got = _rows(spark, name)
            assert got == baseline, (
                f"{name}: result depends on {key}={n} — "
                "non-deterministic under cluster re-sizing")
    finally:
        spark.conf.set(key, default)


@pytest.mark.parametrize("name", ["w9_missing_pose_scalable",
                                  "tx11_chunk_pack_split",
                                  "dx5_lsh_neardup_decision"])
def test_result_invariant_without_aqe(name, spark):
    """AQE rewrites plans at runtime (coalescing, broadcast
    conversion, skew splits); results must be identical with it off —
    the engine may RELY on AQE for speed, never for correctness."""
    key = "spark.sql.adaptive.enabled"
    default = spark.conf.get(key)
    baseline = _rows(spark, name)
    try:
        spark.conf.set(key, "false")
        assert _rows(spark, name) == baseline, (
            f"{name}: result depends on AQE")
    finally:
        spark.conf.set(key, default)
