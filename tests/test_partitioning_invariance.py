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
    "w11_exposure_groups_batch",
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
    # w9/w11 persist narrow intermediates (session-lifetime cache
    # entries — see scalable_missing_pose's persist note), and Spark's
    # plan-based cache matching would let the second shuffle-partitions
    # leg serve the FIRST leg's cached results instead of re-exercising
    # the shuffle path this suite exists to vary. Clear so every leg
    # recomputes under its own config.
    spark.catalog.clearCache()
    return sorted(map(tuple,
                      QUERIES[name].builder(spark, SF_DIR).collect()))


def test_w9_flagship_agree_on_adversarial_straddle(spark, tmp_path):
    """Adversarial seam layout: ONE capture group straddles BOTH w9
    decomposition boundaries at once — its five events cross an hour
    boundary (the enumeration bucket) exactly while its gid sits at
    4095→4096 (the running-sum bucket), and gap>threshold flags land
    on the straddling group and on the first group of the next gid
    bucket. The naive flagship (one global window) and the scale-out
    w9 must emit identical rows — the layout where a prefix-sum
    off-by-one or a bucket-boundary double-count would show.
    """
    import pyspark.sql.functions as F

    GBUCKET, GROUP = 4096, 5
    t0 = 1_700_002_800                       # hour-aligned epoch
    hb = t0 + 12 * 3600                      # the straddled boundary
    epochs = [t0 + 3 + i for i in range(GBUCKET * GROUP - GROUP)]
    # gid 4095: two events before the hour boundary, three after
    epochs += [hb - 2, hb - 1, hb + 1, hb + 2, hb + 3]
    # gid 4096 (first group of the next 4096-gid bucket) arrives
    # after a flagged gap, so missing_before must carry across the
    # bucket seam
    g1 = hb + 3 + 1300
    epochs += [g1 + k for k in range(GROUP)]
    # incomplete trailing group behind a second flagged gap
    g2 = g1 + GROUP + 2000
    epochs += [g2 + k for k in range(3)]

    events = spark.createDataFrame(
        [(i, e) for i, e in enumerate(epochs)],
        "event_id LONG, epoch BIGINT",
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"))
    d = str(tmp_path / "straddle")
    events.write.mode("overwrite").parquet(d + "/events.parquet")

    naive = sorted(map(tuple, QUERIES["w_missing_pose_detection"]
                       .builder(spark, d).collect()))
    scal = sorted(map(tuple, QUERIES["w9_missing_pose_scalable"]
                      .builder(spark, d).collect()))
    assert scal == naive

    by_gid = {r[0]: r for r in scal}
    straddle = by_gid[GBUCKET - 1]
    assert straddle[1].hour != straddle[2].hour   # crosses the hour
    # flags: the jump from the 1s-cadence prefix into the straddle
    # group flags gid 4094, then the straddle group and gid 4096 are
    # each followed by an injected gap — inclusive running count 2 at
    # the straddle, 3 across the gbk seam, 3 at the trailing group
    assert straddle[5] == 1 and straddle[6] == 2
    assert by_gid[GBUCKET][5] == 1 and by_gid[GBUCKET][6] == 3
    assert by_gid[GBUCKET + 1][6] == 3


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
