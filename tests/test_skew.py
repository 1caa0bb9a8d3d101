"""Skew guards under stress: salted joins (result parity + spread) and
the LSH stop-shingle cap (band-join fan-out actually bounded)."""

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


def test_stop_shingle_guard_bounds_band_join_fanout(spark):
    """Corpus-boilerplate pathology: every document shares a long
    footer whose shingles dominate each doc's shingle set. The
    MinHash mins then mostly come from the shared footer, whole band
    signatures collide corpus-wide, and the band equi-join degenerates
    to the all-pairs product (one hot band bucket = one task holding
    N² work at scale). The ``max_doc_freq`` stop-shingle guard
    (operators/dedup.shingles) must bound that fan-out.

    Measured assertion on the CANDIDATE-PAIR count (the band join's
    output size, the thing that explodes): quadratic without the
    guard, near-zero with it — so this test is red if the guard stops
    filtering and red if the pathology stops being pathological."""
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles)

    n = 120
    footer = " ".join(f"footer{w}" for w in range(30))
    docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} {footer}")
         for i in range(n)],
        "doc_id LONG, text STRING")

    def n_pairs(max_doc_freq):
        sig = minhash_signatures(
            shingles(docs, max_doc_freq=max_doc_freq))
        return lsh_candidate_pairs(sig).count()

    unguarded = n_pairs(None)
    guarded = n_pairs(10)
    # without the guard the footer drives (nearly) every band:
    # candidate set ~ all N(N-1)/2 pairs
    assert unguarded > 0.9 * n * (n - 1) / 2, (
        f"fixture no longer pathological: {unguarded} pairs — "
        "rebuild the boilerplate so the guard has something to bound")
    # with it, only the per-doc-unique shingles feed the signatures:
    # no cross-doc similarity survives
    assert guarded <= n, (
        f"stop-shingle guard failed to bound band-join fan-out: "
        f"{guarded} candidate pairs (unguarded: {unguarded})")
