#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is fully materialized via the `noop` sink (forces the whole
plan to execute without driver-side collect — the honest measure of
distributed throughput).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the heavy
# shuffles (joins, window chains, pairwise similarity).
HEADLINE = [
    "w_missing_pose_detection",
    "w9_missing_pose_scalable",
    "w4_running_total",
    "j1_fanout_broadcast_join",
    "j2_key_intersection_join",
    "a1_a2_collect_having",
    "a4_a6_a7_a8_a9_a11_stats",
    "a5_a10_pricing_cube",
    "t2_t3_t5_topk_order_sample",
    "t4_argmin_argmax",
    "s4_robot_program_parse",
    "f13_f14_pose_grid_rotation",
    "tx1_tx2_tx4_token_quality",
    "tx6_ngram_jaccard_neardup",
    "tx7_repetition_signals",
    "tx8_benchmark_decontam",
    "tx9_tfidf_vocab",
    "dx4_neardup_cluster_cc",
    "smp1_stratified_sample",
    "f5_f6_f9_s7_event_deltas",
    "dx3_embedding_cosine_neardup",
    "sim1_sim2_cosine_topk",
    "sim3_sim4_ivf_train_assign",
    "w7_w8_time_windows",
    "x1_x2_x3_setops",
    "w10_session_window_batch",
    "dx5_lsh_neardup_decision",
    "dx6_passage_dup",
    "sx3_ivf_probe_topk",
    "sim5_quantize_int8",
    "tx10_bpe_token_count",
    "tx11_chunk_pack_split",
    "w11_exposure_groups_batch",
]


def main() -> None:
    # A missing/mistyped $SPARK_GRAFT_SF_DIR should fail with one
    # clear line, not a FileNotFoundError from the sizing heuristic.
    if not os.path.isdir(SF_DIR):
        sys.exit(f"bench: SPARK_GRAFT_SF_DIR={SF_DIR!r} is not a "
                 f"directory")

    from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES
    from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

    # Driver memory must be fixed BEFORE the JVM starts, so size it
    # from the fixture footprint here (≈200x input bytes covers the
    # worst aggregate working set — sf1's exhaustive shingle join
    # needs ~40g): explicit $SPARK_GRAFT_DRIVER_MEM always wins. The
    # self-sized heap is capped against physical RAM (leave ≥8 GiB
    # for OS + Python workers) so smaller hosts don't over-commit.
    fixture_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR) if f.endswith(".parquet"))
    if fixture_bytes > 100 * 1024 * 1024:
        try:
            ram_gib = (os.sysconf("SC_PAGE_SIZE")
                       * os.sysconf("SC_PHYS_PAGES")) >> 30
            heap = max(4, min(48, ram_gib - 8))
        except (ValueError, OSError):
            heap = 48
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{heap}g")

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # Size shuffle parallelism to the actual input scale — the 100 TB
    # knob (tune_for_scale): at bench scale it keeps the default, on a
    # real corpus it raises static shuffle partitions so one partition
    # stays executor-memory-sized and AQE coalesces the excess.
    from light_redistribution_in_3dptf_data_pipeline_spark.session import (
        tune_for_scale)
    tune_for_scale(spark, fixture_bytes)

    # JVM/codegen/file-listing warm-up so t=0 effects don't pollute q1:
    # touch every fixture table once with a cheap count.
    from light_redistribution_in_3dptf_data_pipeline_spark.catalog import (
        TABLES, load_table)
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    QUERIES["t2_t3_t5_topk_order_sample"].builder(spark, SF_DIR).collect()
    # Python/Arrow worker warm-up (same one-time-cost class as JVM
    # codegen): spin the daemon up on a 1-row frame so the first
    # Arrow-stage query doesn't pay ~4 s of worker startup.
    import pandas as _pd
    spark.range(1).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long").collect()

    # Two legs per query: first-run (includes codegen compile +
    # whole-plan execution — comparable to every prior round's
    # numbers) and a warm second run (steady-state: codegen cached,
    # persisted intermediates resident). The warm column separates
    # genuine plan regressions from host noise and one-time costs —
    # r4's unchanged queries drifted 1.2-1.3x on first-run numbers
    # alone, wasting a review cycle re-adjudicating noise.
    per_query: dict[str, float] = {}
    per_query_warm: dict[str, float] = {}
    total = total_warm = 0.0
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.perf_counter()
        q.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        q.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt_warm = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        per_query_warm[name] = round(dt_warm, 3)
        total += dt
        total_warm += dt_warm
        print(f"# {name}: {dt:.3f}s (warm {dt_warm:.3f}s)",
              file=sys.stderr)

    # Incremental-ingest leg: the production daily-batch shape
    # (delta-dedup against a persisted index + manifest-last commit),
    # so plan regressions in the ingest path show up here, not only
    # in the analytic queries. Setup (standing 80% index) is untimed;
    # the two timed legs ingest equal-shaped deltas (10% new + 10%
    # re-keyed exact dups) under fresh batch ids — leg 2 is the
    # "warm" column (codegen cached, index resident in page cache).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from light_redistribution_in_3dptf_data_pipeline_spark.plans.corpus import (
        ingest_delta)

    ingest_root = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        docs = load_table(spark, SF_DIR, "documents")
        base = docs.filter(F.pmod(F.col("doc_id"), 10) < 8)
        ingest_delta(spark, ingest_root, base, batch_id="base")
        dup = (docs.filter(F.pmod(F.col("doc_id"), 10) == 0)
               .withColumn("doc_id", F.col("doc_id") + 1_000_000_000))
        legs = []
        for i, fresh_mod in enumerate((8, 9)):
            delta = (docs.filter(F.pmod(F.col("doc_id"), 10) == fresh_mod)
                     .unionByName(dup.withColumn(
                         "doc_id", F.col("doc_id") + i)))
            t0 = time.perf_counter()
            ingest_delta(spark, ingest_root, delta, batch_id=f"delta{i}")
            legs.append(time.perf_counter() - t0)
        per_query["ingest_delta"] = round(legs[0], 3)
        per_query_warm["ingest_delta"] = round(legs[1], 3)
        total += legs[0]
        total_warm += legs[1]
        print(f"# ingest_delta: {legs[0]:.3f}s (warm {legs[1]:.3f}s)",
              file=sys.stderr)
    finally:
        shutil.rmtree(ingest_root, ignore_errors=True)

    # Incremental-ANN legs: the vector-side production shape (delta
    # bucketing + manifest-last commit, then a partition-pruned
    # probe), so protocol-cost regressions in the similarity layer
    # are tracked round-over-round like the corpus ingest. Setup
    # (standing 80% index) is untimed; the two timed ingest legs are
    # equal-shaped 10% deltas; the probe leg is the same query twice
    # (first/warm).
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        ann_incremental_topk, ann_ingest_delta)

    ann_root = tempfile.mkdtemp(prefix="bench_ann_")
    try:
        embt = load_table(spark, SF_DIR, "embeddings")
        base = embt.filter(F.pmod(F.col("vec_id"), 10) < 8)
        ann_ingest_delta(spark, ann_root, base, "base")
        legs = []
        for i, mod in enumerate((8, 9)):
            delta = embt.filter(F.pmod(F.col("vec_id"), 10) == mod)
            t0 = time.perf_counter()
            ann_ingest_delta(spark, ann_root, delta, f"delta{i}")
            legs.append(time.perf_counter() - t0)
        per_query["ann_ingest"] = round(legs[0], 3)
        per_query_warm["ann_ingest"] = round(legs[1], 3)
        total += legs[0]
        total_warm += legs[1]
        print(f"# ann_ingest: {legs[0]:.3f}s (warm {legs[1]:.3f}s)",
              file=sys.stderr)

        qvec = [float(x) for x in
                embt.filter("vec_id = 0").select("embedding")
                .head()[0]]
        probe = []
        for _ in range(2):
            t0 = time.perf_counter()
            (ann_incremental_topk(spark, ann_root, qvec, exclude_id=0)
             .write.format("noop").mode("overwrite").save())
            probe.append(time.perf_counter() - t0)
        per_query["ann_topk"] = round(probe[0], 3)
        per_query_warm["ann_topk"] = round(probe[1], 3)
        total += probe[0]
        total_warm += probe[1]
        print(f"# ann_topk: {probe[0]:.3f}s (warm {probe[1]:.3f}s)",
              file=sys.stderr)
    finally:
        shutil.rmtree(ann_root, ignore_errors=True)

    # Incremental-IVF legs, same shape as the ANN pair: quantizer
    # training + standing 80% index untimed, two timed 10% deltas
    # placed by the frozen quantizer (the production path — no
    # labels), then the pruned cell-probe twice (first/warm).
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (
        init_ivf_index, ivf_incremental_topk, ivf_ingest_delta)

    ivf_root = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        embt = load_table(spark, SF_DIR, "embeddings")
        init_ivf_index(spark, ivf_root, embt)
        ivf_ingest_delta(spark, ivf_root,
                         embt.filter(F.pmod(F.col("vec_id"), 10) < 8)
                         .drop("label"), "base")
        legs = []
        for i, mod in enumerate((8, 9)):
            delta = (embt.filter(F.pmod(F.col("vec_id"), 10) == mod)
                     .drop("label"))
            t0 = time.perf_counter()
            ivf_ingest_delta(spark, ivf_root, delta, f"delta{i}")
            legs.append(time.perf_counter() - t0)
        per_query["ivf_ingest"] = round(legs[0], 3)
        per_query_warm["ivf_ingest"] = round(legs[1], 3)
        total += legs[0]
        total_warm += legs[1]
        print(f"# ivf_ingest: {legs[0]:.3f}s (warm {legs[1]:.3f}s)",
              file=sys.stderr)

        qvec = [float(x) for x in
                embt.filter("vec_id = 0").select("embedding")
                .head()[0]]
        probe = []
        for _ in range(2):
            t0 = time.perf_counter()
            (ivf_incremental_topk(spark, ivf_root, qvec, exclude_id=0)
             .write.format("noop").mode("overwrite").save())
            probe.append(time.perf_counter() - t0)
        per_query["ivf_topk"] = round(probe[0], 3)
        per_query_warm["ivf_topk"] = round(probe[1], 3)
        total += probe[0]
        total_warm += probe[1]
        print(f"# ivf_topk: {probe[0]:.3f}s (warm {probe[1]:.3f}s)",
              file=sys.stderr)
    finally:
        shutil.rmtree(ivf_root, ignore_errors=True)

    summary = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "queries_warm": per_query_warm,
        "value_warm": round(total_warm, 3),
        "sf": sf,
    }
    print(json.dumps(summary))
    # Stdout-noise-proof copy: Spark progress bars / JVM warnings can
    # mangle the stdout line in captured logs, leaving the recorded
    # bench blob unparseable (r1-r7 shipped a truncated "tail" string
    # that had to be regex-scraped). The file is the machine-readable
    # record; $SPARK_GRAFT_BENCH_OUT overrides the location.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_SUMMARY.json"))
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# summary written to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
