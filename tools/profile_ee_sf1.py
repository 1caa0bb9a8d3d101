#!/usr/bin/env python
"""Interleaved A/B of plain vs box vs seed probes at sf1 (idle
local[32]) — 7 rounds round-robin so host drift hits all arms."""
import json
import os
import statistics
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
    ann_incremental_topk, ann_ingest_delta, compact_ann_batches)
from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (
    compact_ivf_batches, init_ivf_index, ivf_incremental_topk,
    ivf_ingest_delta)
from light_redistribution_in_3dptf_data_pipeline_spark.plans.recall import (
    clustered_embeddings)
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF = "/root/repo/.localdata/sf1"
spark = get_spark(app_name="ee_sf1")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()
embt = load_table(spark, SF, "embeddings")
clu = clustered_embeddings(embt.drop("label")).localCheckpoint()
qvec = [float(x) for x in
        clu.filter("vec_id = 0").select("embedding").head()[0]]
ivf_root = tempfile.mkdtemp(prefix="ee_ivf_")
ann_root = tempfile.mkdtemp(prefix="ee_ann_")
init_ivf_index(spark, ivf_root, clu, train_k=8, train_metric="dot",
               storage="int8")
ivf_ingest_delta(spark, ivf_root, clu, "all")
compact_ivf_batches(spark, ivf_root)
ann_ingest_delta(spark, ann_root, clu, "all", storage="int8")
compact_ann_batches(spark, ann_root)

ARMS = {
    "ivf_plain": lambda: ivf_incremental_topk(
        spark, ivf_root, qvec, nprobe=4, exclude_id=0),
    "ivf_box": lambda: ivf_incremental_topk(
        spark, ivf_root, qvec, nprobe=4, exclude_id=0,
        early_exit=True),
    "ivf_seed": lambda: ivf_incremental_topk(
        spark, ivf_root, qvec, nprobe=4, exclude_id=0,
        early_exit="seed"),
    "ann_plain": lambda: ann_incremental_topk(
        spark, ann_root, qvec, hamming=2, exclude_id=0),
    "ann_box": lambda: ann_incremental_topk(
        spark, ann_root, qvec, hamming=2, exclude_id=0,
        early_exit=True),
    "ann_seed": lambda: ann_incremental_topk(
        spark, ann_root, qvec, hamming=2, exclude_id=0,
        early_exit="seed"),
}
for fn in ARMS.values():   # warm every arm once
    fn().write.format("noop").mode("overwrite").save()
res = {k: [] for k in ARMS}
for _ in range(7):
    for k, fn in ARMS.items():
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        res[k].append(round(time.perf_counter() - t0, 3))
out = {k: {"median": statistics.median(v), "runs": v}
       for k, v in res.items()}
print(json.dumps(out, indent=1))
