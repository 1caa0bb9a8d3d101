#!/usr/bin/env python
"""r14 Done-criteria measurement at sf1:
1. ivf_ingest / ann_ingest warm medians (target: ivf <= ~3.2 s,
   ann <= ~10.5 s — the cellstats-tax recovery, VERDICT r13 #1).
2. Early-exit BOX mode wall <= plain probe on the idle local[32]
   session, clustered int8 roots, both families (VERDICT r13 #2);
   seed mode recorded for the cost model.
3. f13_f14 outlier re-bench 3x (VERDICT r13 #5)."""
import json
import os
import statistics
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
    ann_incremental_topk, ann_ingest_delta, compact_ann_batches)
from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (
    compact_ivf_batches, init_ivf_index, ivf_incremental_topk,
    ivf_ingest_delta)
from light_redistribution_in_3dptf_data_pipeline_spark.plans.recall import (
    clustered_embeddings)
from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF = "/root/repo/.localdata/sf1"
spark = get_spark(app_name="r14_sf1")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()
embt = load_table(spark, SF, "embeddings")
embt.count()

out = {}

# 1. ingest legs (bench.py shape: base 60%, 4 deltas of 10%)
for fam, setup, one in (
    ("ivf_ingest", "ivf", None), ("ann_ingest", "ann", None)):
    root = tempfile.mkdtemp(prefix=f"r14_{fam}_")
    if setup == "ivf":
        init_ivf_index(spark, root, embt)
        ivf_ingest_delta(spark, root,
                         embt.filter(F.pmod(F.col("vec_id"), 10) < 6)
                         .drop("label"), "base")
        ing = lambda i, mod: ivf_ingest_delta(  # noqa: E731
            spark, root,
            embt.filter(F.pmod(F.col("vec_id"), 10) == mod)
            .drop("label"), f"delta{i}")
    else:
        ann_ingest_delta(
            spark, root,
            embt.filter(F.pmod(F.col("vec_id"), 10) < 6), "base")
        ing = lambda i, mod: ann_ingest_delta(  # noqa: E731
            spark, root,
            embt.filter(F.pmod(F.col("vec_id"), 10) == mod),
            f"delta{i}")
    legs = []
    for i, mod in enumerate((6, 7, 8, 9)):
        t0 = time.perf_counter()
        ing(i, mod)
        legs.append(time.perf_counter() - t0)
    out[fam] = {"cold": round(legs[0], 3),
                "warm": round(statistics.median(legs[1:]), 3)}
    print(f"# {fam}: {out[fam]}", file=sys.stderr)
    import shutil
    shutil.rmtree(root, ignore_errors=True)

# 2. early-exit wall, clustered int8 roots
clu = clustered_embeddings(embt.drop("label")).localCheckpoint()
qvec_c = [float(x) for x in
          clu.filter("vec_id = 0").select("embedding").head()[0]]
ee_root = tempfile.mkdtemp(prefix="r14_ee_ivf_")
ann_ee = tempfile.mkdtemp(prefix="r14_ee_ann_")
init_ivf_index(spark, ee_root, clu, train_k=8, train_metric="dot",
               storage="int8")
ivf_ingest_delta(spark, ee_root, clu, "all")
compact_ivf_batches(spark, ee_root)
ann_ingest_delta(spark, ann_ee, clu, "all", storage="int8")
compact_ann_batches(spark, ann_ee)


def timed3(fn):
    ts = []
    fn()   # warm
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return ts


for fam, probe in (
    ("ivf8_np4_plain", lambda: ivf_incremental_topk(
        spark, ee_root, qvec_c, nprobe=4, exclude_id=0)),
    ("ivf8_np4_box", lambda: ivf_incremental_topk(
        spark, ee_root, qvec_c, nprobe=4, exclude_id=0,
        early_exit=True)),
    ("ivf8_np4_seed", lambda: ivf_incremental_topk(
        spark, ee_root, qvec_c, nprobe=4, exclude_id=0,
        early_exit="seed")),
    ("ann8_h2_plain", lambda: ann_incremental_topk(
        spark, ann_ee, qvec_c, hamming=2, exclude_id=0)),
    ("ann8_h2_box", lambda: ann_incremental_topk(
        spark, ann_ee, qvec_c, hamming=2, exclude_id=0,
        early_exit=True)),
    ("ann8_h2_seed", lambda: ann_incremental_topk(
        spark, ann_ee, qvec_c, hamming=2, exclude_id=0,
        early_exit="seed"))):
    ts = timed3(lambda: probe().write.format("noop")
                .mode("overwrite").save())
    out[fam] = {"runs": ts, "median": statistics.median(ts)}
    print(f"# {fam}: {out[fam]}", file=sys.stderr)

# sanity: box mode actually prunes on this fixture
from light_redistribution_in_3dptf_data_pipeline_spark.plans import cellstats as CS
from light_redistribution_in_3dptf_data_pipeline_spark.plans import ivf_index as IVF
import math
stats = CS.load_stats(spark, ee_root)
qci = [math.floor(x * 1e9 + 0.5) for x in qvec_c]
qsq = sum(c * c for c in qci) / 1e18
meta = IVF._load_meta(spark, ee_root)
ranked = sorted(
    ((float(sum(int(s) * q for s, q in zip(r.csum, qci)))
      / (r.nv * 1e18), int(r.cell))
     for r in IVF._load_centroids(spark, ee_root, meta)),
    key=lambda t: (-t[0], t[1]))
cells = [c for _, c in ranked[:4]]
kept, pruned = CS.box_prune_keys(stats, cells, qci, qsq, 10)
out["box_pruned_of_4"] = len(pruned)
print(f"# box pruned {len(pruned)} of 3 non-seed cells",
      file=sys.stderr)

# 3. f13_f14 outlier re-bench
q = QUERIES["f13_f14_pose_grid_rotation"]
q.builder(spark, SF).write.format("noop").mode("overwrite").save()
ts = timed3(lambda: q.builder(spark, SF).write.format("noop")
            .mode("overwrite").save())
out["f13_f14_sf1"] = {"runs": ts, "median": statistics.median(ts)}
print(f"# f13_f14_sf1: {out['f13_f14_sf1']}", file=sys.stderr)

print(json.dumps(out))
