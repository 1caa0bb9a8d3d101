#!/usr/bin/env python
"""Round 3: isolate fixed job cost vs per-row cost for the bounds."""
import os
import sys
import time

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import cellstats as CS
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_bounds3")
spark.sparkContext.setLogLevel("ERROR")

embt = load_table(spark, SF_DIR, "embeddings")
kind, payload = CS.payload_column("float")
dim = 64


def timed(label, fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {['%.3f' % t for t in ts]}", file=sys.stderr)


for nrows, nparts in ((200, 1), (2000, 1), (2000, 32)):
    delta = (embt.filter(F.col("vec_id") < nrows)
             .withColumn("cell", F.pmod(F.col("vec_id"), 97))
             .select("vec_id", "embedding", "cell")
             .repartition(nparts)
             .localCheckpoint())
    delta.count()
    tag = f"[{nrows}r/{nparts}p]"
    timed(f"{tag} plain count",
          lambda: delta.count())
    u = CS._direction(payload)
    proj = delta.select(F.col("cell").alias("_key"), u.alias("_u"))
    timed(f"{tag} direction proj collect",
          lambda: proj.collect())
    timed(f"{tag} 1-col agg",
          lambda: proj.groupBy("_key").agg(
              F.min(F.element_at("_u", 1)), F.count("*")).collect())
    timed(f"{tag} 8-col agg",
          lambda: proj.groupBy("_key").agg(
              *[F.min(F.element_at("_u", i + 1)) for i in range(8)],
              F.count("*")).collect())
    timed(f"{tag} 128-col agg",
          lambda: CS._delta_bounds(delta, "cell", payload, dim))


delta = (embt.withColumn("cell", F.pmod(F.col("vec_id"), 97))
         .select("vec_id", "embedding", "cell")
         .localCheckpoint())
delta.count()
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()
u = CS._direction(payload)
proj = delta.select(F.col("cell").alias("_key"), u.alias("_u"))


def pose():
    ex = delta.select(F.col("cell").alias("_key"),
                      F.posexplode(u).alias("_pos", "_v"))
    (ex.groupBy("_key", "_pos")
     .agg(F.min("_v"), F.max("_v"), F.count("*")).collect())


timed("[2000r/32p] posexplode agg", pose)

import numpy as np
import pandas as pd


def mip():
    def part_bounds(it):
        for pdf in it:
            if not len(pdf):
                continue
            keys = pdf["_key"].to_numpy()
            mat = np.vstack(pdf["_u"].to_numpy())
            for k in np.unique(keys):
                sub = mat[keys == k]
                yield pd.DataFrame({
                    "_key": [int(k)],
                    "dmin": [sub.min(axis=0).tolist()],
                    "dmax": [sub.max(axis=0).tolist()],
                    "n": [int(sub.shape[0])]})
    proj.mapInPandas(
        part_bounds,
        schema="_key long, dmin array<double>, dmax array<double>, "
               "n long").collect()


timed("[2000r/32p] mapInPandas", mip)

# array-of-struct single-shuffle: explode into (key,pos,v) but agg
# with ONE pass using pivot-free assembly executor-side:
# groupBy(key) with TWO agg expressions over exploded? needs explode
# first anyway. Alternative: two-stage fold via treeAggregate-style
# DataFrame: per-partition sort-free reduction using
# F.min over packed struct is wrong. Skip.
