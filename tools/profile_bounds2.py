#!/usr/bin/env python
"""Round 2: posexplode vs mapInArrow-numpy per-partition bounds."""
import os
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import cellstats as CS
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_bounds2")
spark.sparkContext.setLogLevel("ERROR")
# warm the python worker pool
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()

embt = load_table(spark, SF_DIR, "embeddings")
delta = (embt.withColumn("cell", F.pmod(F.col("vec_id"), 97))
         .select("vec_id", "embedding", "cell")
         .localCheckpoint())
print(f"delta rows: {delta.count()}", file=sys.stderr)
kind, payload = CS.payload_column("float")
dim = 64


def timed(label, fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best {best:.3f}s", file=sys.stderr)
    return out


r1 = timed("current 128-agg",
           lambda: CS._delta_bounds(delta, "cell", payload, dim))


def variant_b():
    u = CS._direction(payload)
    ex = delta.select(F.col("cell").alias("_key"),
                      F.posexplode(u).alias("_pos", "_v"))
    rows = (ex.groupBy("_key", "_pos")
            .agg(F.min("_v").alias("mn"), F.max("_v").alias("mx"),
                 F.count("*").alias("n")).collect())
    out = {}
    for r in rows:
        ent = out.setdefault(str(int(r._key)),
                             {"dmin": [0.0] * dim,
                              "dmax": [0.0] * dim, "n": int(r.n)})
        ent["dmin"][r._pos] = float(r.mn) - CS.EPS_COMPONENT
        ent["dmax"][r._pos] = float(r.mx) + CS.EPS_COMPONENT
    return out


r2 = timed("posexplode", variant_b)


def variant_c():
    u = CS._direction(payload)
    proj = delta.select(F.col("cell").cast("bigint").alias("_key"),
                        u.alias("_u"))

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

    parts = proj.mapInPandas(
        part_bounds,
        schema="_key long, dmin array<double>, dmax array<double>, "
               "n long").collect()
    out = {}
    for r in parts:
        key = str(int(r._key))
        old = out.get(key)
        if old is None:
            out[key] = {"dmin": list(r.dmin), "dmax": list(r.dmax),
                        "n": int(r.n)}
        else:
            out[key] = {
                "dmin": [min(a, b) for a, b in zip(old["dmin"],
                                                   r.dmin)],
                "dmax": [max(a, b) for a, b in zip(old["dmax"],
                                                   r.dmax)],
                "n": old["n"] + int(r.n)}
    for ent in out.values():
        ent["dmin"] = [x - CS.EPS_COMPONENT for x in ent["dmin"]]
        ent["dmax"] = [x + CS.EPS_COMPONENT for x in ent["dmax"]]
    return out


r3 = timed("mapInPandas numpy", variant_c)

for k, ent in r1.items():
    for r in (r2, r3):
        assert abs(ent["dmin"][5] - r[k]["dmin"][5]) < 1e-12, k
        assert ent["n"] == r[k]["n"]
print("parity ok", file=sys.stderr)
