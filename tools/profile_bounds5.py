#!/usr/bin/env python
"""Round 5: numpy-in-Arrow vs posexplode+nsq variants."""
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
spark = get_spark(app_name="profile_bounds5")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()

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


def np_bounds(delta, key_col, payload, dim):
    """Raw integer payload straight to numpy: direction computed
    vectorized per Arrow batch, per-partition per-key boxes, final
    fold over <= partitions x keys rows on the driver."""
    p = delta.select(F.col(key_col).cast("bigint").alias("_key"),
                     payload.alias("_p"))

    def part_bounds(it):
        for pdf in it:
            if not len(pdf):
                continue
            keys = pdf["_key"].to_numpy()
            mat = np.vstack(pdf["_p"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0] = 1.0   # zero payload -> zero direction
            u = mat / nrm[:, None]
            for k in np.unique(keys):
                sub = u[keys == k]
                yield pd.DataFrame({
                    "_key": [int(k)],
                    "dmin": [sub.min(axis=0).tolist()],
                    "dmax": [sub.max(axis=0).tolist()],
                    "n": [int(sub.shape[0])]})

    parts = p.mapInPandas(
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
                "dmin": [min(a, b) for a, b in zip(old["dmin"], r.dmin)],
                "dmax": [max(a, b) for a, b in zip(old["dmax"], r.dmax)],
                "n": old["n"] + int(r.n)}
    for ent in out.values():
        ent["dmin"] = [x - CS.EPS_COMPONENT for x in ent["dmin"]]
        ent["dmax"] = [x + CS.EPS_COMPONENT for x in ent["dmax"]]
    return out


def pe_bounds(delta, key_col, payload, dim):
    """One flat nsq column, posexplode, 3-expression agg."""
    p = delta.select(F.col(key_col).cast("bigint").alias("_key"),
                     payload.alias("_p"))
    els = [F.element_at("_p", i + 1).cast("double")
           for i in range(dim)]
    nsq = els[0] * els[0]
    for e in els[1:]:
        nsq = nsq + e * e
    p2 = p.select("_key", "_p", nsq.alias("_nsq"))
    ex = p2.select(
        "_key",
        F.posexplode("_p").alias("_pos", "_el"),
        F.when(F.col("_nsq") == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) / F.sqrt(F.col("_nsq"))).alias("_inv"))
    ex = ex.select("_key", "_pos",
                   (F.col("_el").cast("double")
                    * F.col("_inv")).alias("_v"))
    rows = (ex.groupBy("_key", "_pos")
            .agg(F.min("_v").alias("mn"), F.max("_v").alias("mx"),
                 F.count("*").alias("n")).collect())
    out = {}
    for r in rows:
        ent = out.setdefault(str(int(r._key)),
                             {"dmin": [0.0] * dim,
                              "dmax": [0.0] * dim,
                              "n": int(r.n)})
        ent["dmin"][r._pos] = float(r.mn) - CS.EPS_COMPONENT
        ent["dmax"][r._pos] = float(r.mx) + CS.EPS_COMPONENT
    return out


for nparts in (1, 32):
    delta = (embt.withColumn("cell", F.pmod(F.col("vec_id"), 97))
             .select("vec_id", "embedding", "cell")
             .repartition(nparts)
             .localCheckpoint())
    delta.count()
    tag = f"[2000r/{nparts}p]"
    timed(f"{tag} numpy mapInPandas",
          lambda: np_bounds(delta, "cell", payload, dim))
    timed(f"{tag} posexplode+nsq",
          lambda: pe_bounds(delta, "cell", payload, dim))

a = CS._delta_bounds(delta, "cell", payload, dim)
b = np_bounds(delta, "cell", payload, dim)
c = pe_bounds(delta, "cell", payload, dim)
assert set(a) == set(b) == set(c)
worst = 0.0
for k in a:
    assert a[k]["n"] == b[k]["n"] == c[k]["n"]
    for i in range(dim):
        worst = max(worst, abs(a[k]["dmin"][i] - b[k]["dmin"][i]),
                    abs(a[k]["dmax"][i] - b[k]["dmax"][i]),
                    abs(a[k]["dmin"][i] - c[k]["dmin"][i]),
                    abs(a[k]["dmax"][i] - c[k]["dmax"][i]))
print(f"parity ok, worst abs diff {worst:.2e}", file=sys.stderr)
