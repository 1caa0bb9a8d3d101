#!/usr/bin/env python
"""Round 4: flat (no-HOF, codegen-able) bounds expressions."""
import os
import sys
import time

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import cellstats as CS
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_bounds4")
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


def flat_bounds(delta, key_col, payload, dim):
    """Flat scalar expressions only — everything whole-stage
    codegen'd: nsq as a 64-term sum, per-component u_i columns, then
    128 min/max aggs over plain double columns."""
    p = delta.select(F.col(key_col).alias("_key"),
                     payload.alias("_p"))
    els = [F.element_at("_p", i + 1).cast("double")
           for i in range(dim)]
    nsq = els[0] * els[0]
    for e in els[1:]:
        nsq = nsq + e * e
    p2 = p.select("_key", "_p", nsq.alias("_nsq"))
    ucols = [
        F.when(F.col("_nsq") == 0, F.lit(0.0))
        .otherwise(F.element_at("_p", i + 1).cast("double")
                   / F.sqrt(F.col("_nsq"))).alias(f"_u{i}")
        for i in range(dim)]
    p3 = p2.select("_key", *ucols)
    rows = (p3.groupBy("_key")
            .agg(F.array(*[F.min(f"_u{i}") for i in range(dim)])
                 .alias("dmin"),
                 F.array(*[F.max(f"_u{i}") for i in range(dim)])
                 .alias("dmax"),
                 F.count("*").alias("n"))
            .collect())
    return {str(int(r._key)): {
        "dmin": [float(x) - CS.EPS_COMPONENT for x in r.dmin],
        "dmax": [float(x) + CS.EPS_COMPONENT for x in r.dmax],
        "n": int(r.n)} for r in rows}


for nparts in (1, 32):
    delta = (embt.withColumn("cell", F.pmod(F.col("vec_id"), 97))
             .select("vec_id", "embedding", "cell")
             .repartition(nparts)
             .localCheckpoint())
    delta.count()
    tag = f"[2000r/{nparts}p]"
    timed(f"{tag} current (HOF) 128-agg",
          lambda: CS._delta_bounds(delta, "cell", payload, dim))
    timed(f"{tag} flat 128-agg",
          lambda: flat_bounds(delta, "cell", payload, dim))

# parity
delta = (embt.withColumn("cell", F.pmod(F.col("vec_id"), 97))
         .select("vec_id", "embedding", "cell").localCheckpoint())
a = CS._delta_bounds(delta, "cell", payload, dim)
b = flat_bounds(delta, "cell", payload, dim)
assert set(a) == set(b)
for k in a:
    assert a[k]["n"] == b[k]["n"]
    for i in range(dim):
        assert abs(a[k]["dmin"][i] - b[k]["dmin"][i]) < 1e-15, (k, i)
        assert abs(a[k]["dmax"][i] - b[k]["dmax"][i]) < 1e-15, (k, i)
print("parity ok (bit-level)", file=sys.stderr)
