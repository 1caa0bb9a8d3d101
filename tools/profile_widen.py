#!/usr/bin/env python
"""One-off profiler for the cellstats ingest tax (VERDICT r13 #1):
times the ivf_ingest leg with and without widening, and splits
widen_stats into read-back / aggregate / JSON-RMW components."""
import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile_widen")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table  # noqa: E402
from light_redistribution_in_3dptf_data_pipeline_spark.plans import cellstats as CS  # noqa: E402
from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (  # noqa: E402
    IVF_TABLE, init_ivf_index, ivf_ingest_delta)

embt = load_table(spark, SF_DIR, "embeddings")
embt.count()

import light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index as IVF  # noqa: E402

real_widen = CS.widen_stats


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s", file=sys.stderr)
    return out, dt


for mode in ("with_widen", "no_widen"):
    root = tempfile.mkdtemp(prefix=f"prof_{mode}_")
    if mode == "no_widen":
        IVF.widen_stats = lambda *a, **k: None
    else:
        IVF.widen_stats = real_widen
    # NOTE: ivf_index imports widen_stats inside the function body
    # (from .cellstats import widen_stats) so patch the module attr:
    CS.widen_stats = (real_widen if mode == "with_widen"
                      else lambda *a, **k: None)
    init_ivf_index(spark, root, embt)
    base = embt.filter(F.pmod(F.col("vec_id"), 10) < 6).drop("label")
    ivf_ingest_delta(spark, root, base, "base")
    legs = []
    for i, m in enumerate((6, 7, 8, 9)):
        d = embt.filter(F.pmod(F.col("vec_id"), 10) == m).drop("label")
        _, dt = timed(f"{mode} delta{i}",
                      lambda: ivf_ingest_delta(spark, root, d,
                                               f"delta{i}"))
        legs.append(dt)
    import statistics
    print(f"{mode}: cold {legs[0]:.3f} warm-med "
          f"{statistics.median(legs[1:]):.3f}", file=sys.stderr)
    if mode == "with_widen":
        # split widen into components on one more delta
        CS.widen_stats = lambda *a, **k: None
        d = (embt.filter(F.pmod(F.col("vec_id"), 10) == 5)
             .drop("label")
             .withColumn("vec_id", F.col("vec_id") + 1_000_000_000))
        ivf_ingest_delta(spark, root, d, "delta_x")
        path = f"{root}/{IVF_TABLE}"
        written, t_read0 = timed(
            "read-back scan (count only)",
            lambda: spark.read.parquet(f"{path}/batch_id=delta_x")
            .count())
        w = spark.read.parquet(f"{path}/batch_id=delta_x")
        _, t_agg = timed(
            "delta_bounds aggregate",
            lambda: CS._delta_bounds(
                w, "cell", CS.payload_column("float")[1], 64))
        fresh = CS._delta_bounds(w, "cell",
                                 CS.payload_column("float")[1], 64)
        existing = CS.load_stats(spark, root)

        def rmw():
            keys = dict(existing["keys"])
            for key, ent in fresh.items():
                old = keys.get(key)
                keys[key] = ent if old is None else {
                    "dmin": [min(a, b) for a, b in zip(old["dmin"],
                                                       ent["dmin"])],
                    "dmax": [max(a, b) for a, b in zip(old["dmax"],
                                                       ent["dmax"])],
                    "n": old["n"] + ent["n"]}
            import json
            from light_redistribution_in_3dptf_data_pipeline_spark.fs import write_text_atomic
            write_text_atomic(
                spark, f"{root}/_cellstats_prof.json",
                json.dumps({"version": 1, "payload": "nano",
                            "keys": keys}, sort_keys=True))
        timed("JSON RMW", rmw)
    import shutil
    shutil.rmtree(root, ignore_errors=True)
