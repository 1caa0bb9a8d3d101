#!/usr/bin/env python
"""r13 VERDICT #7 measurement: pruned-pair fraction of the batch
early exit, seed vs seed2 (one iterative tightening round), on a
MODERATELY clustered 16-cluster fixture — the regime where the seed
threshold leaves marginal cells the re-tightened bound can still
prove away. Counts the distinct (qid, cell) pairs each mode actually
fans out (intercepting the shared batch scorer) at equal parity."""
import json
import os
import sys

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import ivf_index as IVF
from light_redistribution_in_3dptf_data_pipeline_spark.plans.recall import (
    clustered_embeddings)
from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="seed2")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).mapInPandas(lambda it: (p for p in it),
                           schema="id long").collect()

emb = load_table(spark, SF_DIR, "embeddings").drop("label")
# moderate separation: clusters overlap enough that rank-2 cells
# hold real candidates and the seed threshold alone is loose
clu = clustered_embeddings(emb, n_clusters=16, offset=1.2,
                           noise=0.7).localCheckpoint()
import tempfile

root = tempfile.mkdtemp(prefix="seed2_")
IVF.init_ivf_index(spark, root, clu, train_k=16, train_metric="dot",
                   storage="int8")
IVF.ivf_ingest_delta(spark, root, clu, "all")
IVF.compact_ivf_batches(spark, root)

queries = (clu.filter("vec_id < 32")
           .select(F.col("vec_id").alias("qid"), "embedding")
           .localCheckpoint())
NPROBE = 8

real_score = IVF._ivf_batch_score
counter = {"pairs": 0}


def counting_score(cand, storage):
    counter["pairs"] += (cand.select("qid", "cell").distinct()
                         .count())
    return real_score(cand, storage)


out = {}
rows_by_mode = {}
for mode in (False, True, "seed", "seed2"):
    IVF._ivf_batch_score = counting_score
    counter["pairs"] = 0
    df = IVF.ivf_batch_topk(spark, root, queries, k=10,
                            nprobe=NPROBE, early_exit=mode)
    rows = sorted((int(r.qid), int(r.vec_id), float(r.cosine))
                  for r in df.collect())
    IVF._ivf_batch_score = real_score
    rows_by_mode[mode] = rows
    out[str(mode)] = {"pairs_scanned": counter["pairs"]}
    print(f"# mode={mode}: {counter['pairs']} (qid,cell) pairs "
          f"fanned out", file=sys.stderr)

base = out["False"]["pairs_scanned"]
for mode in ("True", "seed", "seed2"):
    out[mode]["pruned_frac"] = round(
        1 - out[mode]["pairs_scanned"] / base, 4)
assert all(rows_by_mode[m] == rows_by_mode[False]
           for m in (True, "seed", "seed2")), "parity violated!"
out["parity"] = "all modes row-for-row equal"
out["fixture"] = {"n_clusters": 16, "offset": 1.2, "noise": 0.7,
                  "nprobe": NPROBE, "queries": 32,
                  "sf_dir": SF_DIR}
print(json.dumps(out))
