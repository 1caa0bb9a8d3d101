#!/usr/bin/env python
"""Recall@k sweep for both incremental vector-index families
(plans/recall.py) at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1): builds a throwaway LSH root and a throwaway
IVF root over the fixture embeddings, measures recall@10 vs exact
brute force for nprobe ∈ {1,2,4} (IVF) and Hamming fan-out ∈ {0,1,2}
(LSH), and prints one JSON line — the numbers behind the defaults
recorded in README.md §recall.

    python tools/recall.py
    SPARK_GRAFT_SF_DIR=.localdata/sf1 python tools/recall.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("SPARK_GRAFT_RECALL_QUERIES", "20"))


def main() -> None:
    from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import recall as R
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        ann_ingest_delta)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (
        init_ivf_index, ivf_ingest_delta)
    from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = R.sample_queries(emb, N_QUERIES)

    out = {"sf_dir": SF_DIR, "k": 10, "n_queries": len(queries),
           "lsh": {}, "ivf": {}}
    lsh_root = tempfile.mkdtemp(prefix="recall_lsh_")
    ivf_root = tempfile.mkdtemp(prefix="recall_ivf_")
    try:
        ann_ingest_delta(spark, lsh_root, emb, "all")
        for h in (0, 1, 2):
            rep = R.measure_recall(spark, lsh_root, queries,
                                   hamming=h)
            out["lsh"][f"hamming={h}"] = rep["recall"]
            print(f"# lsh hamming={h}: recall@10 = {rep['recall']}",
                  file=sys.stderr)

        init_ivf_index(spark, ivf_root, emb)
        ivf_ingest_delta(spark, ivf_root, emb.drop("label"), "all")
        for np_ in (1, 2, 4):
            rep = R.measure_recall(spark, ivf_root, queries,
                                   nprobe=np_)
            out["ivf"][f"nprobe={np_}"] = rep["recall"]
            print(f"# ivf nprobe={np_}: recall@10 = {rep['recall']}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(lsh_root, ignore_errors=True)
        shutil.rmtree(ivf_root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
