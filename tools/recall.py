#!/usr/bin/env python
"""Recall@k sweep for both incremental vector-index families
(plans/recall.py) in BOTH measurement regimes (VERDICT r10 brief
#2/#3), at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

- **uniform** — the fixture embeddings as-is: the ANN worst case
  (weakly separated neighbors), floor-calibration numbers.
- **clustered** — plans/recall.clustered_embeddings over the same
  ids: the separable regime where a healthy index must be
  near-perfect at default fan-out (IVF quantizer trained UNLABELED
  via plans/kmeans — the production path).

For each regime it builds a throwaway LSH root and a throwaway IVF
root, measures recall@10 vs exact brute force for nprobe ∈ {1,2,4}
(IVF) and Hamming fan-out ∈ {0,1,2} (LSH), and prints one JSON line.

PER-ROUND ARTIFACT: pass ``--out RECALL_rN.json`` (or set
$SPARK_GRAFT_RECALL_OUT) to also write the JSON to a committed file
— the round-over-round index-quality record next to BENCH_r{N}.json,
so recall drift is visible to the next review, not just to this
run's stderr. Protocol in README.md §recall.

    python tools/recall.py
    python tools/recall.py --out RECALL_r11.json
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
N_CLUSTERS = 8


def _sweep(spark, emb, queries, label: str,
           ivf_init_kwargs: dict, storage: str = "float") -> dict:
    """One regime: build LSH + IVF roots over ``emb`` (float or
    int8-compressed postings — r12), sweep the probe knobs, tear
    down."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import recall as R
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        ann_ingest_delta)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ivf_index import (
        init_ivf_index, ivf_ingest_delta)

    out: dict = {"lsh": {}, "ivf": {}}
    lsh_root = tempfile.mkdtemp(prefix=f"recall_{label}_lsh_")
    ivf_root = tempfile.mkdtemp(prefix=f"recall_{label}_ivf_")
    try:
        ann_ingest_delta(spark, lsh_root, emb, "all",
                         storage=storage)
        for h in (0, 1, 2):
            rep = R.measure_recall(spark, lsh_root, queries,
                                   hamming=h)
            out["lsh"][f"hamming={h}"] = rep["recall"]
            print(f"# {label} lsh hamming={h}: recall@10 = "
                  f"{rep['recall']}", file=sys.stderr)
        # margin-ranked multi-probe (r12 brief #7) at the SAME scan
        # budgets as the Hamming balls above (9 buckets ≙ hamming=1,
        # 37 ≙ hamming=2) — the curve that must dominate the ball's
        # at equal buckets probed
        for nb in (9, 37):
            rep = R.measure_recall(spark, lsh_root, queries,
                                   probe_buckets=nb)
            out["lsh"][f"multiprobe={nb}"] = rep["recall"]
            print(f"# {label} lsh multiprobe={nb}: recall@10 = "
                  f"{rep['recall']}", file=sys.stderr)

        init_ivf_index(spark, ivf_root, emb, storage=storage,
                       **ivf_init_kwargs)
        ivf_ingest_delta(spark, ivf_root,
                         emb.select("vec_id", "embedding"), "all")
        for np_ in (1, 2, 4):
            rep = R.measure_recall(spark, ivf_root, queries,
                                   nprobe=np_)
            out["ivf"][f"nprobe={np_}"] = rep["recall"]
            print(f"# {label} ivf nprobe={np_}: recall@10 = "
                  f"{rep['recall']}", file=sys.stderr)
    finally:
        shutil.rmtree(lsh_root, ignore_errors=True)
        shutil.rmtree(ivf_root, ignore_errors=True)
    return out


def main() -> None:
    out_path = os.environ.get("SPARK_GRAFT_RECALL_OUT")
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import recall as R
    from light_redistribution_in_3dptf_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")

    out = {"sf_dir": SF_DIR, "k": 10, "n_queries": N_QUERIES,
           "fixtures": {}}
    # uniform regime: labeled IVF init (the fixture carries labels)
    queries = R.sample_queries(emb, N_QUERIES)
    out["fixtures"]["uniform"] = _sweep(
        spark, emb, queries, "uniform", {"cell_col": "label"})
    # int8-compressed postings (r12): same fixture, same quantizer
    # family — the done-criterion is "recall unchanged at default
    # fan-out" vs the float rows above
    out["fixtures"]["uniform_int8"] = _sweep(
        spark, emb, queries, "uniform_int8", {"cell_col": "label"},
        storage="int8")
    # clustered regime: quantizer trained UNLABELED (plans/kmeans)
    cl = R.clustered_embeddings(emb, n_clusters=N_CLUSTERS) \
        .localCheckpoint()
    cl_queries = R.sample_queries(cl, N_QUERIES)
    out["fixtures"]["clustered"] = _sweep(
        spark, cl, cl_queries, "clustered", {"train_k": N_CLUSTERS})
    out["fixtures"]["clustered_int8"] = _sweep(
        spark, cl, cl_queries, "clustered_int8",
        {"train_k": N_CLUSTERS}, storage="int8")

    # multi-probe dominance curve (r12 brief #7), measured at 64
    # queries — the 20-query rows above keep round-over-round
    # continuity, but ±0.03 sampling noise at 20 queries can flip
    # the close ball-vs-multiprobe comparison (it did at budget 37);
    # this section is the apples-to-apples curve at lower variance:
    # ball and multiprobe on the SAME root, SAME 64 queries, equal
    # bucket budgets (occupancy-checked ~equal scan rows), plus the
    # intermediate budgets the Hamming ball cannot express at all.
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        ann_ingest_delta)
    mp_root = tempfile.mkdtemp(prefix="recall_mp_")
    try:
        ann_ingest_delta(spark, mp_root, emb, "all")
        mp_queries = R.sample_queries(emb, 64)
        curve: dict = {"n_queries": 64, "ball": {}, "multiprobe": {}}
        for h, nb in ((1, 9), (2, 37)):
            curve["ball"][str(nb)] = R.measure_recall(
                spark, mp_root, mp_queries, hamming=h)["recall"]
        for nb in (9, 16, 24, 37):
            curve["multiprobe"][str(nb)] = R.measure_recall(
                spark, mp_root, mp_queries,
                probe_buckets=nb)["recall"]
            print(f"# multiprobe curve nb={nb}: "
                  f"{curve['multiprobe'][str(nb)]}", file=sys.stderr)
        out["multiprobe_uniform_64q"] = curve
    finally:
        shutil.rmtree(mp_root, ignore_errors=True)

    # multi-table LSH (r13 VERDICT #3): L independent hyperplane
    # tables, candidates OR-ed — the production answer to the
    # single-hash recall ceiling. Same 64 queries as the curve
    # above; `scan_frac` is the expected fraction of the corpus
    # scanned (probed buckets / 2^J per table, summed — uniform
    # occupancy), so the IVF comparison is at an honest equal-rows
    # budget: uniform IVF nprobe=4 probes 4 of 8 label-cells = 0.50.
    for L in (2, 4):
        mt_root = tempfile.mkdtemp(prefix=f"recall_mt{L}_")
        try:
            ann_ingest_delta(spark, mt_root, emb, "all",
                             num_tables=L)
            sect: dict = {"n_queries": 64, "num_tables": L}
            for h, per_table in ((1, 9), (2, 37)):
                rep = R.measure_recall(spark, mt_root, mp_queries,
                                       hamming=h)
                key = f"hamming={h}"
                sect[key] = {
                    "recall": rep["recall"],
                    "scan_frac": round(L * per_table / 256, 4)}
                print(f"# mt L={L} {key}: recall@10 = "
                      f"{rep['recall']} (scan_frac "
                      f"{sect[key]['scan_frac']})", file=sys.stderr)
            for nb in (16, 37, 64):
                rep = R.measure_recall(spark, mt_root, mp_queries,
                                       probe_buckets=nb)
                key = f"multiprobe={nb}"
                sect[key] = {"recall": rep["recall"],
                             "scan_frac": round(nb / 256, 4)}
                print(f"# mt L={L} {key}: recall@10 = "
                      f"{rep['recall']} (scan_frac "
                      f"{sect[key]['scan_frac']})", file=sys.stderr)
            out[f"multitable_L{L}_uniform_64q"] = sect
        finally:
            shutil.rmtree(mt_root, ignore_errors=True)

    # multi-table rows beyond float/uniform (r15 brief #4): the int8
    # parity claim for mt roots rested on scorer tests alone, and the
    # clustered regime was never measured at L>1. Hamming rows only —
    # the budget curve above is the fan-out story; these rows answer
    # "does storage/regime change mt recall" (done bars: int8 within
    # 0.05 of the float rows above; clustered ≡ 1.0 like
    # single-table).
    def _mt_rows(src, qs, L, label, storage="float"):
        root = tempfile.mkdtemp(prefix=f"recall_mt{L}_{label}_")
        try:
            ann_ingest_delta(spark, root, src, "all", num_tables=L,
                             storage=storage)
            sect = {"n_queries": len(qs), "num_tables": L,
                    "storage": storage}
            for h, per_table in ((1, 9), (2, 37)):
                rep = R.measure_recall(spark, root, qs, hamming=h)
                sect[f"hamming={h}"] = {
                    "recall": rep["recall"],
                    "scan_frac": round(L * per_table / 256, 4)}
                print(f"# mt L={L} {label} hamming={h}: recall@10 = "
                      f"{rep['recall']}", file=sys.stderr)
            return sect
        finally:
            shutil.rmtree(root, ignore_errors=True)

    for L in (2, 4):
        out[f"multitable_L{L}_uniform_int8_64q"] = _mt_rows(
            emb, mp_queries, L, "int8", storage="int8")
        out[f"multitable_L{L}_clustered_64q"] = _mt_rows(
            cl, R.sample_queries(cl, 64), L, "clustered")

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
        print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
