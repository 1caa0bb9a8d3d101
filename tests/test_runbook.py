"""The auto-retrain RUNBOOK, end to end (VERDICT r11 brief #8): the
operational story a 100 TB deployment actually runs when embedding
drift decays probe quality with no structural invariant violated.

    drift lands → the streaming recall canary samples below floor →
    verify_deployment names it a violation and (advise=True) ranks
    retrain_migrate first → migrate_index(train_k=...,
    train_metric="dot") re-trains on the OLD root's own committed
    postings and backfills → atomic pointer cutover →
    the canary recovers ≥ 0.9 on the SAME drifted queries.

Every part exists and is unit-tested elsewhere (streaming canary:
test_ann_streaming; trainer: test_kmeans; migration/pointer:
test_migration; advisory: test_advisory); this is the one-scenario
composition, narrated in README.md §runbook."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    advisory as ADV)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    migration as M)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)
from light_redistribution_in_3dptf_data_pipeline_spark.streaming import (
    vectors as V)

SF_DIR = "/root/testdata/sf0.001"
FLOOR = 0.9


def _drop(emb, src_dir, name):
    from test_ann_streaming import _drop as d
    d(emb, "true", src_dir, name)


def test_auto_retrain_runbook(spark, tmp_path):
    base = load_table(spark, SF_DIR, "embeddings")
    # healthy population: 8 separable clusters at ids 1000+, so the
    # canary's smallest-id query sample grades the DRIFT once it
    # lands at ids 0..99 (the diagonal the frozen 8-cell quantizer
    # splits across ≥3 cells — recall structurally decays at
    # nprobe=2, the test_ann_streaming fixture)
    healthy = (R.clustered_embeddings(base)
               .select((F.col("vec_id") + 1000).alias("vec_id"),
                       "embedding"))
    drift = base.filter("vec_id < 100").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: (x * 0.3
                          + F.when(i.isin([1, 3, 5, 7]), 5.0)
                          .otherwise(F.lit(0.0))).cast("float"))
        .alias("embedding"))

    src = str(tmp_path / "drop")
    old = str(tmp_path / "ivf_v1")
    new = str(tmp_path / "ivf_v2")
    alias = str(tmp_path / "index.json")

    # day 0: stand the index up, aim the stream at it, drain healthy
    I.init_ivf_index(spark, old, healthy, train_k=8)
    M.set_index_pointer(spark, alias, old)
    _drop(healthy, src, "f0")
    V.run_vector_ingestion(spark, src, alias, recall_every_n_batches=1,
                           recall_floor=FLOOR).awaitTermination(120)
    hist = R.recall_history(spark, old)
    assert hist["samples"][-1]["recall"] >= FLOOR
    assert hist["below_floor"] == []

    # drift lands: the canary samples below floor IN OPERATION
    _drop(drift, src, "f1")
    V.run_vector_ingestion(spark, src, alias, recall_every_n_batches=1,
                           recall_floor=FLOOR).awaitTermination(120)
    hist = R.recall_history(spark, old)
    assert hist["below_floor"], hist
    decayed = hist["samples"][-1]["recall"]
    assert decayed < FLOOR

    # the one-call advisory names the fix and ranks it first
    rep = ADV.suggest_maintenance(spark, alias)
    assert rep["actions"][0]["action"] == "retrain_migrate"
    assert "migrate_index" in rep["actions"][0]["reason"]

    # run the prescribed fix: re-train on the OLD root's own
    # committed postings (train=None), dot metric (train ≡ serve
    # placement), backfill, verify, CUT OVER via the pointer
    mig = M.migrate_index(spark, old, new, train_k=12,
                          train_metric="dot", pointer=alias)
    assert mig["n_vectors"] == 600
    assert mig["fsck"]["violations"] == []
    assert M.resolve_index_root(spark, alias) == new

    # the canary recovers on the SAME drifted queries — measured
    # against the new root THROUGH the alias every reader uses
    doc = R.record_recall_sample(spark, alias, "post-cutover",
                                 n_queries=8, floor=FLOOR)
    assert doc["recall"] >= FLOOR, (decayed, doc)
    assert not doc["below_floor"]
    hist = R.recall_history(spark, alias)
    assert hist["samples"][-1]["batch_id"] == "post-cutover"
    assert hist["below_floor"] == []   # the new root's series is clean

    # the old root is untouched and still pin-readable — and the
    # restarted stream (re-resolving the alias) targets the new root
    assert I.verify_ivf_index(spark, old)["violations"] == []
    assert ADV.suggest_maintenance(spark, alias)["actions"] == []