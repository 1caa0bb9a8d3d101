"""Ranked maintenance advisory (plans/advisory.py — VERDICT r11
brief #4): injected skew, drift, pin-hoarding, and batch fan-out
each surface the RIGHT top-ranked action, each citing its signal;
a healthy root gets an empty list; verify_deployment(advise=True)
carries the advisory as an optional section."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    advisory as ADV)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    snapshots as SN)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def cl(spark, emb):
    return R.clustered_embeddings(emb).localCheckpoint()


def _drift(emb):
    """The diagonal cluster the frozen 8-cell quantizer splits
    across ≥3 cells (test_ann_streaming's fixture): queries from it
    measurably lose recall at nprobe=2."""
    return emb.filter("vec_id < 100").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: (x * 0.3
                          + F.when(i.isin([1, 3, 5, 7]), 5.0)
                          .otherwise(F.lit(0.0))).cast("float"))
        .alias("embedding"))


def test_healthy_root_needs_nothing(spark, cl, tmp_path):
    root = str(tmp_path / "ivf")
    I.init_ivf_index(spark, root, cl, train_k=8)
    I.ivf_ingest_delta(spark, root, cl, "d1")
    R.record_recall_sample(spark, root, "d1", n_queries=4, floor=0.9)
    rep = ADV.suggest_maintenance(spark, root)
    assert rep["actions"] == [] and rep["fsck_violations"] == []
    assert rep["kind"] == "ivf_incremental"


def test_drift_ranks_retrain_first(spark, emb, cl, tmp_path):
    """Injected drift decays the measured recall canary below floor
    AND piles into few cells — the advisory must rank
    retrain_migrate ABOVE the co-present skew compaction."""
    root = str(tmp_path / "ivf")
    I.init_ivf_index(spark, root, cl.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"),
        train_k=8)
    I.ivf_ingest_delta(spark, root, cl.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"), "d1")
    I.ivf_ingest_delta(spark, root, _drift(emb), "d2")
    R.record_recall_sample(spark, root, "d2", n_queries=8, floor=0.9)
    rep = ADV.suggest_maintenance(spark, root, occupancy_skew=2.0)
    names = [a["action"] for a in rep["actions"]]
    assert names[0] == "retrain_migrate", rep["actions"]
    assert "recall canary ended below floor" in \
        rep["actions"][0]["reason"]
    assert rep["actions"][0]["signal"]["recall"]["below_floor"]


def test_skew_ranks_hot_compaction_first(spark, cl, tmp_path):
    """A single-direction pile-up (all rows in one of 8 cells) trips
    the occupancy canary with a HEALTHY recall series → compact_hot
    is the top action and cites the hot cell."""
    root = str(tmp_path / "ivf")
    I.init_ivf_index(spark, root, cl, train_k=8)
    I.ivf_ingest_delta(spark, root, cl, "d1")
    # pile: 200 more vectors all on ONE axis → one hot cell
    pile = cl.filter("vec_id < 200").select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.transform("embedding",
                    lambda x, i: (x * 0.0
                                  + F.when(i == 0, 5.0)
                                  .otherwise(F.lit(0.0)))
                    .cast("float")).alias("embedding"))
    I.ivf_ingest_delta(spark, root, pile, "d2")
    rep = ADV.suggest_maintenance(spark, root, occupancy_skew=3.0)
    names = [a["action"] for a in rep["actions"]]
    assert names and names[0] == "compact_hot", rep["actions"]
    assert "occupancy skew" in rep["actions"][0]["reason"]
    assert rep["actions"][0]["signal"]["occupancy"]["max"] > 200


def test_pin_hoarding_and_batch_fanout(spark, emb, tmp_path):
    """An aged pin holding superseded batches → release_pins; many
    live batches → compact_batches; both cite their signals and
    rank below quality/skew actions by construction."""
    root = str(tmp_path / "ann")
    for i in range(5):
        A.ann_ingest_delta(
            spark, root,
            emb.filter((F.col("vec_id") >= 100 * i)
                       & (F.col("vec_id") < 100 * (i + 1))),
            f"d{i}")
    rep = ADV.suggest_maintenance(spark, root, max_live_batches=3)
    assert [a["action"] for a in rep["actions"]] == \
        ["compact_batches"]
    assert "5 live batches" in rep["actions"][0]["reason"]

    pin = SN.pin_snapshot(spark, root, owner="old-run",
                          created_at=1000.0)
    A.compact_ann_batches(spark, root)   # pin now holds superseded
    rep = ADV.suggest_maintenance(spark, root,
                                  max_pin_age_seconds=3600.0,
                                  now=1000.0 + 7200.0)
    names = [a["action"] for a in rep["actions"]]
    assert "release_pins" in names, rep["actions"]
    act = [a for a in rep["actions"]
           if a["action"] == "release_pins"][0]
    assert pin["snapshot_digest"] in act["signal"]["flagged"]
    assert "aged" in act["signal"]["flagged"][
        pin["snapshot_digest"]]["flags"]
    SN.release_pin(spark, root, pin["snapshot_digest"], owner=None)


def test_verify_deployment_carries_advice(spark, emb, cl, tmp_path):
    """advise=True: the one-call health check now ALSO answers 'what
    should I run' — per index root, ranked."""
    from test_snapshots import _docs

    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "c")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(0, 20)), "c1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    sub = cl.filter(F.col("vec_id").isin(ids))
    iroot = str(tmp_path / "ivf")
    I.init_ivf_index(spark, iroot, cl, train_k=8)
    I.ivf_ingest_delta(spark, iroot, sub, "d1", corpus_batch="c1")

    rep = verify_deployment(spark, croot, [iroot], advise=True)
    assert rep["violations"] == []
    assert rep["advice"][iroot]["actions"] == []
    # without advise the section is absent (default unchanged)
    rep2 = verify_deployment(spark, croot, [iroot])
    assert "advice" not in rep2
