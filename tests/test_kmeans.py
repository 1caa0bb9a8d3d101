"""Deterministic distributed k-means trainer (plans/kmeans.py —
VERDICT r10 brief #1): the unlabeled path for freezing the IVF
coarse quantizer. Pins the three contract properties — bit-equal
centroids under any partitioning, monotone Lloyd descent (exact
driver-side inertia), deterministic empty-cell re-seeding — plus the
two integration seams: ``init_ivf_index(train_k=)`` on an unlabeled
frame and ``migrate_index(train_k=)`` re-training on the old root's
own committed postings."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    kmeans as K)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    migration as M)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def trained(spark, emb):
    return K.train_centroids(spark, emb, k=8, n_iters=6)


def test_deterministic_under_repartitioning(spark, emb, trained):
    """Same input CONTENT ⇒ bit-equal centroids and inertia curve,
    however the frame is partitioned — the property exact int64
    component sums + exact-integer argmin keys buy."""
    rep = K.train_centroids(spark, emb.repartition(7), k=8, n_iters=6)
    assert rep["centroids"] == trained["centroids"]
    assert rep["inertia"] == trained["inertia"]
    assert rep["reseeds"] == trained["reseeds"]


def test_monotone_inertia(trained):
    """Lloyd descent: Σ‖x−μ‖² never increases across iterations
    (exact Fraction-derived values; no reseed noise on this
    fixture)."""
    assert trained["reseeds"] == [0] * trained["n_iters_run"]
    assert all(a >= b for a, b in itertools.pairwise(
        trained["inertia"])), trained["inertia"]
    assert trained["inertia"][0] > trained["inertia"][-1]


def test_labeled_frame_covers_k_cells(spark, trained):
    lab = trained["labeled"]
    labels = {int(r.label) for r in
              lab.select("label").distinct().collect()}
    assert labels == set(range(8))
    assert lab.count() == 500   # every input row labeled exactly once


def test_convergence_fixed_point(spark, emb):
    """With enough iterations the centroid table reaches an exact
    integer fixed point and the loop exits early."""
    rep = K.train_centroids(spark, emb, k=4, n_iters=50)
    assert rep["converged"]
    assert rep["n_iters_run"] < 50
    # converged ⇒ the last two inertia readings are equal (the final
    # assignment reproduced the same centroids)
    assert rep["inertia"][-1] == rep["inertia"][-2]


def test_empty_cell_reseeds_deterministically(spark):
    """k=3 over three identical vectors + one far outlier: at least
    two seeds coincide, so a cell starves on iteration 1 and the
    re-seed rule (farthest row, ties to smaller vec_id) must kick in
    — deterministically."""
    rows = [(1, [0.0] * 8), (2, [0.0] * 8), (3, [0.0] * 8),
            (4, [10.0] * 8)]
    vecs = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    rep = K.train_centroids(spark, vecs, k=3, n_iters=3, dim=8)
    assert rep["reseeds"][0] >= 1
    rep2 = K.train_centroids(spark, vecs.repartition(5), k=3,
                             n_iters=3, dim=8)
    assert rep2["centroids"] == rep["centroids"]
    assert rep2["reseeds"] == rep["reseeds"]


def test_k_larger_than_n_refuses(spark):
    vecs = spark.createDataFrame([(1, [0.0] * 8)],
                                 "vec_id BIGINT, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="cannot train 3 centroids"):
        K.train_centroids(spark, vecs, k=3, dim=8)


def test_init_ivf_index_from_unlabeled_frame(spark, emb, tmp_path):
    """``train_k=`` stands the frozen quantizer up from a plain
    (vec_id, embedding) frame — no label column anywhere — and the
    resulting index ingests, probes, and fscks exactly like a
    labeled-init one."""
    root = str(tmp_path / "ivf")
    meta = I.init_ivf_index(spark, root, emb.drop("label"),
                            train_k=8, train_iters=4)
    assert meta["n_cells"] == 8
    I.ivf_ingest_delta(spark, root, emb.drop("label"), "d1")
    assert I.verify_ivf_index(spark, root)["violations"] == []
    qvec = [float(x) for x in
            emb.filter("vec_id = 0").select("embedding").head()[0]]
    top = I.ivf_incremental_topk(spark, root, qvec, k=5,
                                 exclude_id=0).collect()
    assert len(top) == 5


def test_migrate_index_trains_on_old_postings(spark, emb, tmp_path):
    """The no-labels migration (brief #1 done-criterion): after a
    distribution shift, ``migrate_index(train_k=...)`` with NO
    training frame re-trains on the old root's own committed
    vectors and the new quantizer both SPREADS the shifted
    population (occupancy canary) and probes it at least as well as
    the old root did."""
    from test_migration import _shifted

    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    I.init_ivf_index(spark, old, emb)    # labeled init, 12 cells
    I.ivf_ingest_delta(spark, old, emb.drop("label"), "d1")
    shifted = _shifted(emb)
    I.ivf_ingest_delta(spark, old, shifted.drop("label"), "d2")
    occ_old = I.verify_ivf_index(spark, old)["cell_occupancy"]

    rep = M.migrate_index(spark, old, new, train_k=16, train_iters=6)
    assert rep["kind"] == "ivf_incremental"
    assert sorted(rep["batches_migrated"]) == ["migrate-d1",
                                               "migrate-d2"]
    assert I.verify_ivf_index(spark, new)["violations"] == []
    occ_new = I.verify_ivf_index(spark, new)["cell_occupancy"]
    # the shifted mass that piled into the old hot cell is spread
    assert occ_new["max"] < occ_old["max"]

    # probe quality on the shifted population: re-trained ≥ frozen
    sq = R.sample_queries(
        shifted.select("vec_id", "embedding"), 10)
    r_old = R.measure_recall(spark, old, sq, nprobe=2)["recall"]
    r_new = R.measure_recall(spark, new, sq, nprobe=2)["recall"]
    assert r_new >= r_old, (r_old, r_new)
