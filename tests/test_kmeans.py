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


def test_dot_metric_deterministic_and_monotone(spark, emb):
    """metric="dot" (r11 brief #1) keeps the trainer's contract
    properties: bit-equal centroids/inertia under any partitioning,
    and (empirically pinned on this fixture — module docstring for
    why there is no general theorem) non-increasing L2 dispersion."""
    a = K.train_centroids(spark, emb, k=8, n_iters=6, metric="dot")
    b = K.train_centroids(spark, emb.repartition(7), k=8, n_iters=6,
                          metric="dot")
    assert a["centroids"] == b["centroids"]
    assert a["inertia"] == b["inertia"]
    assert a["metric"] == "dot"
    assert a["reseeds"] == [0] * a["n_iters_run"]
    assert all(x >= y for x, y in itertools.pairwise(a["inertia"]))
    assert a["inertia"][0] > a["inertia"][-1]
    with pytest.raises(ValueError, match="metric"):
        K.train_centroids(spark, emb, k=8, metric="cosine")


def _overlap_fixture(emb):
    """Deliberately OVERLAPPING clusters (r11 brief #1 done-
    criterion): 68 rows — ids 0..7 on axis0 at bimodal radii
    {1.0, 10.0} (the radial bait min-L2 training stratifies), ids
    8..37 on axis1 and 38..67 on axis2 at radius 5, original
    uniform embeddings shrunk to 0.1 as jitter. Deterministic
    content; measured below: l2-trained labels collapse under the
    quantizer's mean-dot placement (0.72 match), dot-trained labels
    ARE the placement (1.0)."""
    g = (F.when(F.col("vec_id") < 8, F.lit(0))
         .when(F.col("vec_id") < 38, F.lit(1)).otherwise(F.lit(2)))
    r = (F.when(F.col("vec_id") < 4, F.lit(1.0))
         .when(F.col("vec_id") < 8, F.lit(10.0)).otherwise(F.lit(5.0)))
    return (emb.filter("vec_id < 68").select(
        "vec_id",
        F.transform("embedding",
                    lambda x, i: (x * 0.1 + F.when(i == g, r)
                                  .otherwise(F.lit(0.0)))
                    .cast("float")).alias("embedding")))


def test_dot_training_matches_placement_on_overlap(spark, emb,
                                                   tmp_path):
    """The r11 brief #1 headline: on overlapping data, min-L2
    training labels vectors into cells the frozen quantizer will NOT
    place them into (placement==label 0.72 measured), while
    metric="dot" trains with the placement rule itself — ≥99% match
    by construction (measured 1.0) — and the dot-trained index
    measurably beats the l2-trained one on recall at the default
    fan-out (0.9 vs 0.8125 measured at nprobe=2)."""
    ov = _overlap_fixture(emb).localCheckpoint()
    frac, rec = {}, {}
    for metric in ("l2", "dot"):
        t = K.train_centroids(spark, ov, k=4, n_iters=12,
                              metric=metric)
        lab = t["labeled"].localCheckpoint()
        root = str(tmp_path / metric)
        I.init_ivf_index(spark, root, lab)
        assign = I.assign_cells(spark, root,
                                lab.select("vec_id", "embedding"))
        n = lab.count()
        frac[metric] = (lab.join(assign, "vec_id")
                        .filter(F.col("label") == F.col("cell"))
                        .count()) / n
        I.ivf_ingest_delta(spark, root, ov, "all")
        qs = R.sample_queries(ov, 8)   # ids 0..7 = the bait rows
        rec[metric] = R.measure_recall(spark, root, qs, k=10,
                                       nprobe=2)["recall"]
    assert frac["dot"] >= 0.99, frac
    assert frac["l2"] <= 0.90, frac   # measured 0.7206
    assert rec["dot"] >= rec["l2"] + 0.05, rec
    assert rec["dot"] >= 0.9, rec


def test_suggest_k_sizing(spark, emb, tmp_path):
    """nlist sizing heuristic (r11 brief #5): √N convention without
    a target, ⌈n/target⌉ with one, clamped to the corpus; and the
    end-to-end ``train_k="auto"`` index's occupancy median lands
    within 2× of the √N-implied cell size."""
    assert [K.suggest_k(n) for n in (1, 100, 10000)] == [1, 10, 100]
    assert K.suggest_k(10**8) == 10000
    assert K.suggest_k(10**8, target_cell_rows=100_000) == 1000
    assert K.suggest_k(5, target_cell_rows=1) == 5   # clamp: k <= n
    assert K.suggest_k(10**10, k_max=4096) == 4096
    with pytest.raises(ValueError, match="at least one"):
        K.suggest_k(0)
    with pytest.raises(ValueError, match="target_cell_rows"):
        K.suggest_k(100, target_cell_rows=0)

    root = str(tmp_path / "auto")
    meta = I.init_ivf_index(spark, root, emb.drop("label"),
                            train_k="auto", train_iters=4)
    assert meta["n_cells"] == K.suggest_k(500) == 22
    I.ivf_ingest_delta(spark, root, emb.drop("label"), "d1")
    occ = I.verify_ivf_index(spark, root)["cell_occupancy"]
    target = 500 / 22
    assert target / 2 <= occ["median"] <= 2 * target, occ


def test_reseed_shortfall_fallback(spark):
    """MORE starved cells than occupied cells (5 identical vectors,
    k=4 → one occupied cell, three empty): the fused per-cell
    candidates can't cover the empties, so the fallback top-N pass
    supplies the remainder — deterministically, under any
    partitioning, and the trainer still returns k centroids."""
    rows = [(i, [float(i == 99)] * 8) for i in (1, 2, 3, 4, 5)]
    vecs = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    rep = K.train_centroids(spark, vecs, k=4, n_iters=2, dim=8)
    assert rep["reseeds"][0] == 3       # 1 occupied, 3 starved
    assert len(rep["centroids"]) == 4   # every cell re-seeded
    rep2 = K.train_centroids(spark, vecs.repartition(5), k=4,
                             n_iters=2, dim=8)
    assert rep2["centroids"] == rep["centroids"]
    assert rep2["reseeds"] == rep["reseeds"]
    # the dot metric takes the same fallback path
    rep3 = K.train_centroids(spark, vecs, k=4, n_iters=2, dim=8,
                             metric="dot")
    assert rep3["reseeds"][0] == 3
    assert len(rep3["centroids"]) == 4


def _mixed_norm_fixture(emb, n_clusters=8, mag=20.0, heavy_mod=3):
    """Light axis clusters + a heavy (20× norm) DIAGONAL group every
    ``heavy_mod``-th row (direction between axis g and g+1) — the
    norm-bias regime (VERDICT r12 brief #3): under raw mean-dot the
    heavy rows drag their cells' means toward the diagonal, starving
    a cell and splitting light clusters across cells; unit-normed
    training is immune."""
    g = F.pmod(F.col("vec_id"), n_clusters)
    heavy = (F.pmod(F.col("vec_id"), heavy_mod) == 0)
    cl = R.clustered_embeddings(emb, n_clusters=n_clusters)
    diag = F.transform(
        "embedding",
        lambda x, i: (F.when(i == g, mag)
                      .when(i == F.pmod(g + 1, n_clusters), mag * 0.8)
                      .otherwise(x * 0.1)).cast("float"))
    return cl.select(
        "vec_id",
        F.when(heavy, diag).otherwise(F.col("embedding"))
        .alias("embedding"))


def test_spherical_deterministic_and_unit_normed(spark, emb):
    """normalize=True (r12 brief #3): bit-equal centroids under
    repartitioning, and every training input contributes ONE unit
    direction — each cell's ‖csum‖ ≤ nv·(1e9 + dim) (a sum of nv
    unit-norm int vectors), which the raw path's heavy rows break by
    construction."""
    mx = _mixed_norm_fixture(emb).localCheckpoint()
    a = K.train_centroids(spark, mx, k=8, n_iters=6, metric="dot",
                          normalize=True)
    b = K.train_centroids(spark, mx.repartition(13), k=8, n_iters=6,
                          metric="dot", normalize=True)
    assert a["centroids"] == b["centroids"]
    assert a["normalize"] is True
    # monotone L2 dispersion on the normalized inputs (empirical pin,
    # same convention as the raw dot-metric test)
    assert all(y <= x + 1e-9 for x, y in
               zip(a["inertia"], a["inertia"][1:]))
    for cell, csum, nv in a["centroids"]:
        norm = sum(int(s) * int(s) for s in csum) ** 0.5
        assert norm <= nv * (1e9 + 64), (cell, norm, nv)


def test_spherical_beats_raw_dot_on_mixed_norms(spark, emb,
                                                tmp_path):
    """The measured claim: on the mixed-norm fixture at nprobe=1,
    spherical training recalls MORE than raw dot (raw ≈0.92 vs
    normalized 1.0 measured) AND occupies every cell (raw starves
    one — its mean chased the heavy diagonal)."""
    mx = _mixed_norm_fixture(emb).localCheckpoint()
    qs = R.sample_queries(
        mx.filter(F.pmod(F.col("vec_id"), 3) != 0), 16)
    rec, occ = {}, {}
    for norm in (False, True):
        root = str(tmp_path / f"sph_{norm}")
        I.init_ivf_index(spark, root, mx, train_k=8,
                         train_metric="dot", train_normalize=norm)
        I.ivf_ingest_delta(spark, root, mx, "d1")
        rec[norm] = R.measure_recall(spark, root, qs, k=10,
                                     nprobe=1)["recall"]
        occ[norm] = I.verify_ivf_index(
            spark, root)["cell_occupancy"]["n_cells_occupied"]
        meta = I._load_meta(spark, root)
        assert meta.get("train_normalize", False) is norm
    assert rec[True] >= rec[False] + 0.05, rec
    assert rec[True] >= 0.99, rec
    assert occ[True] == 8 and occ[False] < 8, occ


def test_spherical_plumbs_through_migration(spark, emb, tmp_path):
    """migrate_index(train_normalize=True) re-trains spherically and
    the new root's meta records it."""
    mx = _mixed_norm_fixture(emb).localCheckpoint()
    old = str(tmp_path / "old")
    I.init_ivf_index(spark, old, mx, train_k=8)
    I.ivf_ingest_delta(spark, old, mx, "d1")
    new = str(tmp_path / "new")
    rep = M.migrate_index(spark, old, new, train_k=8,
                          train_metric="dot", train_normalize=True)
    assert rep["n_vectors"] == mx.count()
    assert I._load_meta(spark, new)["train_normalize"] is True
    assert I.verify_ivf_index(spark, new)["violations"] == []


def test_suggest_k_feedback_units():
    """The closed-loop sizing rule (r12 brief #5): uniform occupancy
    degrades exactly to suggest_k's n/target; measured skew s shrinks
    k by s so the MEDIAN cell hits target; clamps hold."""
    uniform = {"median": 50, "mean": 50.0}
    assert K.suggest_k_feedback(1000, uniform, 50) == \
        K.suggest_k(1000, 50) == 20
    skewed = {"median": 20, "mean": 80.0}   # s = 4
    assert K.suggest_k_feedback(1000, skewed, 50) == 5
    assert K.suggest_k_feedback(10, skewed, 50, k_min=2) == 2
    assert K.suggest_k_feedback(10**9, {"median": 1, "mean": 1.0},
                                1) == 65536
    with pytest.raises(ValueError):
        K.suggest_k_feedback(0, uniform, 50)
    with pytest.raises(ValueError):
        K.suggest_k_feedback(10, uniform, 0)


def test_feedback_k_lands_scan_budget_on_skewed_root(spark, emb,
                                                     tmp_path):
    """The closed loop e2e (r12 brief #5): a graded-skew root
    (cluster sizes 200/100/50/50/25×4), posting-scan budget
    target_cell_rows=80. √N sizing (k=22) re-trains to median
    occupancy 37.5 — MISSES the budget by >2× — while
    migrate_index(train_k="auto", target_cell_rows=80) consumes the
    old root's measured skew (suggest_k_feedback → k=4) and lands
    median 125, within 2×. Measured numbers pinned loosely (the
    trainer is deterministic, but the pin tolerates fixture-content
    drift)."""
    m = F.pmod(F.col("vec_id"), 20)
    g = (F.when(m < 8, 0).when(m < 12, 1).when(m < 14, 2)
         .when(m < 16, 3).otherwise(m - 12))
    skewed = emb.select(
        "vec_id",
        F.transform("embedding", lambda x, i:
                    (x * 0.1 + F.when(i == g, 5.0)
                     .otherwise(F.lit(0.0))).cast("float"))
        .alias("embedding")).localCheckpoint()
    old = str(tmp_path / "old")
    I.init_ivf_index(spark, old, skewed, train_k=8,
                     train_metric="dot")
    I.ivf_ingest_delta(spark, old, skewed, "d1")
    occ = I.verify_ivf_index(spark, old)["cell_occupancy"]
    target = 80
    k_fb = K.suggest_k_feedback(500, occ, target)
    assert k_fb < K.suggest_k(500) // 2   # √N=22 vs feedback 4

    # √N-sized retrain misses the budget by more than 2×
    sq = str(tmp_path / "sqrt")
    M.migrate_index(spark, old, sq, train_k="auto",
                    train_metric="dot")
    med_sq = I.verify_ivf_index(spark, sq)["cell_occupancy"]["median"]
    assert med_sq < target / 2, med_sq

    # feedback-sized retrain lands within 2× of the budget
    fb = str(tmp_path / "fb")
    M.migrate_index(spark, old, fb, train_k="auto",
                    train_metric="dot", target_cell_rows=target)
    meta_fb = I._load_meta(spark, fb)
    assert meta_fb["n_cells"] == k_fb
    med_fb = I.verify_ivf_index(spark, fb)["cell_occupancy"]["median"]
    assert target / 2 <= med_fb <= target * 2, med_fb
