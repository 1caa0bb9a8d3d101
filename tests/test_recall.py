"""Measured recall@k (plans/recall.py — VERDICT r10 brief #2): the
index-quality tripwire no structural fsck can provide. The fixture
embeddings are uniform-random 64-dim (the hardest case for any ANN
structure — neighbors are weakly separated), so the absolute numbers
are modest; what the suite pins is (a) a floor at the default
settings and (b) the monotone fan-out→recall curve. Both are exactly
reproducible: fixture, hyperplanes, and centroids are all
deterministic. Measured at sf0.001: LSH hamming 0/1/2 →
0.025/0.10/0.34; IVF nprobe 1/2/4 → 0.235/0.42/0.67."""

from __future__ import annotations

import pytest

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)

SF_DIR = "/root/testdata/sf0.001"
N_QUERIES = 20


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return R.sample_queries(emb, N_QUERIES)


@pytest.fixture(scope="module")
def lsh_root(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("recall") / "lsh")
    A.ann_ingest_delta(spark, root, emb, "all")
    return root


@pytest.fixture(scope="module")
def ivf_root(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("recall") / "ivf")
    I.init_ivf_index(spark, root, emb)
    I.ivf_ingest_delta(spark, root, emb.drop("label"), "all")
    return root


def test_lsh_recall_floor_at_defaults(spark, emb, lsh_root, queries):
    rep = R.measure_recall(spark, lsh_root, queries)   # hamming=1
    assert rep["param"] == {"hamming": 1}
    # measured 0.10 on this exact fixture; a drop below the floor
    # means the bucketing/probe/rerank chain lost neighbors
    assert rep["recall"] >= 0.08, rep


def test_lsh_recall_monotone_in_fanout(spark, lsh_root, queries):
    r = [R.measure_recall(spark, lsh_root, queries,
                          hamming=h)["recall"] for h in (0, 1, 2)]
    assert r[0] <= r[1] <= r[2], r
    assert r[2] >= 0.30, r    # measured 0.34


def test_ivf_recall_floor_at_defaults(spark, ivf_root, queries):
    rep = R.measure_recall(spark, ivf_root, queries)   # nprobe=2
    assert rep["param"] == {"nprobe": 2}
    assert rep["recall"] >= 0.35, rep    # measured 0.42


def test_ivf_recall_monotone_in_nprobe(spark, ivf_root, queries):
    r = [R.measure_recall(spark, ivf_root, queries,
                          nprobe=n)["recall"] for n in (1, 2, 4)]
    assert r[0] <= r[1] <= r[2], r
    assert r[2] >= 0.60, r    # measured 0.67


def test_full_fanout_recall_is_exact(spark, emb, ivf_root, queries):
    """Probing EVERY cell must reproduce brute force exactly —
    recall loss is pruning loss by construction, never scoring
    drift (the rerank and the ground truth share the fixed-point
    arithmetic)."""
    n_cells = int(
        spark.read.parquet(f"{ivf_root}/centroids").count())
    rep = R.measure_recall(spark, ivf_root, queries, nprobe=n_cells)
    assert rep["recall"] == 1.0, rep
