"""Measured recall@k (plans/recall.py — VERDICT r10 brief #2): the
index-quality tripwire no structural fsck can provide, pinned in TWO
regimes (VERDICT r10→r11 brief #2):

- **uniform-random** fixture embeddings (64-dim) — the hardest case
  for any ANN structure, neighbors weakly separated: the absolute
  numbers are modest, so these floors catch only catastrophic
  breakage. Measured at sf0.001: LSH hamming 0/1/2 →
  0.025/0.10/0.34; IVF nprobe 1/2/4 → 0.235/0.42/0.67.
- **clustered** fixture (:func:`clustered_embeddings` — per-group
  axis offsets over shrunk noise, the deterministic
  mixture-of-clusters real embedding distributions resemble): a
  HEALTHY index must score ≥ 0.9 at the default fan-out
  (nprobe=2 / hamming=1; measured 1.0 for both families, IVF
  quantizer trained UNLABELED by plans/kmeans). A structural
  regression that the worst-case floors would absorb trips here.

Everything is exactly reproducible: fixtures, hyperplanes, seeds,
and centroids are all deterministic. tools/recall.py sweeps both
regimes and writes the per-round RECALL_r{N}.json artifact."""

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
N_CLUSTERS = 8

clustered_embeddings = R.clustered_embeddings


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


@pytest.fixture(scope="module")
def cl_emb(spark, emb):
    return clustered_embeddings(emb).localCheckpoint()


@pytest.fixture(scope="module")
def cl_queries(cl_emb):
    return R.sample_queries(cl_emb, N_QUERIES)


@pytest.fixture(scope="module")
def cl_lsh_root(spark, cl_emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("recall") / "cl_lsh")
    A.ann_ingest_delta(spark, root, cl_emb, "all")
    return root


@pytest.fixture(scope="module")
def cl_ivf_root(spark, cl_emb, tmp_path_factory):
    """Quantizer trained UNLABELED (plans/kmeans via train_k) — the
    production path for real embeddings, so the high floor guards
    the trainer AND the index together."""
    root = str(tmp_path_factory.mktemp("recall") / "cl_ivf")
    I.init_ivf_index(spark, root, cl_emb, train_k=N_CLUSTERS)
    I.ivf_ingest_delta(spark, root, cl_emb, "all")
    return root


def test_clustered_lsh_recall_floor(spark, cl_lsh_root, cl_queries):
    """On separable data the default probe must be near-perfect —
    the sharp tripwire (measured 1.0)."""
    rep = R.measure_recall(spark, cl_lsh_root, cl_queries)  # h=1
    assert rep["recall"] >= 0.9, rep


def test_clustered_ivf_recall_floor(spark, cl_ivf_root, cl_queries,
                                    ivf_root, queries):
    """Trained-unlabeled IVF at nprobe=2 must reach ≥0.9 on the
    clustered fixture (measured 1.0) — and beat the labeled-init
    uniform-fixture recall (brief #1 done-criterion: the trainer
    must not be worse than caller labels on data it can separate)."""
    rep = R.measure_recall(spark, cl_ivf_root, cl_queries)  # np=2
    assert rep["recall"] >= 0.9, rep
    labeled_uniform = R.measure_recall(spark, ivf_root, queries)
    assert rep["recall"] >= labeled_uniform["recall"], (
        rep, labeled_uniform)


def test_clustered_trained_cells_are_balanced(spark, cl_ivf_root):
    """The trainer must actually FIND the clusters: 8 occupied cells
    with near-uniform occupancy (a collapsed quantizer would pass a
    recall floor at high nprobe but fail this)."""
    occ = I.verify_ivf_index(spark, cl_ivf_root)["cell_occupancy"]
    assert occ["n_cells_occupied"] == N_CLUSTERS
    assert occ["max"] <= 2 * occ["median"], occ


def test_full_fanout_recall_is_exact(spark, emb, ivf_root, queries):
    """Probing EVERY cell must reproduce brute force exactly —
    recall loss is pruning loss by construction, never scoring
    drift (the rerank and the ground truth share the fixed-point
    arithmetic)."""
    n_cells = int(
        spark.read.parquet(f"{ivf_root}/centroids").count())
    rep = R.measure_recall(spark, ivf_root, queries, nprobe=n_cells)
    assert rep["recall"] == 1.0, rep


def test_batch_recall_equals_per_query(spark, lsh_root, ivf_root,
                                       queries):
    """measure_recall_batch (r11, built on the batch probes) must
    report the SAME recall as the per-query loop — the probes are
    parity-pinned and the full-fan-out batch truth is brute force by
    construction."""
    for kw in ({"nprobe": 1}, {"nprobe": 2}):
        a = R.measure_recall(spark, ivf_root, queries, **kw)
        b = R.measure_recall_batch(spark, ivf_root, queries, **kw)
        assert a["recall"] == b["recall"], (kw, a, b)
    for kw in ({"hamming": 0}, {"hamming": 1}):
        a = R.measure_recall(spark, lsh_root, queries, **kw)
        b = R.measure_recall_batch(spark, lsh_root, queries, **kw)
        assert a["recall"] == b["recall"], (kw, a, b)


def test_batch_recall_accepts_none_exclude_ids(spark, ivf_root,
                                               lsh_root, queries):
    """ADVICE r11: measure_recall's query contract allows
    exclude_id=None (grade without self-exclusion); the batch variant
    must accept the same queries — synthetic negative qids make the
    vec_id==qid exclusion a no-op for exactly those entries."""
    none_q = [(None, vec) for _, vec in queries]
    for root, kw in ((ivf_root, {"nprobe": 2}),
                     (lsh_root, {"hamming": 1})):
        a = R.measure_recall(spark, root, none_q, **kw)
        b = R.measure_recall_batch(spark, root, none_q, **kw)
        assert a["recall"] == b["recall"], (kw, a, b)
    # mixed real/None ids also grade consistently
    mixed = [q if i % 2 == 0 else (None, q[1])
             for i, q in enumerate(queries)]
    a = R.measure_recall(spark, ivf_root, mixed)
    b = R.measure_recall_batch(spark, ivf_root, mixed)
    assert a["recall"] == b["recall"], (a, b)


# --- margin-ranked multi-probe LSH (r12 brief #7) -------------------

def test_multiprobe_set_properties(emb):
    """Order contract: first probe = the query's own bucket; budget
    respected; deterministic; scores nondecreasing in the flip
    masks' Σ margin²; the >16-plane heap path yields exactly the
    enumeration order (cross-checked at J=17)."""
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.similarity import (
        query_bucket, query_margins)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        multiprobe_set)

    qv = [float(x) for x in
          emb.filter("vec_id = 0").select("embedding").head()[0]]
    seq = multiprobe_set(qv, 8, 64, 9)
    b = query_bucket(qv, 8, 64)
    assert seq[0] == b and len(seq) == 9 == len(set(seq))
    assert all(0 <= x < 256 for x in seq)
    assert seq == multiprobe_set(qv, 8, 64, 9)
    m2 = [m * m for m in query_margins(qv, 8, 64)]
    scores = [sum(m2[j] for j in range(8) if (x ^ b) >> j & 1)
              for x in seq]
    assert scores == sorted(scores)
    # full budget = every bucket exactly once
    assert sorted(multiprobe_set(qv, 8, 64, 256)) == list(range(256))

    # heap path (J=17) ≡ brute enumeration
    seq17 = multiprobe_set(qv, 17, 64, 40)
    m2 = [m * m for m in query_margins(qv, 17, 64)]
    b17 = query_bucket(qv, 17, 64)
    brute = sorted(range(1 << 17),
                   key=lambda mask: (sum(m2[j] for j in range(17)
                                         if mask >> j & 1), mask))
    assert seq17 == [b17 ^ mask for mask in brute[:40]]


def test_multiprobe_dominates_hamming_ball(spark, lsh_root, queries):
    """The measured claim (r12 brief #7): at EQUAL buckets probed,
    the margin-ranked sequence recalls at least as much as the
    Hamming ball on the uniform fixture — and strictly more at the
    h=1 budget (measured at sf0.001: 0.1125 ball vs 0.1438
    multiprobe at 9 buckets; 0.3438 vs 0.3938 at 37)."""
    for h, nb in ((0, 1), (1, 9), (2, 37)):
        ball = R.measure_recall(spark, lsh_root, queries,
                                hamming=h)["recall"]
        mp = R.measure_recall(spark, lsh_root, queries,
                              probe_buckets=nb)["recall"]
        assert mp >= ball, (h, nb, ball, mp)
    ball1 = R.measure_recall(spark, lsh_root, queries,
                             hamming=1)["recall"]
    mp9 = R.measure_recall(spark, lsh_root, queries,
                           probe_buckets=9)["recall"]
    assert mp9 > ball1, (ball1, mp9)


def test_multiprobe_full_budget_is_exact(spark, lsh_root, queries):
    """probe_buckets = 2^J reproduces brute force exactly — the
    same pruning-only loss law as the full Hamming ball."""
    rep = R.measure_recall(spark, lsh_root, queries,
                           probe_buckets=256)
    assert rep["recall"] == 1.0
