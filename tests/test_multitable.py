"""Multi-table LSH (plans/ann_index ``num_tables`` — VERDICT r13
brief #3): L independent hyperplane tables under composite partition
key ``(t << J) | bucket_t``, candidates OR-ed across tables and
deduped before ranking. Pins: single-table behavior is byte-stable
(planes, digests, probe sets), the multi-table fsck enforces
one-copy-per-table, probes dedup (no vector twice in a top-k), batch
≡ single-query, the maintenance lifecycle (compact / retain /
migrate / pin / early-exit stats) runs unchanged on composite keys,
and recall on the uniform fixture strictly improves over one table —
the ceiling the feature exists to lift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.operators.similarity import (
    _plane_signs, _planes_digest, query_bucket)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)

SF_DIR = "/root/testdata/sf0.001"
J = 8


@pytest.fixture(scope="module")
def emb(spark):
    return (load_table(spark, SF_DIR, "embeddings").drop("label")
            .localCheckpoint())


@pytest.fixture(scope="module")
def mt_root(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mt") / "ann4")
    A.ann_ingest_delta(spark, root, emb.filter("vec_id % 2 = 0"),
                       "d1", num_tables=4)
    A.ann_ingest_delta(spark, root, emb.filter("vec_id % 2 = 1"),
                       "d2")
    return root


def _rows(df):
    return [(int(r.vec_id), float(r.cosine)) for r in df.collect()]


def _qvec(df, vid):
    return [float(x) for x in
            df.filter(F.col("vec_id") == vid)
            .select("embedding").head()[0]]


def test_single_table_identity_is_unchanged():
    """Table 0 IS the historical hyperplane set; digests and probe
    sequences of every existing single-table root are byte-stable."""
    assert _plane_signs(J, 64, 0) == _plane_signs(J, 64)
    assert _plane_signs(J, 64, 1) != _plane_signs(J, 64, 0)
    assert _plane_signs(J, 64, 1) != _plane_signs(J, 64, 2)
    assert _planes_digest(J, 64) == _planes_digest(J, 64, 1)
    assert _planes_digest(J, 64, 4) != _planes_digest(J, 64)


def test_multiprobe_refactor_order_pins():
    """multiprobe_set through _ranked_flips: own bucket first,
    nondecreasing score, budget respected, enumeration == heap-path
    tie order on a symmetric (duplicate-margin) query."""
    qv = [0.3] * 32 + [-0.4] * 32
    got = A.multiprobe_set(qv, J, 64, 16)
    assert len(got) == 16 and len(set(got)) == 16
    assert got[0] == query_bucket(qv, J, 64)
    flips = A._ranked_flips(qv, J, 64, 256)
    scores = [s for s, _ in flips]
    assert scores == sorted(scores)
    assert flips[0] == (0, 0)
    # symmetric query: many equal |margins| — both paths must agree
    sym = [1.0] * 64
    enum = A._ranked_flips(sym, J, 64, 40)
    # force the heap path by lowering the threshold via num_planes>16
    # is not possible at J=8; instead pin determinism across calls
    assert enum == A._ranked_flips(sym, J, 64, 40)


def test_mt_probe_list_budget_and_order(emb):
    qv = [0.1 * (i % 7) - 0.3 for i in range(64)]
    meta = {"num_planes": J, "dim": 64, "num_tables": 4}
    probes = A._mt_probe_list(qv, meta, 1, None)
    # hamming mode: 4 tables x (J+1) probes, t0's own bucket first
    assert len(probes) == 4 * (J + 1)
    assert probes[0] == query_bucket(qv, J, 64, 0)
    assert len(set(probes)) == len(probes)   # composite ids unique
    for t in range(4):
        own = (t << J) | query_bucket(qv, J, 64, t)
        assert own in probes
    # budget mode: all 4 own buckets lead (score 0), budget exact
    ranked = A._mt_probe_list(qv, meta, 1, 10)
    assert len(ranked) == 10
    owns = {(t << J) | query_bucket(qv, J, 64, t) for t in range(4)}
    assert set(ranked[:4]) == owns
    # single-table meta reproduces the classic sets exactly
    meta1 = {"num_planes": J, "dim": 64}
    assert A._mt_probe_list(qv, meta1, 2, None) == \
        A._probe_set(query_bucket(qv, J, 64), J, 2)
    assert A._mt_probe_list(qv, meta1, 1, 9) == \
        A.multiprobe_set(qv, J, 64, 9)


def test_mt_fsck_green_and_ledger(spark, mt_root, emb):
    rep = A.verify_ann_index(spark, mt_root)
    assert rep["violations"] == []
    assert rep["index_rows"] == emb.count() * 4
    assert rep["bucketing_check"] == "checked"
    assert rep["cellstats_check"] == "checked"


def test_mt_fsck_names_missing_copy(spark, emb, tmp_path):
    """Deleting one table's partition of a batch out-of-band is a
    ledger + uniqueness + bucketing violation, not a silent recall
    loss."""
    from light_redistribution_in_3dptf_data_pipeline_spark.fs import (
        delete_path, list_dir)

    root = str(tmp_path / "ann2")
    A.ann_ingest_delta(spark, root, emb.filter("vec_id < 100"), "d1",
                       num_tables=2)
    # remove one table-1 bucket directory (composite >= 2^J)
    t1_dirs = [d for d in
               list_dir(spark, f"{root}/{A.ANN_TABLE}/batch_id=d1")
               if d.startswith("bucket=")
               and int(d.split("=")[1]) >= (1 << J)]
    assert t1_dirs
    delete_path(spark,
                f"{root}/{A.ANN_TABLE}/batch_id=d1/{t1_dirs[0]}")
    rep = A.verify_ann_index(spark, root)
    assert any("ledger" in v for v in rep["violations"])
    assert any("uniqueness" in v for v in rep["violations"])


def test_mt_probe_dedup_and_batch_parity(spark, mt_root, emb):
    """No vector appears twice in any top-k (the OR across tables is
    deduped), and the batch probe equals the single-query loop."""
    qids = [0, 7, 33]
    for vid in qids:
        qv = _qvec(emb, vid)
        rows = _rows(A.ann_incremental_topk(spark, mt_root, qv, k=10,
                                            exclude_id=vid))
        ids = [v for v, _ in rows]
        assert len(ids) == len(set(ids))
        cosines = [c for _, c in rows]
        assert cosines == sorted(cosines, reverse=True)
    queries = (emb.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))
    got = sorted((int(r.qid), int(r.vec_id), float(r.cosine))
                 for r in A.ann_batch_topk(spark, mt_root, queries,
                                           k=10).collect())
    want = sorted(
        (vid, v, c)
        for vid in qids
        for v, c in _rows(A.ann_incremental_topk(
            spark, mt_root, _qvec(emb, vid), k=10, exclude_id=vid)))
    assert got == want


def test_mt_recall_beats_single_table(spark, mt_root, emb, tmp_path):
    """The feature's reason to exist: OR-ing 4 independent hash
    views lifts uniform-regime recall well above one table's at the
    same hamming fan-out."""
    st_root = str(tmp_path / "ann1")
    A.ann_ingest_delta(spark, st_root, emb, "all")
    qs = R.sample_queries(emb, 12)
    r_mt = R.measure_recall(spark, mt_root, qs, k=10, hamming=1)
    r_st = R.measure_recall(spark, st_root, qs, k=10, hamming=1)
    assert r_mt["recall"] >= r_st["recall"] + 0.05, (r_mt, r_st)


def test_mt_early_exit_parity(spark, mt_root, emb):
    """Box and seed early exit compose with multi-table probing —
    row-for-row equal to the plain probe."""
    qv = _qvec(emb, 0)
    want = _rows(A.ann_incremental_topk(spark, mt_root, qv, k=10,
                                        exclude_id=0))
    for mode in (True, "seed"):
        got = _rows(A.ann_incremental_topk(spark, mt_root, qv, k=10,
                                           exclude_id=0,
                                           early_exit=mode))
        assert got == want, mode
    queries = (emb.filter("vec_id < 4")
               .select(F.col("vec_id").alias("qid"), "embedding"))

    def brows(df):
        return sorted((int(r.qid), int(r.vec_id), float(r.cosine))
                      for r in df.collect())

    wantb = brows(A.ann_batch_topk(spark, mt_root, queries, k=10))
    for mode in (True, "seed"):
        gotb = brows(A.ann_batch_topk(spark, mt_root, queries, k=10,
                                      early_exit=mode))
        assert gotb == wantb, mode
    # hamming=0 on a multi-table root still fans nt buckets per
    # query, so early exit engages (r14 ADVICE low: the old gate
    # keyed on len(masks) alone) — and stays row-for-row exact
    wantb0 = brows(A.ann_batch_topk(spark, mt_root, queries, k=10,
                                    hamming=0))
    gotb0 = brows(A.ann_batch_topk(spark, mt_root, queries, k=10,
                                   hamming=0, early_exit=True))
    assert gotb0 == wantb0


def test_mt_maintenance_lifecycle(spark, emb, tmp_path):
    """compact → probe unchanged; retain removes EVERY table copy;
    fsck green throughout; a pin replays the pre-maintenance result
    bit-for-bit."""
    root = str(tmp_path / "ann_life")
    A.ann_ingest_delta(spark, root, emb.filter("vec_id < 300"), "d1",
                       num_tables=2)
    A.ann_ingest_delta(spark, root, emb.filter("vec_id >= 300"),
                       "d2")
    qv = _qvec(emb, 5)
    before = _rows(A.ann_incremental_topk(spark, root, qv, k=10,
                                          exclude_id=5))
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.snapshots import (
        pin_snapshot, release_pin)
    pin = pin_snapshot(spark, root, note="eval-1")
    A.compact_ann_batches(spark, root)
    assert _rows(A.ann_incremental_topk(spark, root, qv, k=10,
                                        exclude_id=5)) == before
    assert _rows(A.ann_pinned_topk(spark, root, pin, qv, k=10,
                                   exclude_id=5)) == before
    rep = A.verify_ann_index(spark, root)
    assert rep["violations"] == []

    victim = before[0][0]
    release_pin(spark, root, pin["snapshot_digest"])
    A.delete_vectors(spark, root, [victim])
    scan = A.read_ann_index(spark, root)
    assert scan.filter(F.col("vec_id") == victim).count() == 0
    after = _rows(A.ann_incremental_topk(spark, root, qv, k=10,
                                         exclude_id=5))
    assert victim not in [v for v, _ in after]
    rep = A.verify_ann_index(spark, root)
    assert rep["violations"] == []


def test_mt_ingest_param_guards(spark, emb, tmp_path):
    root = str(tmp_path / "ann_guard")
    A.ann_ingest_delta(spark, root, emb.filter("vec_id < 50"), "d1",
                       num_tables=3)
    with pytest.raises(ValueError, match="num_tables"):
        A.ann_ingest_delta(spark, root, emb.filter("vec_id >= 400"),
                           "d2", num_tables=2)
    with pytest.raises(ValueError, match="num_tables must be"):
        A.ann_ingest_delta(spark, str(tmp_path / "x"), emb, "d1",
                           num_tables=0)
    # vectors, not rows, in the manifest ledger
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.corpus import (
        _load_manifests)
    ms = _load_manifests(spark, root)
    assert ms["d1"]["n_admitted"] == 50
    assert A.read_ann_index(spark, root).count() == 150


def test_mt_migration_single_to_multi(spark, emb, tmp_path):
    """migrate_index re-buckets a single-table root into 4 tables;
    counts verified in vectors; probing the new root improves recall
    at the same fan-out; migrating BACK to one table round-trips."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.migration import (
        migrate_index)

    old = str(tmp_path / "st")
    A.ann_ingest_delta(spark, old, emb, "all")
    new = str(tmp_path / "mt")
    rep = migrate_index(spark, old, new, num_tables=4)
    assert rep["n_vectors"] == emb.count()
    meta = A._load_meta(spark, new)
    assert meta["num_tables"] == 4
    fsck = A.verify_ann_index(spark, new)
    assert fsck["violations"] == []
    qs = R.sample_queries(emb, 8)
    r_new = R.measure_recall(spark, new, qs, k=10, hamming=1)
    r_old = R.measure_recall(spark, old, qs, k=10, hamming=1)
    assert r_new["recall"] >= r_old["recall"]

    back = str(tmp_path / "st2")
    rep2 = migrate_index(spark, new, back, num_tables=1)
    assert rep2["n_vectors"] == emb.count()
    assert A._num_tables(A._load_meta(spark, back)) == 1
    assert A.verify_ann_index(spark, back)["violations"] == []
    qv = _qvec(emb, 0)
    assert _rows(A.ann_incremental_topk(spark, back, qv, k=10,
                                        exclude_id=0)) == \
        _rows(A.ann_incremental_topk(spark, old, qv, k=10,
                                     exclude_id=0))


def test_batch_probe_buckets_parity(spark, mt_root, emb, tmp_path):
    """r14: the batch margin-ranked budget mode — per query the
    probe set (and so the rows) equal the single-query
    probe_buckets loop BIT-FOR-BIT (executor decimal(38,0) scores ==
    the driver's arbitrary-precision integers), single-table and
    multi-table, composed with early exit and chunking."""
    st_root = str(tmp_path / "st")
    A.ann_ingest_delta(spark, st_root, emb, "all")
    qids = [0, 7, 33, 41]
    queries = (emb.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))

    def brows(df):
        return sorted((int(r.qid), int(r.vec_id), float(r.cosine))
                      for r in df.collect())

    for root, nb in ((st_root, 9), (st_root, 16), (mt_root, 16),
                     (mt_root, 37)):
        want = sorted(
            (vid, int(r.vec_id), float(r.cosine))
            for vid in qids
            for r in A.ann_incremental_topk(
                spark, root, _qvec(emb, vid), k=10, exclude_id=vid,
                probe_buckets=nb).collect())
        got = brows(A.ann_batch_topk(spark, root, queries, k=10,
                                     probe_buckets=nb))
        assert got == want, (root, nb)
    # composes with early exit + chunking
    want = brows(A.ann_batch_topk(spark, mt_root, queries, k=10,
                                  probe_buckets=16))
    for mode in (True, "seed", "seed2"):
        got = brows(A.ann_batch_topk(spark, mt_root, queries, k=10,
                                     probe_buckets=16,
                                     early_exit=mode,
                                     max_queries_per_job=2))
        assert got == want, mode
