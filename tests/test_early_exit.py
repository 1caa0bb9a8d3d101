"""Probe-time early exit from per-cell/bucket direction-box
statistics (plans/cellstats.py — VERDICT r12 brief #1): the bound is
SOUND (early-exit ≡ full-scan row-for-row at every fan-out, both
families, both storages, with and without rerank), the pruning
actually fires on clustered data, the stats survive the
ingest → retain → compact lifecycle (widen-only between compactions,
exact recompute at compaction), legacy stats-less roots degrade to
the plain probe, and the fsck names a box that no longer covers a
live row."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    cellstats as CS)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def cl(spark, emb):
    """The separable mixture fixture — the regime where boxes are
    tight and early exit pays."""
    return R.clustered_embeddings(emb).localCheckpoint()


@pytest.fixture(scope="module")
def roots(spark, cl, tmp_path_factory):
    """IVF float/int8 + LSH float/int8 roots over the clustered
    fixture, each ingested in TWO deltas (so widen-merge ran)."""
    base = tmp_path_factory.mktemp("ee")
    out = {}
    a, b = cl.filter("vec_id % 2 = 0"), cl.filter("vec_id % 2 = 1")
    for storage in ("float", "int8"):
        ir = str(base / f"ivf_{storage}")
        I.init_ivf_index(spark, ir, cl, train_k=8,
                         train_metric="dot", storage=storage)
        I.ivf_ingest_delta(spark, ir, a, "d1")
        I.ivf_ingest_delta(spark, ir, b, "d2")
        ar = str(base / f"ann_{storage}")
        A.ann_ingest_delta(spark, ar, a, "d1", storage=storage)
        A.ann_ingest_delta(spark, ar, b, "d2", storage=storage)
        out[f"ivf_{storage}"], out[f"ann_{storage}"] = ir, ar
    return out


def _qvec(df, vid):
    return [float(x) for x in
            df.filter(F.col("vec_id") == vid)
            .select("embedding").head()[0]]


def _rows(df):
    return [(int(r.vec_id), float(r.cosine)) for r in df.collect()]


def test_early_exit_equals_full_scan_ivf(spark, cl, roots):
    """The parity pin: every fan-out, both storages, with and
    without rerank — pruning loses NOTHING."""
    for storage in ("float", "int8"):
        root = roots[f"ivf_{storage}"]
        for vid in (0, 3, 41):
            qv = _qvec(cl, vid)
            for nprobe in (2, 4, 8):
                want = _rows(I.ivf_incremental_topk(
                    spark, root, qv, k=10, nprobe=nprobe,
                    exclude_id=vid))
                got = _rows(I.ivf_incremental_topk(
                    spark, root, qv, k=10, nprobe=nprobe,
                    exclude_id=vid, early_exit=True))
                assert got == want, (storage, vid, nprobe)
        if storage == "int8":
            qv = _qvec(cl, 0)
            want = _rows(I.ivf_incremental_topk(
                spark, root, qv, k=5, nprobe=4, exclude_id=0,
                rerank_vectors=cl))
            got = _rows(I.ivf_incremental_topk(
                spark, root, qv, k=5, nprobe=4, exclude_id=0,
                rerank_vectors=cl, early_exit=True))
            assert got == want


def test_early_exit_equals_full_scan_ann(spark, cl, roots):
    for storage in ("float", "int8"):
        root = roots[f"ann_{storage}"]
        for vid in (0, 3, 41):
            qv = _qvec(cl, vid)
            for hamming in (1, 2):
                want = _rows(A.ann_incremental_topk(
                    spark, root, qv, k=10, hamming=hamming,
                    exclude_id=vid))
                got = _rows(A.ann_incremental_topk(
                    spark, root, qv, k=10, hamming=hamming,
                    exclude_id=vid, early_exit=True))
                assert got == want, (storage, vid, hamming)
        if storage == "int8":
            qv = _qvec(cl, 0)
            want = _rows(A.ann_incremental_topk(
                spark, root, qv, k=5, hamming=2, exclude_id=0,
                rerank_vectors=cl))
            got = _rows(A.ann_incremental_topk(
                spark, root, qv, k=5, hamming=2, exclude_id=0,
                rerank_vectors=cl, early_exit=True))
            assert got == want


def test_pruning_fires_on_clustered_data(spark, cl, roots):
    """The point of the feature: at nprobe=4 on the separated
    mixture, the 3 non-seed cells' best-possible cosine against a
    query deep in its own cluster is below the in-cluster kth —
    they get SKIPPED (the scan prune PLANS.md audits)."""
    root = roots["ivf_int8"]
    stats = CS.load_stats(spark, root)
    assert stats is not None and stats["payload"] == "code"
    qv = _qvec(cl, 0)
    import math
    qci = [math.floor(x * 1e9 + 0.5) for x in qv]
    qsq = sum(c * c for c in qci) / 1e18
    meta = I._load_meta(spark, root)
    ranked = sorted(
        ((float(sum(int(s) * q for s, q in zip(r.csum, qci)))
          / (r.nv * 1e18), int(r.cell))
         for r in I._load_centroids(spark, root, meta)),
        key=lambda t: (-t[0], t[1]))
    probe_cells = [c for _, c in ranked[:4]]
    scan = I.read_ivf_postings(spark, root)
    scored, pruned = CS.early_exit_scored(
        stats, scan, "cell", probe_cells, qci, qsq, 10,
        lambda s: I._ivf_scores(s, qci, qsq, 0, "int8"))
    assert len(pruned) == 3, (probe_cells, pruned)
    # and the surviving frame still yields the exact top-k
    want = _rows(I.ivf_incremental_topk(spark, root, qv, k=10,
                                        nprobe=4, exclude_id=0))
    got = [(int(r.vec_id), float(r.cosine)) for r in
           scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
           .limit(10).collect()]
    assert got == want


def test_stats_lifecycle_and_fsck(spark, cl, tmp_path):
    """widen at ingest → superset after retention → exact recompute
    at compaction; the fsck checks coverage throughout and names a
    tampered box."""
    root = str(tmp_path / "ivf")
    I.init_ivf_index(spark, root, cl, train_k=8, train_metric="dot",
                     storage="int8")
    I.ivf_ingest_delta(spark, root, cl.filter("vec_id < 200"), "d1")
    rep = I.verify_ivf_index(spark, root)
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []

    I.ivf_ingest_delta(spark, root,
                       cl.filter("vec_id >= 200"), "d2")
    I.delete_ivf_vectors(spark, root, [1, 2, 3])
    rep = I.verify_ivf_index(spark, root)   # superset still covers
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []

    before = CS.load_stats(spark, root)
    I.compact_ivf_batches(spark, root)      # exact re-tighten
    after = CS.load_stats(spark, root)
    assert sum(e["n"] for e in after["keys"].values()) == \
        I.read_ivf_postings(spark, root).count()
    # recompute can only tighten or keep each bound
    for key, ent in after["keys"].items():
        old = before["keys"][key]
        assert all(n >= o for n, o in zip(ent["dmin"], old["dmin"]))
        assert all(n <= o for n, o in zip(ent["dmax"], old["dmax"]))
    rep = I.verify_ivf_index(spark, root)
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []

    # tamper: shrink one box — the fsck must name the coverage hole
    doc = CS.load_stats(spark, root)
    key = next(iter(doc["keys"]))
    doc["keys"][key]["dmax"] = [-1.0] * len(doc["keys"][key]["dmax"])
    from light_redistribution_in_3dptf_data_pipeline_spark.fs import (
        write_text_atomic)
    write_text_atomic(spark, f"{root}/{CS.STATS_NAME}",
                      json.dumps(doc))
    rep = I.verify_ivf_index(spark, root)
    assert any("cellstats" in v for v in rep["violations"])


def test_legacy_root_degrades_and_compaction_upgrades(spark, cl,
                                                      tmp_path):
    """A stats-less root: probes with early_exit=True fall back to
    the plain plan (same rows), further ingests do NOT start a
    partial (unsound) box, and the first compaction creates the
    file."""
    from light_redistribution_in_3dptf_data_pipeline_spark.fs import (
        delete_path)

    root = str(tmp_path / "ann")
    A.ann_ingest_delta(spark, root, cl.filter("vec_id < 200"), "d1",
                       storage="int8")
    delete_path(spark, f"{root}/{CS.STATS_NAME}")   # legacy root
    A.ann_ingest_delta(spark, root, cl.filter("vec_id >= 200"), "d2")
    assert CS.load_stats(spark, root) is None   # no partial box
    rep = A.verify_ann_index(spark, root)
    assert rep["cellstats_check"].startswith("skipped: no stats")
    assert rep["violations"] == []

    qv = _qvec(cl, 0)
    want = _rows(A.ann_incremental_topk(spark, root, qv, k=10,
                                        exclude_id=0))
    got = _rows(A.ann_incremental_topk(spark, root, qv, k=10,
                                       exclude_id=0,
                                       early_exit=True))
    assert got == want

    A.compact_ann_batches(spark, root)          # the upgrade pass
    stats = CS.load_stats(spark, root)
    assert stats is not None
    assert sum(e["n"] for e in stats["keys"].values()) == \
        A.read_ann_index(spark, root).count()
    rep = A.verify_ann_index(spark, root)
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []


def test_crashed_ingest_leaves_sound_superset(spark, cl, tmp_path):
    """The write-ahead story: a crash between the stats widen and
    the manifest leaves boxes covering never-committed rows — a
    SUPERSET, and the same-id retry stays fsck-clean."""
    root = str(tmp_path / "ivf")
    I.init_ivf_index(spark, root, cl, train_k=8, storage="int8")
    I.ivf_ingest_delta(spark, root, cl.filter("vec_id < 100"), "d1")
    with pytest.raises(RuntimeError, match="injected crash"):
        I.ivf_ingest_delta(spark, root,
                           cl.filter("vec_id >= 100"), "d2",
                           _crash_after=I.IVF_TABLE)
    rep = I.verify_ivf_index(spark, root)
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []
    I.ivf_ingest_delta(spark, root, cl.filter("vec_id >= 100"), "d2")
    rep = I.verify_ivf_index(spark, root)
    assert rep["cellstats_check"] == "checked"
    assert rep["violations"] == []


def test_batch_early_exit_equals_plain(spark, cl, roots):
    """Batch probes with early_exit=True equal the plain batch probe
    per qid — both families, both storages, incl. the int8 rerank
    and the chunked loop (the knobs compose)."""
    qids = [0, 3, 17, 41]
    queries = (cl.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))

    def rows(df):
        return sorted((int(r.qid), int(r.vec_id), float(r.cosine))
                      for r in df.collect())

    for storage in ("float", "int8"):
        want = rows(I.ivf_batch_topk(spark, roots[f"ivf_{storage}"],
                                     queries, k=10, nprobe=4))
        got = rows(I.ivf_batch_topk(spark, roots[f"ivf_{storage}"],
                                    queries, k=10, nprobe=4,
                                    early_exit=True))
        assert got == want, storage
        wanta = rows(A.ann_batch_topk(spark, roots[f"ann_{storage}"],
                                      queries, k=10, hamming=1))
        gota = rows(A.ann_batch_topk(spark, roots[f"ann_{storage}"],
                                     queries, k=10, hamming=1,
                                     early_exit=True))
        assert gota == wanta, storage

    # int8 + exact rerank + chunking, all composed with early exit
    want = rows(I.ivf_batch_topk(spark, roots["ivf_int8"], queries,
                                 k=5, nprobe=4, rerank_vectors=cl))
    got = rows(I.ivf_batch_topk(spark, roots["ivf_int8"], queries,
                                k=5, nprobe=4, rerank_vectors=cl,
                                early_exit=True,
                                max_queries_per_job=2))
    assert got == want
    wanta = rows(A.ann_batch_topk(spark, roots["ann_int8"], queries,
                                  k=5, hamming=2, rerank_vectors=cl))
    gota = rows(A.ann_batch_topk(spark, roots["ann_int8"], queries,
                                 k=5, hamming=2, rerank_vectors=cl,
                                 early_exit=True,
                                 max_queries_per_job=2))
    assert gota == wanta
