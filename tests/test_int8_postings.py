"""int8-compressed postings (plans/codes.py — VERDICT r11 brief #3):
both index families store symmetric int8 codes + per-vector scale
instead of float embeddings (~4× smaller on disk, measured), probes
score the exact scale-free code cosine and optionally exact-rerank a
short candidate slice against caller-supplied float vectors, and a
migration carries codes VERBATIM between int8 roots. Placement and
bucketing still compute from the original embeddings at ingest, so
directory layout/pruning equals float roots by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    migration as M)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    recall as R)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def roots(spark, emb, tmp_path_factory):
    """One float and one int8 IVF root over the SAME vectors and the
    SAME frozen quantizer, plus the LSH pair."""
    base = tmp_path_factory.mktemp("int8")
    out = {}
    for storage in ("float", "int8"):
        ir = str(base / f"ivf_{storage}")
        I.init_ivf_index(spark, ir, emb, storage=storage)
        I.ivf_ingest_delta(spark, ir, emb.drop("label"), "d1")
        ar = str(base / f"ann_{storage}")
        A.ann_ingest_delta(spark, ar, emb, "d1", storage=storage)
        out[f"ivf_{storage}"], out[f"ann_{storage}"] = ir, ar
    return out


def _qvec(emb, vid):
    return [float(x) for x in
            emb.filter(F.col("vec_id") == vid)
            .select("embedding").head()[0]]


def test_int8_layout_and_bytes(spark, roots):
    """Stored layout: codes + scale, NO embedding column; identical
    cell placement to the float root (routing used the original
    embeddings); fsck clean with the placement/bucketing check
    SKIPPED-and-said; postings bytes materially down. Byte ratios
    are scale-dependent (parquet per-file framing is a fixed cost):
    measured IVF 2.4× at sf0.001 (12 cells), 3.1× at sf0.1, 3.0× at
    sf1 — the embedding payload itself is 256→~66 B/vector (≈4×),
    vec_id+framing bound the whole-table ratio at ~3×. The LSH
    root's 2^8-bucket fan-out makes 500-row files framing-dominated
    (no ratio pinned here; measured 2.65× at sf1 / 20k rows), so the
    ANN assertions pin LAYOUT equality, and the IVF ratio ≥2×."""
    pi = I.read_ivf_postings(spark, roots["ivf_int8"])
    assert set(pi.columns) == {"vec_id", "code", "scale", "cell",
                               "batch_id"}
    pf = I.read_ivf_postings(spark, roots["ivf_float"])
    same = (pi.select("vec_id", "cell")
            .join(pf.select("vec_id",
                            F.col("cell").alias("fcell")), "vec_id")
            .filter(F.col("cell") == F.col("fcell")).count())
    assert same == pf.count() == 500

    fi = I.verify_ivf_index(spark, roots["ivf_int8"])
    ff = I.verify_ivf_index(spark, roots["ivf_float"])
    assert fi["violations"] == [] and ff["violations"] == []
    assert fi["storage"] == "int8" and ff["storage"] == "float"
    assert fi["placement_check"].startswith("skipped: int8")
    assert ff["placement_check"] == "checked"
    assert ff["table_bytes"] >= 2.0 * fi["table_bytes"], (
        ff["table_bytes"], fi["table_bytes"])

    ai = A.verify_ann_index(spark, roots["ann_int8"])
    af = A.verify_ann_index(spark, roots["ann_float"])
    assert ai["violations"] == [] and af["violations"] == []
    assert ai["bucketing_check"].startswith("skipped: int8")
    assert af["bucketing_check"] == "checked"
    assert ai["table_bytes"] > 0 and af["table_bytes"] > 0
    # bucket layout equal to the float root's (routing uncompressed)
    bi = A.read_ann_index(spark, roots["ann_int8"])
    bf = A.read_ann_index(spark, roots["ann_float"])
    assert (bi.select("vec_id", "bucket")
            .exceptAll(bf.select("vec_id", "bucket")).count()) == 0


def test_int8_probe_and_exact_rerank(spark, emb, roots):
    """A codes-only probe returns k rows scored by the exact
    scale-free code cosine; with ``rerank_vectors`` (the original
    floats) the probe's rows equal the FLOAT root's probe exactly —
    the cut·k code-cosine slice contains the true top-k on this
    fixture and the rerank arithmetic is the shared fixed-point
    cosine."""
    for vid in (0, 33, 120):
        qv = _qvec(emb, vid)
        want = [(int(r.vec_id), float(r.cosine)) for r in
                I.ivf_incremental_topk(spark, roots["ivf_float"], qv,
                                       k=10, exclude_id=vid).collect()]
        approx = I.ivf_incremental_topk(spark, roots["ivf_int8"], qv,
                                        k=10, exclude_id=vid).collect()
        assert len(approx) == 10
        got = [(int(r.vec_id), float(r.cosine)) for r in
               I.ivf_incremental_topk(
                   spark, roots["ivf_int8"], qv, k=10, exclude_id=vid,
                   rerank_vectors=emb).collect()]
        assert got == want, vid

        wanta = [(int(r.vec_id), float(r.cosine)) for r in
                 A.ann_incremental_topk(spark, roots["ann_float"], qv,
                                        k=10, exclude_id=vid).collect()]
        gota = [(int(r.vec_id), float(r.cosine)) for r in
                A.ann_incremental_topk(
                    spark, roots["ann_int8"], qv, k=10, exclude_id=vid,
                    rerank_vectors=emb).collect()]
        assert gota == wanta, vid


def test_int8_batch_equals_single(spark, emb, roots):
    """Batch probes over int8 roots match the single-query probe per
    qid — codes-only AND reranked, both families."""
    qids = [0, 7, 33, 120]
    queries = (emb.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))
    for rerank in (None, emb):
        batch = I.ivf_batch_topk(spark, roots["ivf_int8"], queries,
                                 k=5, nprobe=2,
                                 rerank_vectors=rerank)
        got = {}
        for r in batch.collect():
            got.setdefault(int(r.qid), []).append(
                (int(r.vec_id), float(r.cosine)))
        for qid in qids:
            want = [(int(r.vec_id), float(r.cosine)) for r in
                    I.ivf_incremental_topk(
                        spark, roots["ivf_int8"], _qvec(emb, qid),
                        k=5, nprobe=2, exclude_id=qid,
                        rerank_vectors=rerank).collect()]
            assert got[qid] == want, (qid, rerank is None)
        batch = A.ann_batch_topk(spark, roots["ann_int8"], queries,
                                 k=5, rerank_vectors=rerank)
        got = {}
        for r in batch.collect():
            got.setdefault(int(r.qid), []).append(
                (int(r.vec_id), float(r.cosine)))
        for qid in qids:
            want = [(int(r.vec_id), float(r.cosine)) for r in
                    A.ann_incremental_topk(
                        spark, roots["ann_int8"], _qvec(emb, qid),
                        k=5, exclude_id=qid,
                        rerank_vectors=rerank).collect()]
            assert got[qid] == want, (qid, rerank is None)


def test_int8_recall_unchanged(spark, emb, roots, tmp_path):
    """The brief's done-criterion: recall at the default fan-out is
    unchanged by compression on BOTH fixtures (uniform here;
    clustered below) — code-cosine ranking loses at most quantization
    noise, and the floors hold."""
    qs = R.sample_queries(emb, 12)
    for fam in ("ivf", "ann"):
        rf = R.measure_recall(spark, roots[f"{fam}_float"], qs)
        ri = R.measure_recall(spark, roots[f"{fam}_int8"], qs)
        assert ri["recall"] >= rf["recall"] - 0.05, (fam, rf, ri)

    cl = R.clustered_embeddings(emb).localCheckpoint()
    cqs = R.sample_queries(cl, 12)
    root = str(tmp_path / "cl_ivf8")
    I.init_ivf_index(spark, root, cl, train_k=8, storage="int8")
    I.ivf_ingest_delta(spark, root, cl, "all")
    assert R.measure_recall(spark, root, cqs)["recall"] >= 0.9
    aroot = str(tmp_path / "cl_ann8")
    A.ann_ingest_delta(spark, aroot, cl, "all", storage="int8")
    assert R.measure_recall(spark, aroot, cqs)["recall"] >= 0.9


def test_int8_migration_carries_codes_verbatim(spark, emb, roots,
                                               tmp_path):
    """int8→int8 migration: the new root re-routes under the new
    structure but stores the OLD codes verbatim (no second
    quantization); storage defaults to the old root's; an ingest
    requesting a mismatched storage on an existing root refuses."""
    new = str(tmp_path / "ann_new")
    rep = M.migrate_index(spark, roots["ann_int8"], new, num_planes=4)
    assert rep["n_vectors"] == 500
    old_codes = {int(r.vec_id): (list(r.code), int(r.scale))
                 for r in A.read_ann_index(
                     spark, roots["ann_int8"]).collect()}
    new_scan = A.read_ann_index(spark, new).collect()
    assert len(new_scan) == 500
    for r in new_scan:
        assert (list(r.code), int(r.scale)) == old_codes[int(r.vec_id)]
    assert A.verify_ann_index(spark, new)["violations"] == []

    ivf_new = str(tmp_path / "ivf_new")
    rep = M.migrate_index(spark, roots["ivf_int8"], ivf_new,
                          train_k=8, train_metric="dot")
    assert rep["n_vectors"] == 500
    oldc = {int(r.vec_id): (list(r.code), int(r.scale))
            for r in I.read_ivf_postings(
                spark, roots["ivf_int8"]).collect()}
    for r in I.read_ivf_postings(spark, ivf_new).collect():
        assert (list(r.code), int(r.scale)) == oldc[int(r.vec_id)]

    with pytest.raises(ValueError, match="stores 'int8'"):
        A.ann_ingest_delta(spark, roots["ann_int8"],
                           emb.filter("vec_id < 5"), "d2",
                           storage="float")


def test_int8_compact_retain_pin_dedup(spark, emb, tmp_path):
    """The maintenance stack holds on int8 roots: cross-batch id
    dedup, compaction, row-level retain, and a pinned probe that
    replays bit-identically after the live root moves on."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        snapshots as SN)

    root = str(tmp_path / "ivf8")
    I.init_ivf_index(spark, root, emb, storage="int8")
    I.ivf_ingest_delta(spark, root,
                       emb.filter("vec_id < 300").drop("label"), "d1")
    m = I.ivf_ingest_delta(spark, root,
                           emb.filter("vec_id < 400").drop("label"),
                           "d2")
    assert m["n_admitted"] == 100 and m["n_id_dupes"] == 300

    qv = _qvec(emb, 0)
    pin = SN.pin_snapshot(spark, root)
    # the pinned-vectors view is storage-independent: int8 roots
    # carry a dequantized embedding next to the stored code/scale,
    # so linked multimodal training reads keep working
    pv = SN.read_vectors_pinned(spark, root, pin)
    assert {"embedding", "code", "scale"} <= set(pv.columns)
    assert pv.count() == 400
    before = [(int(r.vec_id), float(r.cosine)) for r in
              I.ivf_pinned_topk(spark, root, pin, qv, k=5,
                                exclude_id=0).collect()]

    I.compact_ivf_batches(spark, root)
    assert I.verify_ivf_index(spark, root)["violations"] == []
    # the pinned view replays bit-identically after the live root
    # compacted away its batches (the pin holds them)
    after = [(int(r.vec_id), float(r.cosine)) for r in
             I.ivf_pinned_topk(spark, root, pin, qv, k=5,
                               exclude_id=0).collect()]
    assert after == before

    # retain correctly refuses while the pin covers affected rows
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.snapshots import (
        PinConflictError)
    with pytest.raises(PinConflictError):
        I.delete_ivf_vectors(spark, root, [1, 2, 3])
    SN.release_pin(spark, root, pin["snapshot_digest"])
    rid = I.delete_ivf_vectors(spark, root, [1, 2, 3])
    assert rid.startswith("retain-")
    assert I.verify_ivf_index(spark, root)["violations"] == []
    assert I.read_ivf_postings(spark, root).count() == 397


def test_codes_only_probe_column_order(spark, emb, roots):
    """Every probe path returns (vec_id, cosine, cell|bucket) in the
    SAME column order — the codes-only IVF probe used to emit
    (vec_id, cell, cosine), so positional consumers or schema-order
    unions across float/int8 roots got cell/cosine swapped
    (ADVICE r12)."""
    qv = _qvec(emb, 0)
    want_ivf = I.ivf_incremental_topk(
        spark, roots["ivf_float"], qv, k=3, exclude_id=0).columns
    got_ivf = I.ivf_incremental_topk(
        spark, roots["ivf_int8"], qv, k=3, exclude_id=0).columns
    assert got_ivf == want_ivf == ["vec_id", "cosine", "cell"]
    want_ann = A.ann_incremental_topk(
        spark, roots["ann_float"], qv, k=3, exclude_id=0).columns
    got_ann = A.ann_incremental_topk(
        spark, roots["ann_int8"], qv, k=3, exclude_id=0).columns
    assert got_ann == want_ann == ["vec_id", "cosine", "bucket"]
