"""Incrementally-maintained ANN index (plans/ann_index.py): one-shot
equivalence, exactly-once commits, crash recovery, id dedup, meta
drift, compaction identity, retention, lease, and the pruned-scan
plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.operators import (
    similarity as S)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans.corpus import (
    BatchAlreadyIngested, ConcurrentWriterError)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter("vec_id = 0").select("embedding").collect()[0]
    return [float(x) for x in row[0]]


def _thirds(emb):
    return [emb.filter(F.pmod(F.col("vec_id"), 3) == i)
            for i in range(3)]


def _topk(spark, root, qvec):
    return [(r.vec_id, r.cosine, r.bucket) for r in
            A.ann_incremental_topk(spark, root, qvec,
                                   exclude_id=0).collect()]


def test_incremental_equals_one_shot(spark, emb, qvec, tmp_path):
    """Three deltas committed incrementally return exactly the one-shot
    stored index's top-k (same planes ⇒ same buckets ⇒ same probe
    set ⇒ identical exact re-rank)."""
    root = str(tmp_path / "inc")
    for i, part in enumerate(_thirds(emb)):
        m = A.ann_ingest_delta(spark, root, part, f"b{i}")
        assert m["n_admitted"] == m["n_input"] > 0
    one = str(tmp_path / "oneshot")
    S.write_ann_index(emb, one)
    expect = [(r.vec_id, r.cosine, r.bucket) for r in
              S.ann_indexed_topk(spark, one, qvec,
                                 exclude_id=0).collect()]
    assert _topk(spark, root, qvec) == expect
    assert (A.read_ann_index(spark, root).count() == emb.count())


def test_batch_identity_and_id_dedup(spark, emb, tmp_path):
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "day0")
    with pytest.raises(BatchAlreadyIngested):
        A.ann_ingest_delta(spark, root, first, "day0")
    # re-delivered rows: overlap dropped by the id gate, new admitted
    m = A.ann_ingest_delta(spark, root,
                           first.unionByName(second), "day1")
    assert m["n_id_dupes"] == first.count()
    assert m["n_admitted"] == second.count()
    ids = {r.vec_id for r in
           A.read_ann_index(spark, root).select("vec_id").collect()}
    assert ids == {r.vec_id for r in
                   first.unionByName(second).collect()}


def test_crash_before_manifest_is_invisible_then_retryable(
        spark, emb, qvec, tmp_path):
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "day0")
    with pytest.raises(RuntimeError, match="injected crash"):
        A.ann_ingest_delta(spark, root, second, "day1",
                           _crash_after=A.ANN_TABLE)
    # uncommitted partition exists on disk but no reader sees it
    assert (A.read_ann_index(spark, root)
            .select("batch_id").distinct().collect()
            == [("day0",)])
    # retry under the same id: swept and re-ingested exactly once
    m = A.ann_ingest_delta(spark, root, second, "day1")
    assert m["n_admitted"] == second.count()
    assert (A.read_ann_index(spark, root).count()
            == first.count() + second.count())


def test_empty_first_batch_then_ingest(spark, emb, tmp_path):
    """ADVICE r8: committed batches that all admitted zero vectors
    leave no buckets/ directory at all — the id-dedup gate must skip
    its anti-join, not crash on the missing path."""
    root = str(tmp_path / "ix")
    m = A.ann_ingest_delta(spark, root, emb.filter("vec_id < 0"), "b0")
    assert m["n_admitted"] == 0
    first = _thirds(emb)[0]
    m = A.ann_ingest_delta(spark, root, first, "b1")
    assert m["n_admitted"] == first.count()


def test_meta_drift_raises(spark, emb, tmp_path):
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "b0")
    with pytest.raises(ValueError, match="different parameters"):
        A.ann_ingest_delta(spark, root, second, "b1", num_planes=6)
    with pytest.raises(ValueError, match="64-dim"):
        A.ann_incremental_topk(spark, root, [0.0] * 10)
    with pytest.raises(ValueError, match="no _meta.json"):
        A.read_ann_index(spark, str(tmp_path / "nowhere"))


def test_compaction_preserves_results(spark, emb, qvec, tmp_path):
    root = str(tmp_path / "ix")
    for i, part in enumerate(_thirds(emb)):
        A.ann_ingest_delta(spark, root, part, f"b{i}")
    before = _topk(spark, root, qvec)
    cid = A.compact_ann_batches(spark, root, ["b0", "b1"])
    assert _topk(spark, root, qvec) == before
    assert A.committed_ann_batches(spark, root) == ["b2", cid]
    # replayed pre-compaction batch still reads as already-ingested
    with pytest.raises(BatchAlreadyIngested):
        A.ann_ingest_delta(spark, root, _thirds(emb)[0], "b0")
    # chained compaction keeps identity memory transitively
    cid2 = A.compact_ann_batches(spark, root)
    assert _topk(spark, root, qvec) == before
    assert A.committed_ann_batches(spark, root) == [cid2]


def test_delete_vector_batch(spark, emb, qvec, tmp_path):
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "b0")
    A.ann_ingest_delta(spark, root, second, "b1")
    A.delete_vector_batch(spark, root, "b1")
    assert A.committed_ann_batches(spark, root) == ["b0"]
    # deleted ids are re-admittable (id gate consults committed only)
    m = A.ann_ingest_delta(spark, root, second, "b1-again")
    assert m["n_id_dupes"] == 0
    with pytest.raises(ValueError, match="not a live committed"):
        A.delete_vector_batch(spark, root, "nope")


def test_delete_vectors_row_level(spark, emb, qvec, tmp_path):
    """Row-level vector takedown inside a COMPACTED batch — the case
    batch-level retention cannot serve: only the affected batch
    rewrites, the probe stops returning the vector, deleted ids are
    re-admittable, and the fsck stays clean."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.corpus import (
        read_manifest)

    root = str(tmp_path / "ix")
    first, second, third = _thirds(emb)
    for i, part in enumerate(_thirds(emb)):
        A.ann_ingest_delta(spark, root, part, f"b{i}")
    A.compact_ann_batches(spark, root, ["b0", "b1"])

    # target: a vector inside the compacted batch
    tid = int(first.filter("vec_id > 0")
              .agg(F.min("vec_id")).head()[0])
    cid = A.delete_vectors(spark, root, [tid])
    assert cid == "retain-000000"
    # only the affected (compacted) batch was rewritten; b2 survives
    assert A.committed_ann_batches(spark, root) == ["b2", cid]
    assert (A.read_ann_index(spark, root).count()
            == emb.count() - 1)
    assert not (A.read_ann_index(spark, root)
                .filter(F.col("vec_id") == tid).count())
    m = read_manifest(spark, root, cid)
    assert m["n_deleted"] == 1
    assert "compact-000000" in m["replaces"]
    v = A.verify_ann_index(spark, root)
    assert v["violations"] == [] and v["orphans"] == []
    # probe results no longer contain the deleted vector
    got = {r.vec_id for r in
           A.ann_incremental_topk(spark, root, qvec,
                                  exclude_id=0).collect()}
    assert tid not in got
    # deleted id is re-admittable through the id-dedup gate
    m2 = A.ann_ingest_delta(spark, root,
                            emb.filter(F.col("vec_id") == tid),
                            "readd")
    assert m2["n_id_dupes"] == 0 and m2["n_admitted"] == 1

    # DataFrame-of-ids route (the at-scale shape): same semantics
    tid2 = int(third.filter("vec_id > 0")
               .agg(F.min("vec_id")).head()[0])
    targets = (spark.range(10_000_000, 10_001_000)
               .selectExpr("id AS vec_id")
               .unionByName(spark.createDataFrame([(tid2,)],
                                                  "vec_id LONG")))
    A.delete_vectors(spark, root, targets)
    assert not (A.read_ann_index(spark, root)
                .filter(F.col("vec_id") == tid2).count())
    assert A.verify_ann_index(spark, root)["violations"] == []
    with pytest.raises(ValueError, match="no live batch contains"):
        A.delete_vectors(spark, root, [999_999_999])


def test_delete_vectors_crash_is_invisible_then_retryable(
        spark, emb, tmp_path):
    """A half-finished retain rewrite (crash before the manifest) is
    invisible to readers, NAMED by the fsck as an orphan, and healed
    by the retry, which re-mints the same retain id and sweeps."""
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "b0")
    A.ann_ingest_delta(spark, root, second, "b1")
    n = first.count() + second.count()
    tid = int(first.filter("vec_id > 0")
              .agg(F.min("vec_id")).head()[0])
    with pytest.raises(RuntimeError, match="injected crash"):
        A.delete_vectors(spark, root, [tid],
                         _crash_after=A.ANN_TABLE)
    # nothing changed for readers; the fsck names the orphan
    assert A.read_ann_index(spark, root).count() == n
    v = A.verify_ann_index(spark, root)
    assert v["violations"] == []
    assert v["orphans"] == ["retain-000000"]
    cid = A.delete_vectors(spark, root, [tid])
    assert cid == "retain-000000"
    assert A.read_ann_index(spark, root).count() == n - 1
    v = A.verify_ann_index(spark, root)
    assert v["violations"] == [] and v["orphans"] == []


def test_prune_uncommitted_sweeps_never_retried_crash(spark, emb,
                                                      tmp_path):
    """A crashed ingest that is NEVER retried leaves an invisible
    orphan forever; prune_ann_uncommitted sweeps it and the batch id
    stays free (no manifest was ever written)."""
    root = str(tmp_path / "ix")
    first, second, _ = _thirds(emb)
    A.ann_ingest_delta(spark, root, first, "b0")
    with pytest.raises(RuntimeError, match="injected crash"):
        A.ann_ingest_delta(spark, root, second, "b1",
                           _crash_after=A.ANN_TABLE)
    assert A.verify_ann_index(spark, root)["orphans"] == ["b1"]
    assert A.prune_ann_uncommitted(spark, root) == ["b1"]
    v = A.verify_ann_index(spark, root)
    assert v["orphans"] == [] and v["violations"] == []
    m = A.ann_ingest_delta(spark, root, second, "b1")
    assert m["n_admitted"] == second.count()


def test_writer_lease_excludes_second_writer(spark, emb, tmp_path):
    root = str(tmp_path / "ix")
    first = _thirds(emb)[0]
    A.ann_ingest_delta(spark, root, first, "b0")
    from light_redistribution_in_3dptf_data_pipeline_spark.fs import (
        write_text)
    write_text(spark, f"{root}/_lock",
               '{"owner": "x", "op": "other", "pid": 1}')
    with pytest.raises(ConcurrentWriterError):
        A.ann_ingest_delta(spark, root, first, "b1")


def test_probe_scan_is_partition_pruned(spark, emb, qvec, tmp_path):
    """The plan pin: the top-k probe prunes on BOTH partition levels —
    bucket IN (J+1 literals) directory pruning, no growing batch
    IN-list — and stays a single TakeOrderedAndProject stage with no
    Exchange before it."""
    root = str(tmp_path / "ix")
    for i, part in enumerate(_thirds(emb)):
        A.ann_ingest_delta(spark, root, part, f"b{i}")
    df = A.ann_incremental_topk(spark, root, qvec, exclude_id=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "bucket" in m.group(1)
    # all batches committed ⇒ invisible set empty ⇒ no batch filter
    assert "batch_id IN" not in m.group(1)
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bucket_occupancy_canary_and_size_aware_compaction(
        spark, emb, tmp_path):
    """LSH-side mirror of the IVF skew tooling (r10): the fsck
    reports bucket occupancy, and compact_ann_batches(rows_per_file)
    splits a hot bucket into balanced files while cold buckets stay
    single-file."""
    import glob

    root = str(tmp_path / "ix")
    A.ann_ingest_delta(spark, root, emb, "d1")
    rep = A.verify_ann_index(spark, root)
    assert rep["violations"] == []
    occ = rep["bucket_occupancy"]
    assert occ["n_buckets_occupied"] > 1
    assert occ["max"] <= rep["index_rows"]
    hot = occ["hottest_bucket"]
    n_hot = occ["max"]

    target = max(2, n_hot // 3)
    A.compact_ann_batches(spark, root, rows_per_file=target)
    cid = A.committed_ann_batches(spark, root)[0]
    hot_files = glob.glob(
        f"{root}/buckets/batch_id={cid}/bucket={hot}/*.parquet")
    assert len(hot_files) >= (n_hot + target - 1) // target
    for f in hot_files:
        assert spark.read.parquet(f"file:{f}").count() <= target
    rep2 = A.verify_ann_index(spark, root)
    assert rep2["violations"] == []
    assert rep2["index_rows"] == rep["index_rows"]
    assert rep2["bucket_occupancy"]["max"] == n_hot


def test_batch_topk_equals_per_query_probe(spark, emb, tmp_path):
    """ann_batch_topk (r11): one distributed job over many queries
    returns, per query, EXACTLY the single-query incremental probe's
    rows — same signatures, same Hamming-≤h expansion, same rerank
    and tie order."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        ann_batch_topk, ann_incremental_topk, ann_ingest_delta)

    root = str(tmp_path / "ix")
    ann_ingest_delta(spark, root, emb.filter("vec_id < 250"), "d1")
    ann_ingest_delta(spark, root, emb.filter("vec_id >= 250"), "d2")

    qids = [0, 7, 33, 120, 301, 499]
    queries = (emb.filter(F.col("vec_id").isin(qids))
               .select(F.col("vec_id").alias("qid"), "embedding"))
    for h in (0, 1):
        batch = ann_batch_topk(spark, root, queries, k=10, hamming=h)
        got = {}
        for r in batch.collect():
            got.setdefault(int(r.qid), []).append(
                (int(r.vec_id), float(r.cosine), int(r.bucket)))
        for qid in qids:
            qvec = [float(x) for x in
                    emb.filter(F.col("vec_id") == qid)
                    .select("embedding").head()[0]]
            want = [(int(r.vec_id), float(r.cosine), int(r.bucket))
                    for r in ann_incremental_topk(
                        spark, root, qvec, k=10, exclude_id=qid,
                        hamming=h).collect()]
            assert got.get(qid, []) == want, (h, qid)
