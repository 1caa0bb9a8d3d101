"""Cross-root corpus ⇆ vector-index consistency
(plans/linkage.verify_linked): coverage gaps are reported, orphaned
vectors after a corpus takedown are VIOLATIONS until the vector-side
takedown runs, and provenance drift is named. VERDICT r8 #4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ann_index as A)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
    ivf_index as I)
from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus
from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
    verify_linked)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _docs(spark, ids):
    # per-doc token vocabularies are pairwise (mostly) disjoint so
    # the ingest's simhash near-dup gate does not collapse them
    return spark.createDataFrame(
        [(int(i), " ".join(f"w{i}x{j}q{(i * 7 + j * 13) % 997}"
                           for j in range(14)), "en", "s", 1)
         for i in ids],
        "doc_id LONG, text STRING, lang STRING, "
        "source STRING, n_chars LONG")


def test_linked_roots_takedown_and_provenance(spark, emb, tmp_path):
    croot = str(tmp_path / "corpus")
    vroot = str(tmp_path / "ann")

    got1 = corpus.ingest_delta(spark, croot,
                               _docs(spark, range(1, 31)),
                               batch_id="d1")
    ids1 = sorted(r.doc_id for r in got1.select("doc_id").collect())
    assert len(ids1) >= 10   # the gates must not eat the fixture
    A.ann_ingest_delta(spark, vroot,
                       emb.filter(F.col("vec_id").isin(ids1)),
                       "v1", corpus_batch="d1")

    rep = verify_linked(spark, croot, vroot)
    assert rep["n_docs"] == rep["n_vectors"] == len(ids1)
    assert rep["docs_without_vectors"] == 0
    assert rep["orphan_vectors"] == 0
    assert rep["violations"] == []

    # docs committed ahead of their embeddings: a LAG, not a violation
    got2 = corpus.ingest_delta(spark, croot,
                               _docs(spark, [100, 101]),
                               batch_id="d2")
    ids2 = sorted(r.doc_id for r in got2.select("doc_id").collect())
    assert ids2
    rep = verify_linked(spark, croot, vroot)
    assert rep["docs_without_vectors"] == len(ids2)
    assert rep["docs_without_vectors_sample"] == ids2
    assert rep["violations"] == []

    # corpus takedown: the doc's vector is now an ORPHAN — the
    # dangerous direction (the embedding still encodes removed text)
    tid = ids1[0]
    corpus.delete_documents(spark, croot, [tid])
    rep = verify_linked(spark, croot, vroot)
    assert rep["orphan_vectors"] == 1
    assert rep["orphan_vectors_sample"] == [tid]
    assert any("delete_vectors" in v for v in rep["violations"])

    # the vector-side takedown clears it
    A.delete_vectors(spark, vroot, [tid])
    rep = verify_linked(spark, croot, vroot)
    assert rep["orphan_vectors"] == 0
    assert rep["violations"] == []
    assert rep["n_vectors"] == len(ids1) - 1

    # provenance drift: a vector batch claiming an unknown corpus
    # batch is named even when its ids happen to exist
    A.ann_ingest_delta(spark, vroot,
                       emb.filter(F.col("vec_id").isin([100, 101])),
                       "v2", corpus_batch="never-committed")
    rep = verify_linked(spark, croot, vroot)
    assert rep["stale_provenance"] == [["v2", "never-committed"]]
    assert any("stale_provenance" in v for v in rep["violations"])

    # ...and corpus-side compaction does NOT trip provenance: the
    # identity memory (transitive replaces) still knows d1/d2
    corpus.compact_batches(spark, croot)
    rep = verify_linked(spark, croot, vroot)
    assert [s for s in rep["stale_provenance"]
            if s[1] in ("d1", "d2")] == []


def test_takedown_cascade_across_roots(spark, emb, tmp_path):
    """One call removes a document and its embeddings from the corpus
    plus BOTH index families, verify_linked comes back clean on each,
    and a replayed takedown notice is an idempotent no-op."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        takedown_documents)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    ivroot = str(tmp_path / "ivf")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 21)),
                              batch_id="d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert len(ids) >= 5
    vecs = emb.filter(F.col("vec_id").isin(ids))
    A.ann_ingest_delta(spark, aroot, vecs, "v1", corpus_batch="d1")
    I.init_ivf_index(spark, ivroot, emb)
    I.ivf_ingest_delta(spark, ivroot, vecs, "v1", corpus_batch="d1")

    tid = ids[0]
    rep = takedown_documents(spark, croot, [aroot, ivroot], [tid])
    assert rep["corpus"] and rep["indexes"][aroot]
    assert rep["indexes"][ivroot] and rep["skipped"] == []
    for iroot in (aroot, ivroot):
        linked = verify_linked(spark, croot, iroot)
        assert linked["violations"] == []
        assert linked["orphan_vectors"] == 0
        assert linked["n_docs"] == linked["n_vectors"] == len(ids) - 1
    assert (corpus.read_corpus(spark, croot)
            .filter(F.col("doc_id") == tid).count() == 0)

    # replayed notice: every root no-ops, nothing raises
    rep2 = takedown_documents(spark, croot, [aroot, ivroot], [tid])
    assert rep2["corpus"] is None
    assert rep2["indexes"] == {aroot: None, ivroot: None}
    assert len(rep2["skipped"]) == 3

    # a typo'd index root stays loud — no silent "pass"
    with pytest.raises(ValueError, match="no _meta.json"):
        takedown_documents(spark, croot, [str(tmp_path / "nope")],
                           [ids[1]])


def test_takedown_heals_partial_crash_window(spark, emb, tmp_path):
    """Corpus-side takedown already ran (the dangerous direction:
    orphan embeddings remain) — the cascade replay cleans the vector
    roots and reports the corpus as already clean."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        takedown_documents)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 21)),
                              batch_id="d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    A.ann_ingest_delta(spark, aroot,
                       emb.filter(F.col("vec_id").isin(ids)),
                       "v1", corpus_batch="d1")
    tid = ids[0]
    corpus.delete_documents(spark, croot, [tid])
    assert verify_linked(spark, croot, aroot)["orphan_vectors"] == 1

    rep = takedown_documents(spark, croot, [aroot], [tid])
    assert rep["indexes"][aroot] and rep["corpus"] is None
    linked = verify_linked(spark, croot, aroot)
    assert linked["orphan_vectors"] == 0 and linked["violations"] == []


def test_verify_deployment_composes_all_fscks(spark, emb, tmp_path):
    """One call covers corpus fsck + both index fscks + both linkage
    checks + pin pricing; a violation anywhere surfaces in the flat
    list with its root prefix."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        ivf_index as I)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    ivroot = str(tmp_path / "ivf")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 16)), "d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    vecs = emb.filter(F.col("vec_id").isin(ids))
    A.ann_ingest_delta(spark, aroot, vecs, "v1", corpus_batch="d1")
    I.init_ivf_index(spark, ivroot, emb)
    I.ivf_ingest_delta(spark, ivroot, vecs, "v1", corpus_batch="d1")

    rep = verify_deployment(spark, croot, [aroot, ivroot])
    assert rep["violations"] == []
    assert set(rep["roots"]) == {croot, aroot, ivroot}
    assert set(rep["linked"]) == {aroot, ivroot}
    assert rep["pins"][croot]["held_bytes"] == 0

    # a corpus takedown makes both vector roots orphan-dirty; every
    # violation carries its pair prefix in the flat list
    corpus.delete_documents(spark, croot, [ids[0]])
    rep = verify_deployment(spark, croot, [aroot, ivroot])
    assert len([v for v in rep["violations"]
                if "orphan_vectors" in v]) == 2
    assert any(v.startswith(f"{croot}⇆{aroot}")
               for v in rep["violations"])


def test_linkage_dispatches_on_index_kind(spark, emb, tmp_path):
    croot = str(tmp_path / "corpus")
    ivroot = str(tmp_path / "ivf")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 11)),
                              batch_id="d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert ids
    I.init_ivf_index(spark, ivroot, emb)
    I.ivf_ingest_delta(spark, ivroot,
                       emb.filter(F.col("vec_id").isin(ids)),
                       "v1", corpus_batch="d1")
    rep = verify_linked(spark, croot, ivroot)
    assert rep["n_docs"] == rep["n_vectors"] == len(ids)
    assert rep["violations"] == []
    with pytest.raises(ValueError, match="no _meta.json"):
        verify_linked(spark, croot, str(tmp_path / "nowhere"))


def test_verify_deployment_verifies_pins(spark, emb, tmp_path):
    """VERDICT r9 missing #3: the deployment fsck used to only PRICE
    pins (pins_report) — a pin whose pinned batch was deleted
    out-of-band passed the whole-deployment health check even though
    verify_pin would flag it. Now every pin of every root and every
    linked pin is verified, and policy flags (age/byte budget)
    surface as violations."""
    import shutil

    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        snapshots as SN)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 11)), "d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    got2 = corpus.ingest_delta(spark, croot,
                               _docs(spark, range(20, 26)), "d2")
    ids += sorted(r.doc_id for r in got2.select("doc_id").collect())
    A.ann_ingest_delta(spark, aroot,
                       emb.filter(F.col("vec_id").isin(ids)), "v1",
                       corpus_batch="d1")
    linked = SN.pin_linked(spark, croot, [aroot], owner="eval",
                           created_at=1_000.0)

    rep = verify_deployment(spark, croot, [aroot])
    assert rep["violations"] == []
    assert rep["pin_fscks"][croot][linked["corpus_pin"]][
        "violations"] == []
    assert linked["linked_digest"] in rep["linked_pin_fscks"]

    # inject the failure today's composition missed: sweep a pinned
    # corpus batch out-of-band (bypassing every protocol guard)
    shutil.rmtree(f"{croot}/corpus/batch_id=d1")
    rep = verify_deployment(spark, croot, [aroot])
    named = [v for v in rep["violations"]
             if linked["corpus_pin"] in v and "missing_data" in v]
    assert named, rep["violations"]
    # ...and the linked-pin fsck reports it too (prefixed)
    assert any(linked["linked_digest"] in v or "missing_data" in v
               for v in rep["violations"])


def test_verify_deployment_flags_policy_breaking_pins(spark, emb,
                                                      tmp_path):
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        snapshots as SN)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 6)), "d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    A.ann_ingest_delta(spark, aroot,
                       emb.filter(F.col("vec_id").isin(ids)), "v1",
                       corpus_batch="d1")
    pin = SN.pin_snapshot(spark, croot, owner="forgotten",
                          created_at=0.0)
    rep = verify_deployment(spark, croot, [aroot],
                            max_pin_age_seconds=3_600)
    assert any(pin["snapshot_digest"] in v and "aged" in v
               for v in rep["violations"])
    # without a policy, the same deployment is clean
    assert verify_deployment(spark, croot,
                             [aroot])["violations"] == []


def test_verify_deployment_ages_linked_pins(spark, emb, tmp_path):
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        snapshots as SN)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 6)), "d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    A.ann_ingest_delta(spark, aroot,
                       emb.filter(F.col("vec_id").isin(ids)), "v1",
                       corpus_batch="d1")
    linked = SN.pin_linked(spark, croot, [aroot], owner="forgotten",
                           created_at=0.0)
    rep = verify_deployment(spark, croot, [aroot],
                            max_pin_age_seconds=3_600)
    # the linked doc AND its underlying per-root pins all age out
    assert any(linked["linked_digest"] in v and "aged" in v
               for v in rep["violations"])


def test_verify_deployment_surfaces_recall_canary(spark, emb,
                                                  tmp_path):
    """A below-floor recall sample recorded by the streaming canary
    (plans/recall.record_recall_sample) is a DEPLOYMENT violation —
    quality decay surfaces in the same one-call health check as
    structural damage (r11)."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import (
        recall as R)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.linkage import (
        verify_deployment)

    croot = str(tmp_path / "corpus")
    aroot = str(tmp_path / "ann")
    got = corpus.ingest_delta(spark, croot,
                              _docs(spark, range(1, 9)), "d1")
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    A.ann_ingest_delta(spark, aroot,
                       emb.filter(F.col("vec_id").isin(ids)), "v1",
                       corpus_batch="d1")

    # healthy sample: no violation, series visible in the report
    doc = R.record_recall_sample(spark, aroot, "v1", n_queries=4,
                                 floor=0.0)
    assert doc is not None and doc["below_floor"] is False
    rep = verify_deployment(spark, croot, [aroot])
    assert rep["violations"] == []
    assert len(rep["recall"][aroot]["samples"]) == 1

    # a below-floor sample (floor > any achievable recall) trips it
    R.record_recall_sample(spark, aroot, "v1-decayed", n_queries=4,
                           floor=1.1)
    rep = verify_deployment(spark, croot, [aroot])
    assert any("recall canary below floor at batch v1-decayed" in v
               for v in rep["violations"])
