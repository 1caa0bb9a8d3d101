"""Passage-level duplicate detection (operators/dedup.py:
winnow_fingerprint_rows / passage_dup_candidates, registered as
dx6_passage_dup).

The MOSS winnowing guarantee: any shared span of >= K+W-1 characters
deposits at least one identical fingerprint in both documents — so a
copied PASSAGE surfaces as shared (doc, fp) index rows even when the
two documents as wholes are unrelated (whole-doc jaccard ~0, SimHash
far apart). These tests plant such spans and pin:

1. recall — a planted shared span surfaces the pair, unrelated pairs
   stay silent;
2. the ``max_doc_freq`` boilerplate guard — spans present in "every"
   document stop counting, genuinely copied spans keep counting;
3. the ``min_shared`` threshold semantics;
4. the Arrow fast path (udf/winnow.with_winnow_fps_arrow) produces
   exactly the Column-form fingerprint sets the DuckDB oracle is
   pinned to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
    passage_dup_candidates, winnow_fingerprint_rows)

from conftest import SF_DIR

# Unrelated bodies built from disjoint alphabets: no 8-char gram can
# collide across them, so every shared fingerprint below comes from a
# PLANTED span, never from accident.
BODY_A = "abcdefg " * 40
BODY_B = "hijklmn " * 40
BODY_C = "opqrstu " * 40
# >= K+W-1 = 11 chars with margin: ~90 chars => dozens of shared fps.
PASSAGE = "the quick brown fox jumps over the lazy dog while the " \
          "cold rain falls on the quiet grey city"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.n_shared_fp for r in df.collect()}


def test_planted_passage_surfaces_pair(spark):
    docs = _docs(spark, [
        (1, BODY_A + PASSAGE + BODY_A),
        (2, BODY_B + PASSAGE + BODY_B),
        (3, BODY_C),
    ])
    got = _pairs(passage_dup_candidates(docs, min_shared=2))
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] >= 2
    # the pair is reported once, canonically ordered (doc_a < doc_b)
    assert all(a < b for a, b in got)


def test_unrelated_documents_share_nothing(spark):
    docs = _docs(spark, [(1, BODY_A), (2, BODY_B), (3, BODY_C)])
    rows = winnow_fingerprint_rows(docs)
    a, b = rows.alias("a"), rows.alias("b")
    shared = a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))).count()
    assert shared == 0


def test_max_doc_freq_drops_boilerplate_not_copies(spark):
    # HEADER is in all four documents (doc freq 4); PASSAGE only in
    # two. With max_doc_freq=3 the header fingerprints stop counting:
    # the (3,4) pair — related ONLY through the header — disappears,
    # while the genuinely copied (1,2) pair survives.
    header = "standard license header do not remove this notice ever"
    docs = _docs(spark, [
        (1, header + BODY_A + PASSAGE),
        (2, header + BODY_B + PASSAGE),
        (3, header + BODY_C),
        (4, header + "vwxyz. " * 40),
    ])
    unguarded = _pairs(passage_dup_candidates(docs, min_shared=2))
    assert (1, 2) in unguarded and (3, 4) in unguarded
    guarded = _pairs(passage_dup_candidates(docs, min_shared=2,
                                            max_doc_freq=3))
    assert set(guarded) == {(1, 2)}, guarded
    # and the surviving count dropped by exactly the header's
    # contribution: it now counts only PASSAGE fingerprints
    assert guarded[(1, 2)] < unguarded[(1, 2)]


def test_min_shared_threshold(spark):
    docs = _docs(spark, [
        (1, BODY_A + PASSAGE + BODY_A),
        (2, BODY_B + PASSAGE + BODY_B),
    ])
    all_pairs = _pairs(passage_dup_candidates(docs, min_shared=1))
    n = all_pairs[(1, 2)]
    assert n >= 2
    # threshold exactly at n keeps the pair; above n drops it
    assert (1, 2) in _pairs(passage_dup_candidates(docs, min_shared=n))
    assert _pairs(passage_dup_candidates(docs,
                                         min_shared=n + 1)) == {}


def test_delta_gate_in_delta_boilerplate_not_dropped(spark):
    """ADVICE r8 (high): a header shared among MORE than max_doc_freq
    DELTA documents is boilerplate even when the index has never seen
    it. Before the combined-frequency guard, the in-delta self-join
    counted unfiltered fingerprints and silently dropped every doc
    after the first — data loss the batch form never had."""
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        passage_delta_gate)

    header = "standard license header do not remove this notice ever "
    bodies = [BODY_A, BODY_B, BODY_C, "vwxyz12 " * 40, "3456789 " * 40]
    docs = _docs(spark, [(i + 1, header + b)
                         for i, b in enumerate(bodies)])
    empty_ix = spark.createDataFrame([], "doc_id bigint, fp bigint")
    surv, fps = passage_delta_gate(docs, empty_ix, min_shared=2,
                                   max_doc_freq=4)
    assert sorted(r.doc_id for r in surv.collect()) == [1, 2, 3, 4, 5]
    # the survivors' INDEX rows still carry every fingerprint
    # (hotness is re-measured per ingest, not baked into the index)
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        winnow_fingerprint_rows)
    want = winnow_fingerprint_rows(docs.filter("doc_id = 1")).count()
    assert fps.filter("doc_id = 1").count() == want


def test_delta_gate_combined_frequency_guard(spark):
    """Neither the index side nor the delta side alone exceeds
    max_doc_freq, but their COMBINED document frequency does — the
    corpus to this gate is committed docs PLUS the delta, so the
    header must stop counting while a genuinely copied passage
    (pair-local frequency) still gates."""
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        passage_delta_gate, winnow_fingerprint_rows)

    header = "standard license header do not remove this notice ever "
    ix_docs = _docs(spark, [
        (100, header + BODY_A),
        (101, header + BODY_B),
        (102, BODY_C + PASSAGE + BODY_C),
    ])
    ix = winnow_fingerprint_rows(ix_docs).select("doc_id", "fp")
    delta = _docs(spark, [
        (1, header + "vwxyz12 " * 40),
        (2, header + "3456789 " * 40),
        (3, "JKLMNOP " * 40 + PASSAGE + "JKLMNOP " * 40),
    ])
    surv, _ = passage_delta_gate(delta, ix, min_shared=2,
                                 max_doc_freq=3)
    # header: combined df = 2 (index) + 2 (delta) = 4 > 3 → ignored,
    # docs 1/2 survive; PASSAGE: df 2 ≤ 3 → doc 3 gated by index 102
    assert sorted(r.doc_id for r in surv.collect()) == [1, 2]


def test_winnow_accounting_reconciles_with_gated_ingest(spark,
                                                        tmp_path):
    """The passage ledger (winnow_dedup_accounting) is built on the
    gate's own intermediate frames, so its n_docs_dropped reconciles
    EXACTLY with a gated ingest's manifest n_passage_dropped —
    observability parity with the LSH/SimHash ledgers."""
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        winnow_dedup_accounting)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    def cdocs(rows):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id LONG, text STRING, lang STRING, "
            "source STRING, n_chars LONG")

    P2 = ("meanwhile seventeen violet umbrellas drifted calmly "
          "beneath wooden bridges nine kilometers north")
    root = str(tmp_path / "ledger")
    corpus.ingest_delta(spark, root,
                        cdocs([(1, BODY_A + PASSAGE + BODY_A)]),
                        batch_id="d1", passage_min_shared=2,
                        passage_max_doc_freq=3)
    delta = cdocs([
        (10, BODY_B + PASSAGE + BODY_B),   # index kill (shares P1)
        (11, BODY_C + P2 + BODY_C),        # first-seen: admitted
        (12, "zyxwvut " * 40 + P2),        # in-delta kill (shares P2)
    ])
    corpus.ingest_delta(spark, root, delta, batch_id="d2",
                        passage_min_shared=2, passage_max_doc_freq=3)
    m = corpus.read_manifest(spark, root, "d2")
    assert m["n_passage_dropped"] == 2

    # replay the ledger over the same delta vs the SAME committed
    # index state the gate saw (batch d1 only)
    ix = (spark.read.parquet(f"{root}/index_winnow_fp")
          .filter(F.col("batch_id") == "d1").select("doc_id", "fp"))
    row = winnow_dedup_accounting(delta, ix, min_shared=2,
                                  max_doc_freq=3).head()
    assert row.n_docs_dropped == m["n_passage_dropped"] == 2
    assert row.n_delta_docs == 3
    assert row.n_index_candidate_pairs >= 1
    assert row.n_delta_candidate_pairs >= 1
    assert row.n_hot_fps == 0 and row.n_fp_rows_ignored == 0
    # post-guard fanout is bounded by the guard by construction
    assert row.max_fp_fanout <= 3

    # boilerplate round: the guard ignores the shared header, the
    # ledger shows WHAT it ignored and that nothing was dropped
    header = "standard license header do not remove this notice ever "
    bodies = [BODY_A, BODY_B, BODY_C, "vwxyz12 " * 40, "3456789 " * 40]
    boiler = cdocs([(i + 1, header + b) for i, b in enumerate(bodies)])
    empty_ix = spark.createDataFrame([], "doc_id bigint, fp bigint")
    row2 = winnow_dedup_accounting(boiler, empty_ix, min_shared=2,
                                   max_doc_freq=4).head()
    assert row2.n_docs_dropped == 0
    assert row2.n_hot_fps > 0 and row2.n_fp_rows_ignored > 0
    assert row2.max_fp_fanout <= 4


def test_fingerprint_rows_match_column_form(spark):
    """The Arrow fps path behind winnow_fingerprint_rows emits exactly
    the (doc, fp) set of the oracle-pinned Column form — on real
    fixture documents, not synthetic strings."""
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
        with_winnow_fingerprints)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(40))
    arrow_rows = winnow_fingerprint_rows(docs)
    col_rows = (with_winnow_fingerprints(docs, "text", out="_fps")
                .select("doc_id", F.explode("_fps").alias("fp")))
    assert arrow_rows.exceptAll(col_rows).count() == 0
    assert col_rows.exceptAll(arrow_rows).count() == 0
