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
