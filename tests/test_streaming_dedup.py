"""Stream-batch parity for the streaming exact-dedup stage: duplicates
within and across micro-batches are suppressed, first occurrence wins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.streaming import dedup as sd
from light_redistribution_in_3dptf_data_pipeline_spark.streaming.sessionization import run_stream_to_memory

DOC_SCHEMA = "doc_id INT, text STRING, ts TIMESTAMP"


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    """Two micro-batches: batch 1 has an in-batch duplicate pair;
    batch 2 repeats two batch-1 texts (cross-batch duplicates) and
    adds two fresh ones."""
    d = tmp_path_factory.mktemp("doc_stream")
    t0 = 1_700_000_000
    b1 = [(0, "alpha beta gamma", t0),
          (1, "delta epsilon zeta", t0 + 10),
          (2, "alpha beta gamma", t0 + 20),       # in-batch dup of 0
          (3, "eta theta iota", t0 + 30)]
    b2 = [(4, "delta epsilon zeta", t0 + 40),     # cross-batch dup of 1
          (5, "kappa lambda mu", t0 + 50),
          (6, "eta theta iota", t0 + 60),         # cross-batch dup of 3
          (7, "nu xi omicron", t0 + 70)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            rows, "doc_id INT, text STRING, epoch BIGINT"
        ).select("doc_id", "text",
                 F.timestamp_seconds("epoch").alias("ts")) \
         .write.mode("overwrite").parquet(str(d / name))
    return str(d)


def test_streaming_dedup_one_survivor_per_hash(spark, doc_stream_dir):
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(doc_stream_dir + "/*"))
    q = run_stream_to_memory(
        sd.streaming_dedup_exact(stream, watermark="1 hour"), "dedup_t")
    q.awaitTermination(90)
    rows = spark.sql("SELECT * FROM dedup_t").collect()
    ids = sorted(r.doc_id for r in rows)
    # 8 docs, 5 distinct texts → 5 survivors, one per content hash
    assert len(rows) == 5
    assert len({r.content_hash for r in rows}) == 5
    # within-batch pair (0,2): exactly one arbitrary representative
    assert len({0, 2} & set(ids)) == 1
    # cross-batch repeats NEVER survive: state from the earlier
    # micro-batch suppresses docs 4 and 6 (dups of 1 and 3)
    assert 1 in ids and 3 in ids
    assert 4 not in ids and 6 not in ids
    # batch-2 fresh docs pass through
    assert 5 in ids and 7 in ids


def test_batch_path_same_hash_set(spark, doc_stream_dir):
    batch = spark.read.parquet(doc_stream_dir + "/*")
    out = sd.streaming_dedup_exact(batch)
    hashes = {r.content_hash for r in out.collect()}
    stream_hashes = {
        r.content_hash
        for r in sd.with_content_hash(batch).dropDuplicates(
            ["content_hash"]).collect()}
    assert hashes == stream_hashes
    assert out.count() == 5


def test_inrow_simhash_equals_grouped_form(spark):
    """The stream-safe map-only SimHash must be bit-identical to the
    production explode+groupBy form — on the fixture corpus and with
    both the default and the portable hash."""
    from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        _portable_hash60, inrow_simhash, simhash_fingerprints)

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    for hf, bits in ((None, 64), (_portable_hash60, 60)):
        grouped = {r.doc_id: r.simhash for r in simhash_fingerprints(
            docs, hash_fn=hf, n_bits=bits).collect()}
        inrow = {r.doc_id: r.fp for r in docs.select(
            "doc_id", inrow_simhash(F.col("text"), hash_fn=hf,
                                    n_bits=bits).alias("fp")).collect()}
        assert grouped == inrow


@pytest.fixture(scope="module")
def neardup_stream_dir(spark, tmp_path_factory):
    """Batch 1 and batch 2 each carry a whitespace-variant of an
    earlier doc — same token multiset (same SimHash), different bytes
    (different content hash): visible to the near-dup stage only."""
    d = tmp_path_factory.mktemp("neardup_stream")
    t0 = 1_700_000_000
    b1 = [(0, "alpha beta gamma", t0),
          (1, "alpha  beta   gamma", t0 + 10),    # ws-variant of 0
          (2, "delta epsilon zeta", t0 + 20)]
    b2 = [(3, "delta  epsilon  zeta", t0 + 30),   # cross-batch variant
          (4, "eta theta iota", t0 + 40)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            rows, "doc_id INT, text STRING, epoch BIGINT"
        ).select("doc_id", "text",
                 F.timestamp_seconds("epoch").alias("ts")) \
         .write.mode("overwrite").parquet(str(d / name))
    return str(d)


def test_streaming_neardup_catches_whitespace_variants(
        spark, neardup_stream_dir):
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(neardup_stream_dir + "/*"))
    q = run_stream_to_memory(
        sd.streaming_dedup_neardup(stream, watermark="1 hour"),
        "neardup_t")
    q.awaitTermination(90)
    rows = spark.sql("SELECT * FROM neardup_t").collect()
    ids = sorted(r.doc_id for r in rows)
    # 5 docs, 3 distinct token multisets -> 3 survivors
    assert len(rows) == 3
    assert len({r.simhash for r in rows}) == 3
    assert len({0, 1} & set(ids)) == 1     # in-batch variant pair
    assert 2 in ids and 3 not in ids       # cross-batch variant culled
    assert 4 in ids
    # the EXACT stage would have kept all 5 (bytes all differ):
    batch = spark.read.parquet(neardup_stream_dir + "/*")
    assert sd.streaming_dedup_exact(batch).count() == 5
    # batch degradation of the near-dup stage agrees with the stream
    assert sd.streaming_dedup_neardup(batch).count() == 3


def test_keyed_dedup_bounded_domain(spark, doc_stream_dir):
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(doc_stream_dir + "/*"))
    q = run_stream_to_memory(
        sd.streaming_dedup_keyed(stream, ["doc_id"]), "keyed_t")
    q.awaitTermination(90)
    assert spark.sql("SELECT count(*) AS n FROM keyed_t").head().n == 8
