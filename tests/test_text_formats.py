"""JSONL/CSV ingestion: round-trips, quarantine fork, schema
stability."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.sources import text_formats as tf

from conftest import SF_DIR


def test_jsonl_roundtrip_preserves_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    tf.write_jsonl(docs, path)
    back = tf.read_jsonl(spark, path)
    clean, rejected = tf.quarantine(back)
    assert rejected.count() == 0
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, clean.select(*docs.columns).collect()))
    assert a == b


def test_csv_roundtrip_preserves_documents(spark, tmp_path):
    # fixture text has no newlines/commas-with-quotes edge cases the
    # default CSV dialect can't round-trip
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_csv")
    tf.write_csv(docs, path)
    back = tf.read_csv(spark, path)
    clean, rejected = tf.quarantine(back)
    assert rejected.count() == 0
    assert clean.count() == docs.count()
    assert dict(clean.dtypes)["doc_id"] == "bigint"


def test_jsonl_quarantine_catches_malformed_lines(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    good = '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}'
    bad1 = '{"doc_id": oops not json'
    bad2 = 'plain text line'
    (src / "part-0.jsonl").write_text("\n".join([good, bad1, bad2]) + "\n")
    df = tf.read_jsonl(spark, str(src))
    clean, rejected = tf.quarantine(df)
    assert clean.count() == 1
    assert clean.first()["doc_id"] == 1
    rej = [r[tf.CORRUPT_COL] for r in rejected.collect()]
    assert sorted(rej) == sorted([bad1, bad2])


def test_jsonl_feeds_pipeline_operators(spark, tmp_path):
    # ingestion composes with the curation operators: JSONL in,
    # features out
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl2")
    tf.write_jsonl(docs, path)
    clean, _ = tf.quarantine(tf.read_jsonl(spark, path))
    feats = corpus.document_features(clean)
    assert feats.filter(F.col("content_hash").isNull()).count() == 0
    assert feats.count() == docs.count()


def test_tx11_doc_id_overflow_raises(spark, tmp_path):
    """Past MAX_SAFE_DOC_ID the multiplicative shuffle hash would wrap
    int64 silently under ANSI-off Spark while DuckDB raises — the
    builder must fail loudly instead of diverging (ADVICE r4)."""
    import pytest

    from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
        MAX_SAFE_DOC_ID)

    spark.createDataFrame(
        [(MAX_SAFE_DOC_ID + 1, "hello world overflow", "en", "t", 20)],
        "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    df = QUERIES["tx11_chunk_pack_split"].builder(spark, str(tmp_path))
    with pytest.raises(Exception, match="overflow bound"):
        df.collect()
