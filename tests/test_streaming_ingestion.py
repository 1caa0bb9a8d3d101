"""Streaming JSONL ingestion: drain-the-directory semantics,
quarantine fork, incremental pickup of new drops, stream-batch
parity of the gate."""

from __future__ import annotations

import json
import os

from light_redistribution_in_3dptf_data_pipeline_spark.sources import text_formats as tf
from light_redistribution_in_3dptf_data_pipeline_spark.streaming import ingestion


def _drop(path, name, lines):
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _doc(i, text, lang="en"):
    return json.dumps({"doc_id": i, "text": text, "lang": lang,
                       "source": "s", "n_chars": len(text)})


def test_ingestion_drains_gates_and_quarantines(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    out = str(tmp_path / "out")
    _drop(str(src), "a.jsonl", [
        _doc(1, "one two three four five six"),
        _doc(2, "too short"),                      # fails token floor
        '{"doc_id": broken',                       # malformed
    ])
    q = ingestion.run_ingestion(spark, str(src), out)
    q.awaitTermination(120)
    clean = spark.read.parquet(f"{out}/clean")
    rejects = spark.read.parquet(f"{out}/rejects")
    assert [r.doc_id for r in clean.collect()] == [1]
    assert rejects.count() == 1
    assert rejects.first()[tf.CORRUPT_COL].startswith('{"doc_id": broken')


def test_ingestion_picks_up_only_new_files(spark, tmp_path):
    src = tmp_path / "drop2"
    src.mkdir()
    out = str(tmp_path / "out2")
    _drop(str(src), "a.jsonl", [_doc(1, "alpha beta gamma delta five")])
    ingestion.run_ingestion(spark, str(src), out).awaitTermination(120)
    _drop(str(src), "b.jsonl", [_doc(2, "six seven eight nine ten")])
    ingestion.run_ingestion(spark, str(src), out).awaitTermination(120)
    clean = spark.read.parquet(f"{out}/clean")
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    # the first file was NOT re-ingested by the second run
    assert clean.count() == 2


def test_gate_stream_batch_parity(spark, tmp_path):
    src = tmp_path / "drop3"
    src.mkdir()
    lines = [_doc(i, "w " * (i + 1) + "end") for i in range(10)]
    _drop(str(src), "a.jsonl", lines)
    batch = tf.read_jsonl(spark, str(src))
    batch_ids = sorted(r.doc_id for r in
                       ingestion.gate_documents(batch).collect())
    out = str(tmp_path / "out3")
    ingestion.run_ingestion(spark, str(src), out).awaitTermination(120)
    stream_ids = sorted(r.doc_id for r in
                        spark.read.parquet(f"{out}/clean").collect())
    assert stream_ids == batch_ids
