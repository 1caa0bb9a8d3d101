"""Streaming JSONL ingestion: drain-the-directory semantics,
quarantine fork, incremental pickup of new drops, stream-batch
parity of the gate."""

from __future__ import annotations

import json
import os

import pytest

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


def test_streaming_delta_dedup_end_to_end(spark, tmp_path):
    """The full production loop: two availableNow drains through the
    delta-dedup gate. Duplicates are suppressed in-batch AND across
    drains via the persisted indexes; every drained epoch commits a
    manifest; malformed rows land in quarantine."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    src = tmp_path / "drop4"
    src.mkdir()
    root = str(tmp_path / "corpus4")

    a = "the quick brown fox jumps over lazy dogs"
    b = "alpha beta gamma delta epsilon zeta words"
    _drop(str(src), "a.jsonl", [
        _doc(1, a),
        _doc(2, b),
        _doc(3, a),                    # in-batch exact dup of 1
        _doc(4, "too short"),          # quality gate
        '{"doc_id": broken',           # malformed → quarantine
    ])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    first = corpus.committed_batches(spark, root)
    assert len(first) == 1 and first[0].endswith("-00000000")
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2]
    assert spark.read.parquet(f"{root}/rejects").count() == 1

    _drop(str(src), "b.jsonl", [
        _doc(10, a),                           # cross-drain exact dup
        _doc(11, "alpha  beta gamma  delta epsilon zeta words"),
        _doc(12, "entirely new second drain content here folks"),
    ])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    both = corpus.committed_batches(spark, root)
    # same checkpoint ⇒ same nonce: second drain is epoch 1 of the
    # same incarnation
    assert both == [first[0],
                    first[0].replace("-00000000", "-00000001")]
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2, 12]
    m = corpus.read_manifest(spark, root, both[1])
    assert m["n_exact_dropped"] == 1 and m["n_neardup_dropped"] == 1 \
        and m["n_admitted"] == 1

    # a third drain with nothing new fires no batch and burns no id
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    assert len(corpus.committed_batches(spark, root)) == 2


def test_streaming_crash_replay_exactly_once(spark, tmp_path,
                                             monkeypatch):
    """Exactly-once across stream failures: a drain that crashes
    mid-commit (after the corpus write, before the manifest) fails
    the query; restarting the stream replays the SAME epoch from the
    checkpoint, the manifest-last protocol sweeps the crashed
    attempt, and the batch lands exactly once. A lost checkpoint
    mints a fresh incarnation nonce, so the restarted stream's epoch
    0 re-runs the same files under a NEW batch id — the persisted
    indexes (not id collision) suppress the content, and the replay
    commits an empty batch instead of aliasing the old one."""
    import shutil

    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    src = tmp_path / "drop5"
    src.mkdir()
    root = str(tmp_path / "corpus5")
    _drop(str(src), "a.jsonl", [
        _doc(1, "one two three four five six"),
        _doc(2, "alpha beta gamma delta epsilon zeta"),
    ])

    real = corpus.ingest_delta
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            kwargs["_crash_after"] = "corpus"
        return real(*args, **kwargs)

    monkeypatch.setattr(corpus, "ingest_delta", flaky)
    q = ingestion.run_ingestion_with_dedup(spark, str(src), root)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    assert corpus.committed_batches(spark, root) == []   # nothing visible

    # restart: same checkpoint replays epoch 0 under the SAME id
    # (same incarnation nonce), recovery re-runs the batch
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    committed = corpus.committed_batches(spark, root)
    assert len(committed) == 1 and committed[0].endswith("-00000000")
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2]

    # lost checkpoint: epoch 0 re-fires over the same files under a
    # FRESH incarnation id; the persisted indexes dedup everything,
    # so the replay commits an empty batch — no duplicate rows
    shutil.rmtree(f"{root}/_stream_checkpoint")
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    after = corpus.committed_batches(spark, root)
    assert committed[0] in after and len(after) == 2
    replay = next(b for b in after if b != committed[0])
    assert replay != committed[0] and replay.endswith("-00000000")
    assert corpus.read_manifest(spark, root, replay)["n_admitted"] == 0
    assert corpus.read_corpus(spark, root).count() == 2


def test_lost_checkpoint_with_new_files_still_ingests(spark, tmp_path):
    """The r7 hazard (VERDICT "What's missing" #1): checkpoint lost,
    then a NEW file lands. The restarted stream's epoch 0 covers ALL
    files — old and new. With epoch-scoped ids this superset batch
    aliased the committed epoch 0 and silently no-opped, losing the
    new file forever; with incarnation-scoped ids it runs under a
    fresh id, the indexes suppress the old content, and the new file
    is admitted exactly once."""
    import shutil

    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    src = tmp_path / "drop7"
    src.mkdir()
    root = str(tmp_path / "corpus7")
    _drop(str(src), "a.jsonl", [
        _doc(1, "one two three four five six"),
        _doc(2, "alpha beta gamma delta epsilon zeta")])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    assert corpus.read_corpus(spark, root).count() == 2

    shutil.rmtree(f"{root}/_stream_checkpoint")
    _drop(str(src), "b.jsonl", [
        _doc(3, "landed after the checkpoint was lost folks")])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2, 3]

    # and the re-drain admitted ONLY the new document (old content
    # was suppressed by the indexes, not re-admitted)
    batches = corpus.committed_batches(spark, root)
    assert len(batches) == 2
    admitted = {b: corpus.read_manifest(spark, root, b)["n_admitted"]
                for b in batches}
    assert sorted(admitted.values()) == [1, 2]


def test_compaction_between_drains_keeps_dedup_and_identity(
        spark, tmp_path):
    """Maintenance mid-stream: compacting between drains must not
    break cross-drain dedup (the compacted index still gates) nor
    replay protection (superseded stream epochs still read as
    already-ingested after a checkpoint loss)."""
    import shutil

    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    src = tmp_path / "drop6"
    src.mkdir()
    root = str(tmp_path / "corpus6")
    a = "the quick brown fox jumps over lazy dogs"
    _drop(str(src), "a.jsonl", [_doc(1, a),
                                _doc(2, "alpha beta gamma delta five")])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)

    cid = corpus.compact_batches(spark, root)
    assert corpus.committed_batches(spark, root) == [cid]

    _drop(str(src), "b.jsonl", [
        _doc(10, a),                                   # dup vs compacted
        _doc(11, "post compaction novel document text here")])
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2, 11]

    # lost checkpoint: epoch 0 re-fires over everything under a fresh
    # incarnation id; the COMPACTED indexes still suppress it all
    shutil.rmtree(f"{root}/_stream_checkpoint")
    ingestion.run_ingestion_with_dedup(
        spark, str(src), root).awaitTermination(120)
    assert sorted(r.doc_id for r in
                  corpus.read_corpus(spark, root).collect()) == [1, 2, 11]


def test_reconcile_replay_warns_on_divergent_source(spark, tmp_path):
    """Defense-in-depth on the exactly-once no-op path (ADVICE r8
    residual): a replayed micro-batch whose row count diverges from
    the committed manifest's n_input means the source broke
    same-epoch-same-data — loud RuntimeWarning, committed batch kept.
    A batch folded by compaction has no manifest left and is
    skipped."""
    from light_redistribution_in_3dptf_data_pipeline_spark.plans import corpus

    root = str(tmp_path / "root")
    docs = spark.createDataFrame(
        [(i, f"replay reconciliation doc {i} alpha beta gamma delta",
          "en", "s", 1) for i in (1, 2, 3)],
        "doc_id LONG, text STRING, lang STRING, "
        "source STRING, n_chars LONG")
    corpus.ingest_delta(spark, root, docs, batch_id="b1")

    assert ingestion.reconcile_replay(spark, root, "b1", 3) is True
    with pytest.warns(RuntimeWarning, match="same-epoch-same-data"):
        assert ingestion.reconcile_replay(spark, root, "b1", 5) \
            is False
    corpus.compact_batches(spark, root)
    assert ingestion.reconcile_replay(spark, root, "b1", 5) is True


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
