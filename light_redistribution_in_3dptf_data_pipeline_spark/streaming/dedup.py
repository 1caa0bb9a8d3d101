"""Streaming deduplication — the corpus pipeline's exact-dedup stage
(plans/corpus.py, tx3) for documents arriving as a stream.

Two state regimes, chosen by how the duplicate key behaves over time:

- ``streaming_dedup_exact``: duplicates arrive close together in event
  time (re-crawls, retry storms) → ``dropDuplicatesWithinWatermark``
  keeps per-key state only until the watermark passes, so state is
  O(keys per watermark window), not O(all keys ever) — the only form
  that survives an unbounded 100 TB/day stream.
- ``streaming_dedup_keyed``: the key domain itself is bounded (pose
  ids, shard ids) → plain ``dropDuplicates`` with state for every key
  seen; exact across the whole stream but state grows with the domain.

Batch DataFrames pass through the equivalent one-shuffle
``dropDuplicates`` so the same call site serves both (stream-batch
parity is tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """128-bit content key (tx3's dedup key) as a column."""
    return docs.withColumn(
        "content_hash", F.md5(F.col(text_col).cast("binary")))


def streaming_dedup_exact(docs: DataFrame, text_col: str = "text",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Exact dedup on content hash with watermark-bounded state: one
    survivor per hash. A hash seen in an earlier micro-batch always
    suppresses later repeats (state carries across batches); WITHIN a
    micro-batch the surviving row is an arbitrary representative —
    fine for exact dedup, where duplicates are content-identical and
    any representative is equally valid. Batch input degrades to the
    unbounded-exact ``dropDuplicates`` (same arbitrary-representative
    contract)."""
    hashed = with_content_hash(docs, text_col)
    if hashed.isStreaming:
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])


def streaming_dedup_neardup(docs: DataFrame, text_col: str = "text",
                            ts_col: str = "ts",
                            watermark: str = "10 minutes") -> DataFrame:
    """NEAR-duplicate streaming dedup: one survivor per 64-bit SimHash
    fingerprint, watermark-bounded state — catches documents whose
    token multiset is (near-)identical even when the bytes differ
    (whitespace runs, reordered-but-identical token bags), which the
    content-hash exact stage misses.

    The fingerprint is the map-only in-row SimHash
    (operators/dedup.inrow_simhash — the ~6x-per-row cost is the
    price of stream-safety; the codegen'd groupBy form is an
    aggregation and cannot precede a streaming dropDuplicates).
    Scope: equal-fingerprint only (Hamming 0). The banded Hamming-3
    candidate join (simhash_band_candidates) needs a self-join and
    stays a batch/foreachBatch stage — run this as the cheap online
    gate and the banded pass as the periodic batch sweep.
    Batch input degrades to ``dropDuplicates`` on the same column."""
    from ..operators.dedup import inrow_simhash

    fp = docs.withColumn("simhash", inrow_simhash(F.col(text_col)))
    if fp.isStreaming:
        return (fp.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["simhash"]))
    return fp.dropDuplicates(["simhash"])


def streaming_dedup_keyed(docs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact whole-stream dedup on a BOUNDED key domain (state = one
    entry per distinct key, forever). Use only when the key domain is
    known-small; otherwise use streaming_dedup_exact."""
    return docs.dropDuplicates(key_cols)
