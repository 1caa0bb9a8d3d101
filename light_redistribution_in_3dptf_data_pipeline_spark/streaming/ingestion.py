"""Streaming corpus ingestion: a JSONL drop directory consumed as a
Structured Streaming file source, quality-gated and quarantined
continuously.

The batch ingestion contract (sources/text_formats.py) carries over
unchanged — same explicit schema, same PERMISSIVE corrupt-record
quarantine — because a Structured Streaming file source is just
``readStream`` over the same format options. New files landing in the
directory become micro-batches; ``maxFilesPerTrigger`` bounds batch
size so one giant drop can't blow executor memory.

Scale notes:
- The file-source *listing* is the bottleneck for huge directories —
  at 100 TB/day partition the drop path by arrival hour and point the
  stream at the current partitions, or front with a queue source.
- The gate + quarantine fork are stateless row filters: no watermark,
  no state store, arbitrary parallelism.
- Stateless forks mean two sinks; run them as two queries over the
  same source (Spark shares the file listing via the checkpoint) or
  use ``foreachBatch`` to write both from one pass (done here —
  one parse per micro-batch, two Parquet writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.text_formats import CORRUPT_COL, DOCUMENTS_SCHEMA, _with_corrupt

MIN_TOKENS = 5


def stream_jsonl(spark: SparkSession, path: str,
                 schema: T.StructType = DOCUMENTS_SCHEMA,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming JSONL source with the batch quarantine contract."""
    reader = (spark.readStream
              .schema(_with_corrupt(schema))
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.json(path)


def gate_documents(stream: DataFrame,
                   min_tokens: int = MIN_TOKENS) -> DataFrame:
    """Stateless quality gate on the clean fork: parseable, non-null
    text, token-count floor. Works identically on batch frames (no
    streaming-only ops), so stream-batch parity is testable."""
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (stream.filter(F.col(CORRUPT_COL).isNull())
            .drop(CORRUPT_COL)
            .filter(F.col("text").isNotNull()
                    & (n_tokens >= min_tokens)))


def run_ingestion(spark: SparkSession, src_path: str, out_root: str,
                  min_tokens: int = MIN_TOKENS,
                  max_files_per_trigger: int | None = None):
    """Drive the drop directory to Parquet once (availableNow — drains
    everything currently in the directory, then stops; re-invoking
    picks up only NEW files via the checkpoint). One parse per
    micro-batch feeds BOTH sinks via foreachBatch:
    ``{out_root}/clean`` and ``{out_root}/rejects``."""
    stream = stream_jsonl(spark, src_path,
                          max_files_per_trigger=max_files_per_trigger)

    def write_both(batch: DataFrame, batch_id: int) -> None:
        batch = batch.cache()
        try:
            (gate_documents(batch, min_tokens)
             .write.mode("append").parquet(f"{out_root}/clean"))
            (batch.filter(F.col(CORRUPT_COL).isNotNull())
             .write.mode("append").parquet(f"{out_root}/rejects"))
        finally:
            batch.unpersist()

    return (stream.writeStream
            .foreachBatch(write_both)
            .option("checkpointLocation", f"{out_root}/_checkpoint")
            .trigger(availableNow=True)
            .start())
