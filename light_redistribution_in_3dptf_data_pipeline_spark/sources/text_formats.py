"""Line-oriented text ingestion: JSONL and CSV sources/sinks with
explicit schemas and malformed-record policy.

A corpus pipeline's raw inputs are rarely Parquet — crawler output is
JSONL, vendor drops are CSV. The engine-side rules that make these
scale:

- **Always pass an explicit schema.** Without one Spark runs a whole
  extra inference pass over the data (2x the IO at 100 TB) and infers
  unstable types across drops.
- **Malformed rows are data, not exceptions.** PERMISSIVE mode +
  ``columnNameOfCorruptRecord`` lands bad lines in a quarantine
  column; the pipeline forks them to a reject sink instead of dying
  mid-job (FAILFAST is for small trusted dims only).
- **JSONL is splittable; gzipped JSONL is not.** One .jsonl.gz file =
  one task regardless of size — shard compressed drops upstream or
  recompress to a splittable layout before the big read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields)
                        + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCUMENTS_SCHEMA) -> DataFrame:
    """PERMISSIVE JSONL read: well-formed rows get typed columns,
    malformed lines land whole in ``_corrupt_record`` (NULL elsewhere).
    Returns the full frame — split with :func:`quarantine`."""
    return (spark.read
            .schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType = DOCUMENTS_SCHEMA,
             header: bool = True) -> DataFrame:
    """PERMISSIVE CSV read with the same quarantine contract as
    :func:`read_jsonl`."""
    return (spark.read
            .schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", "true" if header else "false")
            .csv(path))


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected): fork malformed rows out of a PERMISSIVE
    read. ``clean`` drops the corrupt column entirely; ``rejected``
    keeps the raw line for the reject sink. Spark refuses to run
    filters that touch ``_corrupt_record`` directly against the raw
    file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    contract is to cache the parsed frame first, which also means the
    parse pass is shared by both forks instead of running twice."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejected = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, rejected


def write_jsonl(df: DataFrame, path: str, partitions: int = 1) -> None:
    """JSONL sink. ``partitions`` controls output shard count —
    at scale leave repartitioning to the caller and pass 0 to keep
    the existing layout."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, partitions: int = 1) -> None:
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").option("header", "true").csv(path)
