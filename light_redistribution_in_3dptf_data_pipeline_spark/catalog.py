"""Table catalog: load the star-schema parquet tables for a scale dir.

The reference keeps its store as one pickled dict-of-dicts
(``src/core/data_manager.py:5-60``); here every logical table is a
Parquet dataset read lazily, registered as a temp view, and pruned /
filtered by Catalyst at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _events_fixture_is_nanos(path: str) -> bool:
    """Peek at the parquet footer: is ``ts`` TIMESTAMP(NANOS)?

    Spark's vectorized reader rejects nanos timestamps unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set, and that conf is
    session-global — so we only flip it when the fixture actually needs
    it, instead of silently changing how every other nanos parquet in
    the session is read.
    """
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        t = schema.field("ts").type
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table. Column pruning + predicate pushdown
    happen at the parquet scan because we never materialize here.

    ``events.ts`` has drifted across fixture generations; we normalize
    every variant to a plain ``TimestampType`` (session TZ is pinned
    UTC in ``session.py`` and ``__spark_entry__.py``, so values match
    DuckDB's either way):

    - TIMESTAMP(NANOS): the vectorized reader rejects it, so we read
      raw nanos (``nanosAsLong``, scoped to this case only) and convert
      to microsecond timestamps — the fixture has no sub-microsecond
      parts, so this is lossless.
    - timezone-less ``timestamp[us]``: Spark >=3.4 reads TIMESTAMP_NTZ,
      which ``unix_micros``/window functions reject → cast to
      ``timestamp`` (wall-clock values unchanged under UTC session TZ).
    - tz-adjusted TIMESTAMP(MICROS): arrives as TimestampType, no-op.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if _events_fixture_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql surface)."""
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
