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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table. Column pruning + predicate pushdown
    happen at the parquet scan because we never materialize here.

    ``events.ts`` may be written as TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; in that case we read it as raw nanos and
    convert to a microsecond timestamp (the fixture has no
    sub-microsecond parts, so this is lossless and matches DuckDB's
    value). When the fixture is already TIMESTAMP(MICROS) the column
    arrives as a timestamp and no conversion is needed.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql surface)."""
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
