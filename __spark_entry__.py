"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``light_redistribution_in_3dptf_data_pipeline_spark``
package; this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: missing-pose detection (capture-group
    sessionization + gap analysis) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    flagship = QUERIES["w_missing_pose_detection"]
    return flagship.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return QUERIES[name].builder(spark, sf_dir)
        run.__name__ = name
        return run

    return {name: make(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; non-SQL-expressible ops are
    omitted (driver records a weaker rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items()
            if q.oracle is not None}
