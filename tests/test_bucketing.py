"""Bucketed-table co-located join: the shuffle-elimination strategy
for repeated big-big joins at 100 TB (SURVEY §4 scale notes).

Writing both sides bucketed by the join key into the warehouse lets
Spark plan the join with ZERO exchanges — each bucket pair joins
in place. This test proves the engine convention end-to-end by
inspecting the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse dir (static conf — not settable per-test);
    # tables dropped and locations cleared on both sides of the test
    import shutil

    def clear(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = spark.conf.get("spark.sql.warehouse.dir") \
                  .removeprefix("file:")
        shutil.rmtree(f"{loc}/{name}", ignore_errors=True)

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for name, df, key in (("orders_b", orders, "o_orderkey"),
                          ("lineitem_b", lineitem, "l_orderkey")):
        clear(name)
        (df.write.bucketBy(8, key).sortBy(key)
           .mode("overwrite").saveAsTable(name))
    yield
    for name in ("orders_b", "lineitem_b"):
        clear(name)


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # force the sort-merge path (at sf0.001 AQE would broadcast; at
    # real scale both sides are too big for that — SMJ is the case
    # bucketing exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        l = spark.table("lineitem_b")
        joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    # sanity: result matches the plain parquet join
    plain = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
             .join(spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
    assert joined.count() == plain.count()


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join over plain parquet shuffles both sides
    (when broadcast is disabled) — what bucketing removes."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        plan = _physical_plan(
            l.join(o, l.l_orderkey == o.o_orderkey)
             .select("o_orderkey", "l_linenumber"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_reserved_id_col_rejected(spark):
    """r15 ADVICE low: the staged-column bucketing reserves _ci and
    _d* working names — an id column named like them must be rejected
    loudly, not collide into an ambiguous-column AnalysisException."""
    import pytest

    from light_redistribution_in_3dptf_data_pipeline_spark.operators.similarity import (
        lsh_buckets)
    from light_redistribution_in_3dptf_data_pipeline_spark.plans.ann_index import (
        _mt_bucket_frame)

    emb = spark.createDataFrame(
        [(1, [0.5] * 64)], "_ci LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="reserved"):
        lsh_buckets(emb, id_col="_ci")
    emb2 = emb.withColumnRenamed("_ci", "_d0")
    with pytest.raises(ValueError, match="reserved"):
        _mt_bucket_frame(emb2, "_d0", "embedding", 8, 64, 2)
