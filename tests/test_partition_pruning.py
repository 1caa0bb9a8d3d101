"""Partition-pruning proof: corpora written partitioned by a filter
column are read with partition filters, not full scans — the layout
contract that makes lang/cell-sliced queries touch 1/K of a 100 TB
corpus."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def lang_partitioned(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part") / "docs_by_lang")
    (spark.read.parquet(f"{SF_DIR}/documents.parquet")
     .write.partitionBy("lang").mode("overwrite").parquet(d))
    return d


def test_lang_filter_becomes_partition_filter(spark, lang_partitioned):
    df = (spark.read.parquet(lang_partitioned)
          .filter(F.col("lang") == "de")
          .select("doc_id", "n_chars"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    # the data filter list must NOT contain the partition predicate
    # (it is pruned at listing time, no row-level evaluation)
    dm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert dm is None or "lang" not in dm.group(1)


def test_pruned_read_returns_only_partition(spark, lang_partitioned):
    full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = full.filter(F.col("lang") == "de").count()
    pruned = (spark.read.parquet(lang_partitioned)
              .filter(F.col("lang") == "de"))
    assert pruned.count() == expected
    # partition values round-trip (string-typed after partitionBy)
    assert {r.lang for r in pruned.select("lang").distinct()
            .collect()} == {"de"}


def test_projection_prunes_columns(spark, lang_partitioned):
    df = (spark.read.parquet(lang_partitioned)
          .select("doc_id"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "doc_id:bigint", plan
