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


class TestAnnStoredIndex:
    """The ANN module's scale claim, demonstrated on disk: the bucket
    column IS the partition key, and a query's literal probe set
    prunes the scan to J+1 of 2^J directories at PLAN time."""

    def test_indexed_query_matches_inmemory_and_prunes(
            self, spark, tmp_path):
        from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
        from light_redistribution_in_3dptf_data_pipeline_spark.operators import similarity as S

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = str(tmp_path / "ann_index")
        S.write_ann_index(emb, path)

        qvec = [float(x) for x in emb.filter("vec_id = 0")
                .select("embedding").collect()[0][0]]
        got = S.ann_indexed_topk(spark, path, qvec, exclude_id=0)
        rows = got.collect()
        want = [(r.vec_id, r.cosine, r.bucket)
                for r in S.ann_cosine_topk(emb).collect()]
        assert [(r.vec_id, r.cosine, r.bucket) for r in rows] == want

        # driver-side bucket == distributed bucket for every vector
        buckets = {r.vec_id: r.bucket
                   for r in S.lsh_buckets(emb).collect()}
        sample = emb.limit(20).collect()
        for r in sample:
            assert S.query_bucket(list(map(float, r.embedding))) \
                == buckets[r.vec_id]

        # static pruning: the scan carries a LITERAL partition filter
        # (bucket IN (...)) with at most J+1 probe buckets — far
        # fewer than the populated partition count, so the directory
        # listing itself is pruned at plan time
        import re

        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([^)]*)\)",
                      plan)
        assert m is not None, (
            "scan lost its static partition filter:\n" + plan[:2000])
        n_probed = len(m.group(1).split(","))
        n_total = (spark.read.parquet(path)
                   .select("bucket").distinct().count())
        assert n_probed <= S.NUM_PLANES + 1 < n_total, (
            f"pruning ineffective: {n_probed} of {n_total} partitions")

    def test_meta_validation_rejects_drift(self, spark, tmp_path):
        """An index built with different hyperplane parameters must
        refuse the query loudly — a silent mismatch would probe the
        wrong buckets and return near-empty results."""
        import os

        from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
        from light_redistribution_in_3dptf_data_pipeline_spark.operators import similarity as S

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = str(tmp_path / "ann6")
        S.write_ann_index(emb, path, num_planes=6)
        qvec = [float(x) for x in emb.filter("vec_id = 0")
                .select("embedding").collect()[0][0]]

        # matching parameters: fine
        assert S.ann_indexed_topk(spark, path, qvec, num_planes=6,
                                  exclude_id=0).count() > 0
        # plane-count drift: loud failure
        with pytest.raises(ValueError, match="different parameters"):
            S.ann_indexed_topk(spark, path, qvec, num_planes=8)
        # missing sidecar (pre-meta index / manual tampering): refuse
        os.remove(os.path.join(path, S.INDEX_META_FILE))
        with pytest.raises(ValueError, match="no _meta"):
            S.ann_indexed_topk(spark, path, qvec, num_planes=6)

    def test_query_bucket_rejects_wrong_dim(self):
        import pytest

        from light_redistribution_in_3dptf_data_pipeline_spark.operators import similarity as S

        with pytest.raises(ValueError, match="64-dim"):
            S.query_bucket([0.5] * 32)


class TestIvfStoredIndex:
    """ivf_search_topk's docstring claim on disk: posting lists
    partitioned by cell, centroids collected driver-side, the probe
    scan pruned to nprobe of L directories at plan time."""

    def test_indexed_query_matches_inmemory_and_prunes(
            self, spark, tmp_path):
        import re

        from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
        from light_redistribution_in_3dptf_data_pipeline_spark.operators import similarity as S

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = str(tmp_path / "ivf_index")
        S.write_ivf_index(emb, path)

        qvec = [float(x) for x in emb.filter("vec_id = 0")
                .select("embedding").collect()[0][0]]
        got = S.ivf_indexed_topk(spark, path, qvec, nprobe=2,
                                 exclude_id=0)
        rows = [(r.vec_id, r.cosine, r.cell) for r in got.collect()]
        want = [(r.vec_id, r.cosine, r.cell)
                for r in S.ivf_search_topk(emb, nprobe=2).collect()]
        assert rows == want

        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)",
                      plan)
        assert m is not None, (
            "posting scan lost its static partition filter:\n"
            + plan[:2000])
        n_probed = len(m.group(1).split(","))
        n_cells = emb.select("label").distinct().count()
        assert n_probed == 2 < n_cells, (n_probed, n_cells)

    def test_meta_validation(self, spark, tmp_path):
        """Dimensionality and index-kind drift refuse loudly."""
        from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
        from light_redistribution_in_3dptf_data_pipeline_spark.operators import similarity as S

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        ivf_path = str(tmp_path / "ivf_meta")
        S.write_ivf_index(emb, ivf_path)
        with pytest.raises(ValueError, match="32-dim"):
            S.ivf_indexed_topk(spark, ivf_path, [0.5] * 32)
        # wrong index kind: an ANN index queried as IVF
        ann_path = str(tmp_path / "ann_meta")
        S.write_ann_index(emb, ann_path)
        qvec = [0.5] * S.EMB_DIM
        with pytest.raises(ValueError, match="kind"):
            S.ivf_indexed_topk(spark, ann_path, qvec)
