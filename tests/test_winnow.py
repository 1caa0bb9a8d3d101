"""Winnowing fingerprint: Column-algebra ≡ Arrow-numpy ≡ pure Python.

The registered tx1 query runs the Arrow fast path; the DuckDB oracle
restates the Column algebra. These tests close the triangle so the
oracle check transfers to the production path.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
    WINNOW_B,
    WINNOW_K,
    WINNOW_M,
    WINNOW_W,
    with_winnow_stats,
)
from light_redistribution_in_3dptf_data_pipeline_spark.udf.winnow import (
    winnow_np,
    with_winnow_stats_arrow,
)

from conftest import SF_DIR


def _py_winnow(text: str) -> tuple[int, int]:
    n = len(text)
    if n < WINNOW_K:
        return 0, 0
    rh = []
    for i in range(n - WINNOW_K + 1):
        h = 0
        for j in range(WINNOW_K):
            h = (h * WINNOW_B + ord(text[i + j])) % WINNOW_M
        rh.append(h)
    if len(rh) < WINNOW_W:
        wins = [min(rh)]
    else:
        wins = [min(rh[i:i + WINNOW_W])
                for i in range(len(rh) - WINNOW_W + 1)]
    fps = set(wins)
    return len(fps), sum(fps)


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=64))
def test_numpy_matches_python(text):
    assert winnow_np(text, WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_M) \
        == _py_winnow(text)


def test_column_and_arrow_agree_on_fixture(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    a = {r.doc_id: (r.n_winnow_fp, r.winnow_digest)
         for r in with_winnow_stats(docs).collect()}
    b = {r.doc_id: (r.n_winnow_fp, r.winnow_digest)
         for r in with_winnow_stats_arrow(docs).collect()}
    assert a == b
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, got in a.items():
        assert got == _py_winnow(texts[doc_id]), doc_id


@pytest.mark.parametrize("text", [
    "", "short", "exactly8!", "a" * 40, "统计 概率 模型 训练 数据",
    "x" * 7, "x" * 8, "x" * 11,  # below/at/just-above k and k+w-1
])
def test_edge_lengths_agree(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id INT, text STRING")
    col_row = with_winnow_stats(df).collect()[0]
    arr_row = with_winnow_stats_arrow(df).collect()[0]
    want = _py_winnow(text)
    assert (col_row.n_winnow_fp, col_row.winnow_digest) == want
    assert (arr_row.n_winnow_fp, arr_row.winnow_digest) == want
