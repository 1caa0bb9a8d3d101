"""Property-based tests (hypothesis) for the shared Column builders:
each Spark expression is compared against a plain-Python/NumPy
reference on randomized inputs, batched so one Spark job covers a
whole generated example set."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.functions import (
    decimal_components, decimal_dot, ngram_shingles, whitespace_tokens)

TOKEN = st.text(alphabet="abcxyz", min_size=1, max_size=4)


def _py_shingles(toks: list[str], n: int) -> list[str]:
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i:i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(TOKEN, min_size=0, max_size=12), min_size=1,
                max_size=20), st.integers(min_value=2, max_value=4))
def test_ngram_shingles_match_python(spark, docs, n):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    toks_df = df.select("doc_id", whitespace_tokens(F.col("text"))
                        .alias("toks"))
    got = {r.doc_id: r.sh for r in toks_df.select(
        "doc_id", ngram_shingles(F.col("toks"), n).alias("sh")).collect()}
    for i, toks in enumerate(docs):
        # split on whitespace mirrors the tokenizer (empty text → [''])
        pytoks = " ".join(toks).strip().split()
        if not pytoks:
            pytoks = [""]
        assert got[i] == _py_shingles(pytoks, n), (toks, n)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(TOKEN, min_size=0, max_size=12), min_size=1,
                max_size=20), st.integers(min_value=2, max_value=4))
def test_ngram_shingles_raw_keeps_positional_duplicates(spark, docs, n):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    toks_df = df.select("doc_id", whitespace_tokens(F.col("text"))
                        .alias("toks"))
    got = {r.doc_id: r.sh for r in toks_df.select(
        "doc_id", ngram_shingles(F.col("toks"), n, distinct=False)
        .alias("sh")).collect()}
    for i, toks in enumerate(docs):
        pytoks = " ".join(toks).strip().split() or [""]
        want = [" ".join(pytoks[j:j + n])
                for j in range(max(len(pytoks) - n + 1, 0))]
        assert got[i] == want, (toks, n)


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(
        st.lists(st.floats(min_value=-1.0, max_value=1.0, width=32),
                 min_size=1, max_size=64),
        st.lists(st.floats(min_value=-1.0, max_value=1.0, width=32),
                 min_size=1, max_size=64)),
    min_size=1, max_size=10))
def test_decimal_dot_tracks_numpy(spark, pairs):
    pairs = [(u[:min(len(u), len(v))], v[:min(len(u), len(v))])
             for u, v in pairs]
    rows = [(i, u, v) for i, (u, v) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "i INT, u ARRAY<FLOAT>, v ARRAY<FLOAT>")
    got = {r.i: r.d for r in df.select(
        "i", decimal_dot(decimal_components(F.col("u")),
                         decimal_components(F.col("v"))).alias("d"))
        .collect()}
    for i, (u, v) in enumerate(pairs):
        want = float(np.dot(np.asarray(u, dtype=np.float64),
                            np.asarray(v, dtype=np.float64)))
        # decimal(18,9) rounding of each component → ≤ 0.5e-9 per
        # element against the float64 reference
        assert abs(got[i] - want) < 1e-6, (i, got[i], want)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=9999),
                          st.integers(min_value=0, max_value=99)),
                min_size=1, max_size=300))
def test_bucketed_row_number_equals_global(spark, rows):
    """The scale-out prefix-sum row number must equal the single-task
    global row_number for ANY data, with a monotone bucket of the
    leading sort key (value // 100 here, the hour-truncation analog)."""
    from pyspark.sql import Window

    from light_redistribution_in_3dptf_data_pipeline_spark.operators.prefix_sum import (
        bucketed_row_number)

    df = spark.createDataFrame(
        [(v, t, i) for i, (v, t) in enumerate(rows)],
        "v INT, tie INT, uid INT")
    got = {r.uid: r.rn for r in bucketed_row_number(
        df, F.floor(F.col("v") / 100), ["v", "tie", "uid"]).collect()}
    want = {r.uid: r.rn for r in df.select(
        "uid", F.row_number().over(
            Window.orderBy("v", "tie", "uid")).alias("rn")).collect()}
    assert got == want


def test_redact_pii_counts_and_cleans(spark):
    from light_redistribution_in_3dptf_data_pipeline_spark.functions import (
        redact_pii_cols)

    rows = [
        (0, "contact me at alice.smith+x@example.co.uk or visit "
            "https://example.com/a?b=c#d now"),
        (1, "server 192.168.0.1 answered; call +1 415-555-0199 today"),
        (2, "no pii here at all"),
        (3, "mail bob@host.org mail carol@host.org"),
        # email inside a URL is consumed by the URL rule only
        (4, "see https://x.io/path?mail=dave@host.org trailing"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    cols = redact_pii_cols(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}

    assert (got[0]["n_email"], got[0]["n_url"]) == (1, 1)
    assert "<EMAIL>" in got[0]["clean_text"]
    assert "<URL>" in got[0]["clean_text"]
    assert (got[1]["n_ip"], got[1]["n_phone"]) == (1, 1)
    assert got[2]["clean_text"] == "no pii here at all"
    assert sum((got[2][f"n_{k}"] for k in ("url", "email", "ip",
                                           "phone"))) == 0
    assert got[3]["n_email"] == 2
    assert (got[4]["n_url"], got[4]["n_email"]) == (1, 0)
    # nothing redactable survives in any cleaned text
    for r in got.values():
        ct = r["clean_text"]
        assert "@" not in ct.replace("<EMAIL>", "")
        assert "http" not in ct.replace("<URL>", "")


def test_normalize_text_idempotent_and_canonical(spark):
    from light_redistribution_in_3dptf_data_pipeline_spark.functions import (
        normalize_text)

    rows = [(0, "  Mixed   CASE\tand\n\nodd \x01 spacing  "),
            (1, "already normal"),
            (2, "A\x00B")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    once = df.select("doc_id", normalize_text(F.col("text")).alias("t"))
    twice = once.select("doc_id", normalize_text(F.col("t")).alias("t"))
    g1 = {r["doc_id"]: r["t"] for r in once.collect()}
    g2 = {r["doc_id"]: r["t"] for r in twice.collect()}
    assert g1 == g2  # idempotent
    assert g1[0] == "mixed case and odd spacing"
    assert g1[1] == "already normal"
    assert g1[2] == "a b"
