"""Fixture-schema canary: fail ONE named test, loudly, when the driver
rewrites /root/testdata and a table's schema drifts.

The ``events.ts`` physical type has drifted twice across rounds
(TIMESTAMP(NANOS) -> nanos-as-long -> timezone-less timestamp[us] /
TIMESTAMP_NTZ), and each drift surfaced as many cascading analysis
errors deep inside queries. This test pins what ``catalog.load_table``
must *return* — a plain ``TimestampType`` regardless of the fixture's
physical encoding — plus the full expected schema of every table, so
the next silent rewrite fails here with a readable message instead of
nine downstream ``DATATYPE_MISMATCH`` stack traces.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import TABLES, load_table

from conftest import SF_DIR, SF_DIR_MID

# Logical schema contract: what load_table must hand to every query,
# whatever the parquet files physically contain. A tuple means "any of
# these is fine" — used for date-ish columns our queries treat
# NTZ-tolerantly (comparisons / date_trunc work on all three).
DATEISH = (T.TimestampType, T.TimestampNTZType, T.DateType)
EXPECTED = {
    "region": {"r_regionkey": T.IntegerType, "r_name": T.StringType},
    "nation": {"n_nationkey": T.IntegerType, "n_name": T.StringType,
               "n_regionkey": T.IntegerType},
    "customer": {"c_custkey": T.LongType, "c_name": T.StringType,
                 "c_nationkey": T.IntegerType, "c_acctbal": T.DoubleType,
                 "c_mktsegment": T.StringType},
    "supplier": {"s_suppkey": T.LongType, "s_name": T.StringType,
                 "s_nationkey": T.IntegerType, "s_acctbal": T.DoubleType},
    "part": {"p_partkey": T.LongType, "p_name": T.StringType,
             "p_brand": T.StringType, "p_type": T.StringType,
             "p_size": T.IntegerType, "p_retailprice": T.DoubleType},
    "orders": {"o_orderkey": T.LongType, "o_custkey": T.LongType,
               "o_orderstatus": T.StringType, "o_totalprice": T.DoubleType,
               "o_orderdate": DATEISH, "o_orderpriority": T.StringType},
    "lineitem": {"l_orderkey": T.LongType, "l_partkey": T.LongType,
                 "l_suppkey": T.LongType, "l_linenumber": T.IntegerType,
                 "l_quantity": T.DoubleType, "l_extendedprice": T.DoubleType,
                 "l_discount": T.DoubleType, "l_tax": T.DoubleType,
                 "l_returnflag": T.StringType, "l_linestatus": T.StringType,
                 "l_shipdate": DATEISH},
    # The drift-prone one: ts MUST come back as TimestampType (not NTZ,
    # not long), or unix_micros / lead / window functions all break.
    "events": {"event_id": T.LongType, "ts": T.TimestampType,
               "user_id": T.LongType, "event_type": T.StringType,
               "value": T.DoubleType, "props": T.StringType},
    "documents": {"doc_id": T.LongType, "text": T.StringType,
                  "lang": T.StringType, "source": T.StringType,
                  "n_chars": T.LongType},
    "embeddings": {"vec_id": T.LongType, "embedding": T.ArrayType,
                   "label": T.IntegerType},
}


# The locally generated sf1 scale-up (tools/gen_sf1.py) must present
# the same logical schema through load_table as the driver fixtures —
# checked when it exists, skipped otherwise (it's gitignored).
SF1_LOCAL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".localdata", "sf1")


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID, SF1_LOCAL],
                         ids=["sf0.001", "sf0.01", "sf1-local"])
@pytest.mark.parametrize("table", TABLES)
def test_fixture_schema_canary(spark, sf_dir, table):
    if not os.path.exists(f"{sf_dir}/{table}.parquet"):
        pytest.skip(f"fixture {sf_dir}/{table}.parquet not present")
    df = load_table(spark, sf_dir, table)
    actual = {f.name: type(f.dataType) for f in df.schema.fields}
    missing = set(EXPECTED[table]) - set(actual)
    assert not missing, (
        f"FIXTURE DRIFT: {sf_dir}/{table}.parquet lost columns {sorted(missing)};"
        f" present: {sorted(actual)}")
    for col, want in EXPECTED[table].items():
        got = actual[col]
        allowed = want if isinstance(want, tuple) else (want,)
        assert got in allowed, (
            f"FIXTURE DRIFT: load_table({table!r}).{col} is {got.__name__},"
            f" expected {'/'.join(w.__name__ for w in allowed)}. If the"
            f" parquet encoding changed, normalize it in catalog.load_table"
            f" (see events.ts history: nanos -> nanos-as-long ->"
            f" TIMESTAMP_NTZ).")


def test_events_ts_values_survive_normalization(spark, duck):
    """Normalizing ts must not shift values: min/max epoch-micros agree
    with DuckDB reading the same file (both under UTC)."""
    df = load_table(spark, SF_DIR, "events")
    from pyspark.sql import functions as F

    row = df.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
        F.count("*").alias("n")).collect()[0]
    lo, hi, n = duck.execute(
        "SELECT epoch_us(min(ts)), epoch_us(max(ts)), count(*) FROM events"
    ).fetchone()
    assert (row["lo"], row["hi"], row["n"]) == (lo, hi, n)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID],
                         ids=["sf0.001", "sf0.01"])
def test_lsh_banding_recall_canary(spark, sf_dir):
    """dx5's green driver row rests on an analytic recall argument:
    verified-LSH output equals the exhaustive tx6 formulation
    *whenever banding recall is 1 at the threshold*. That premise is
    about THIS fixture's pair distribution — a regenerated fixture
    could, with small probability, contain a high-jaccard pair the
    banding misses, flipping the driver row with an opaque hash
    mismatch. Assert recall DIRECTLY: on both fixture scales,
    ``lsh_candidate_pairs`` must cover every pair the exhaustive
    oracle emits at jaccard >= 0.8, for BOTH the 8x4 (dx1 default)
    and 16x2 (dx5 production) bandings."""
    import duckdb

    from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles)
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import NEARDUP_ORACLE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    exact = {(a, b) for a, b, _, jac in con.execute(NEARDUP_ORACLE)
             .fetchall() if jac >= 0.8}
    con.close()
    assert exact, (
        f"FIXTURE DRIFT: {sf_dir} has no jaccard>=0.8 pairs — the "
        "canary lost its subject; regenerate expectations")

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles(docs))
    for bands in (8, 16):
        cands = {(r.doc_a, r.doc_b)
                 for r in lsh_candidate_pairs(sig, bands=bands)
                 .collect()}
        missed = exact - cands
        assert not missed, (
            f"BANDING RECALL BROKEN ({bands} bands, {sf_dir}): LSH "
            f"missed high-jaccard pairs {sorted(missed)} — dx5's "
            "equality-with-exhaustive-oracle premise no longer holds "
            "on this fixture")


def test_sf1_scaleup_invariants():
    """Content invariants of the locally generated sf1 fixture
    (tools/gen_sf1.py) beyond its schema: ASCII-ness and the
    length==n_chars contract survive the Caesar rotation, key
    offsets keep FK joins total, and rolled embeddings preserve
    the norm. Skipped when the fixture hasn't been generated."""
    import duckdb

    if not os.path.exists(f"{SF1_LOCAL}/documents.parquet"):
        pytest.skip("run tools/gen_sf1.py to generate .localdata/sf1")
    con = duckdb.connect()
    bad_ascii, bad_len = con.execute(
        f"SELECT count(*) FILTER (octet_length(encode(text)) <> "
        f"length(text)), count(*) FILTER (length(text) <> n_chars) "
        f"FROM '{SF1_LOCAL}/documents.parquet'").fetchone()
    assert bad_ascii == 0 and bad_len == 0
    # FK totality: every lineitem order key resolves (10x both sides)
    orphans = con.execute(
        f"SELECT count(*) FROM '{SF1_LOCAL}/lineitem.parquet' l "
        f"LEFT JOIN '{SF1_LOCAL}/orders.parquet' o "
        f"ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    # rolled copies preserve the exact squared norm of the original
    drift = con.execute(f"""
        WITH n AS (SELECT vec_id % 2000 AS base, vec_id,
                          list_sum(list_transform(embedding,
                                                  x -> x*x)) AS s
                   FROM '{SF1_LOCAL}/embeddings.parquet')
        SELECT count(*) FROM n
        JOIN n b ON b.vec_id = n.base AND n.vec_id <> n.base
        WHERE n.s <> b.s""").fetchone()[0]
    con.close()
    assert drift == 0


def test_documents_text_is_pure_ascii():
    """The mm media-pipeline oracle derives payload bytes as
    ``ord(substr(text, i+1, 1))`` — valid only while the fixture text
    is pure ASCII (byte i == code point of char i+1). A regenerated
    fixture with multi-byte characters would surface as an opaque
    driver hash mismatch; fail here with a readable message instead."""
    import duckdb

    for d in (SF_DIR, SF_DIR_MID):
        con = duckdb.connect()
        bad = con.execute(
            "SELECT count(*) FROM "
            f"read_parquet('{d}/documents.parquet') "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        con.close()
        assert bad == 0, (
            f"FIXTURE DRIFT: {d}/documents.parquet has {bad} non-ASCII"
            " text rows — the mm oracle's char->byte identity no longer"
            " holds; restate the byte derivation (or sanitize in"
            " _binary_corpus) before trusting mm driver parity.")
