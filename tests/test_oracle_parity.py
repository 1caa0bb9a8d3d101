"""Spark↔DuckDB parity for every oracle-checked query in the registry.

Mirrors the driver's check: sort columns by name, sort rows, compare
values. We compare *exactly* (no tolerance) — the engine's decimal-
exact aggregation discipline is designed to make that possible; any
mismatch here means the driver's hash check would fail too.
"""

from __future__ import annotations

import datetime
import math

import pytest

from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES

from conftest import SF_DIR


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", repr(float(v)))
    except ImportError:  # pragma: no cover
        pass
    return ("s", str(v))


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(name, spark, duck):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    s_cols, s_rows = _normalize(spark_cols, spark_rows)
    d_cols, d_rows = _normalize(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}")
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: "
        f"{mismatches[:3]}")


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["gid", "first_ts", "last_ts", "n_events",
                          "gap_s", "gap_flag", "missing_before"]


def test_registry_complete():
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
