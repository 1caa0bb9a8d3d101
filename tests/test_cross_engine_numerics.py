"""Cross-engine numeric-conversion conventions (r5 regressions).

Two engine-portability hazards were found by the sf0.1 oracle sweep —
both invisible at the driver's sf0.01 scale:

1. double→DECIMAL(18,9): Spark rounds the shortest decimal repr
   (BigDecimal.valueOf), DuckDB rounds the exact binary value — one
   nano-unit apart within an ulp of a scale-9 half boundary. Fix: the
   canonical fixed-point conversion is ``floor(x*1e9 + 0.5)`` (pure
   IEEE ops, identical in any engine).
2. DECIMAL(p,s>0)→DOUBLE past 2^53 scaled units: Spark converts
   correctly rounded, DuckDB divides by 10^s in floats (1-2 ulp off).
   Fix: route through VARCHAR (exact digits both engines; string→
   double is correctly rounded in both).

These tests pin both conventions on adversarial values so a refactor
that silently reintroduces the old casts fails here, not as an opaque
driver hash mismatch three rounds later.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

# Doubles whose shortest repr sits on/near a scale-9 half boundary,
# plus sign/magnitude edges — the class that split the engines under
# the old double->DECIMAL cast (observed live on a component of
# fixture vec 364 at sf0.1; the exact trigger rides the float32 bit
# pattern, so the convention is pinned on the whole family).
BOUNDARY_VALUES = [
    0.0001234567895, -0.0001234567895,
    0.1234567895, 1.0000000005, 0.9999999995,
    2.5e-10, -2.5e-10, 5e-10, -5e-10,
    0.3477773065, -0.3477773065,
    0.0, 1.0, -1.0, 9.87654321,
]


def test_floor_nano_conversion_matches_duckdb_on_boundaries(spark):
    from light_redistribution_in_3dptf_data_pipeline_spark.functions import (
        nano_components)

    df = spark.createDataFrame([(BOUNDARY_VALUES,)], "v ARRAY<DOUBLE>")
    [spark_nano] = df.select(nano_components(F.col("v")).alias("n")) \
                     .collect()[0]

    con = duckdb.connect()
    values_sql = "[" + ", ".join(repr(v) for v in BOUNDARY_VALUES) + "]"
    [duck_nano] = con.execute(
        "SELECT list_transform(" + values_sql + ", "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000000.0 + 0.5) "
        "AS BIGINT))").fetchone()
    con.close()
    assert list(spark_nano) == list(duck_nano), (
        "floor-nano conversion diverged between engines")


# Exact decimals whose scaled units exceed 2^53 — conversion to
# double requires rounding, where the engines' direct casts split.
BIG_DECIMALS = [
    "31390106146.597605",     # the live sf0.1 sum_charge divergence
    "98765432109876.543215",
    "9007199254740993.25",    # 2^53+1 territory
    "-31390106146.597605",
    "123456789012345678.99",
]


def test_varchar_route_decimal_to_double_is_correctly_rounded(spark):
    con = duckdb.connect()
    for s in BIG_DECIMALS:
        want = float(Decimal(s))   # Python: correctly rounded
        got_duck = con.execute(
            f"SELECT CAST(CAST(CAST('{s}' AS DECIMAL(38,9)) AS VARCHAR)"
            " AS DOUBLE)").fetchone()[0]
        assert got_duck == want, (s, got_duck.hex(), want.hex())
    con.close()
    rows = spark.createDataFrame([(s,) for s in BIG_DECIMALS],
                                 "s STRING")
    got_spark = [r[0] for r in rows.select(
        F.col("s").cast("decimal(38,9)").cast("string").cast("double")
    ).collect()]
    assert got_spark == [float(Decimal(s)) for s in BIG_DECIMALS]


def test_duckdb_direct_decimal_cast_still_broken():
    """The reason _dbl() exists (queries/aggregates.py): DuckDB's
    direct DECIMAL(s>0)→DOUBLE cast is not correctly rounded past
    2^53 scaled units. If DuckDB fixes this, the route can be
    simplified — this test flags that moment."""
    con = duckdb.connect()
    diverged = False
    for s in BIG_DECIMALS:
        got = con.execute(
            f"SELECT CAST(CAST('{s}' AS DECIMAL(38,9)) AS DOUBLE)"
        ).fetchone()[0]
        if got != float(Decimal(s)):
            diverged = True
    con.close()
    assert diverged, (
        "DuckDB's direct decimal->double cast is now correctly "
        "rounded on every probe value — _dbl()'s VARCHAR route may "
        "be simplifiable")


def test_scale0_decimal_to_double_conventions(spark):
    """r6 (closes r5 ADVICE #4): the scale-0 arm of the 2^53 hazard —
    fixed-point dot-product sums (DECIMAL(38,0), nsq ~1e20-1e21 in the
    cosine paths). Spark's DIRECT decimal→double is correctly rounded
    (pinned here on ~8k randomized magnitude-boundary cases plus hard
    edges), so the Spark plans keep the cheap direct cast; DuckDB's
    hugeint-backed conversion computes upper*2^64 + lower (two
    roundings, not guaranteed correct), so the similarity ORACLES
    route through VARCHAR — pinned correctly rounded here too."""
    import random

    rng = random.Random(1)
    vals = [rng.randrange(10 ** e, 10 ** (e + 1))
            for e in (18, 19, 20, 21) for _ in range(2000)]
    vals += [2 ** 53 + 1, 2 ** 53 + 3, 10 ** 19 + 1, -(10 ** 20 + 7)]

    df = spark.createDataFrame([(str(v),) for v in vals], "s STRING")
    rows = df.select(
        "s",
        F.col("s").cast("decimal(38,0)").cast("double").alias("direct"),
        F.col("s").cast("decimal(38,0)").cast("string").cast("double")
         .alias("routed")).collect()
    bad = [(r.s, r.direct, r.routed) for r in rows
           if not (r.direct == r.routed == float(r.s))]
    assert not bad, (
        f"Spark scale-0 decimal→double no longer correctly rounded "
        f"on {len(bad)} values, e.g. {bad[:3]} — the similarity "
        "queries' direct cast must switch to the string route")

    con = duckdb.connect()
    probe = vals[::400] + vals[-4:]
    for v in probe:
        got = con.execute(
            f"SELECT CAST(CAST(CAST('{v}' AS DECIMAL(38,0)) AS VARCHAR)"
            " AS DOUBLE)").fetchone()[0]
        assert got == float(Decimal(v)), (v, got.hex())
    con.close()


# Interpolated-percentile probe values: pairs where
# lower + (upper-lower)*frac, (1-frac)*lower + frac*upper and
# (lower+upper)/2 all differ in the last ulps, plus ulp-adjacent and
# extreme-magnitude neighbors.
PERCENTILE_CASES = [
    [0.1, 0.3],
    [1e-300, 1.0000000000000002],
    [0.1234567890123456, 7.654321098765432],
    [-1.1, 2.3],
    [3.0000000000000004, 3.000000000000001],
    [1 / 3, 2 / 3, 1.0, 4 / 3],
    [1.0, 2.0, 4.0],
]


@pytest.mark.parametrize("p", [0.5, 0.45, 0.55])
def test_percentile_interpolation_formula_matches_duckdb(spark, p):
    """a4's exact median (and a12's quantile envelope) rely on Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` interpolating
    identically. Pinned on values where the candidate formulas
    (lerp-from-lower vs weighted-average) differ in the last ulps, so
    an engine switching formulation fails here instead of surfacing
    as an a4 hash mismatch at some future scale."""
    con = duckdb.connect()
    for vals in PERCENTILE_CASES:
        df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
        s = df.agg(F.expr(f"percentile(x, {p})")).collect()[0][0]
        arr = "[" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + "]"
        d = con.execute(
            f"SELECT quantile_cont(u, CAST({p} AS DOUBLE)) "
            f"FROM (SELECT unnest({arr}) u)").fetchone()[0]
        assert s == d, (vals, p, repr(s), repr(d))
    con.close()


def test_tx9_idf_values_clear_of_rounding_boundaries():
    """ln() is within 1 ulp across engines but not bit-identical, so
    tx9's idf = round(ln(N/df), 6) deterministically mismatches if a
    true idf value sits within ~an ulp of a 0.5e-6 rounding boundary.
    Canary over both fixture scales: every idf in the result must
    clear the boundary by a wide margin (Python's ln is within 1 ulp
    of both engines, so it is a valid proxy)."""
    import math

    import duckdb

    from conftest import SF_DIR, SF_DIR_MID

    for d in (SF_DIR, SF_DIR_MID):
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS "
                    f"SELECT * FROM '{d}/documents.parquet'")
        n_docs = con.execute("SELECT count(*) FROM documents"
                             ).fetchone()[0]
        dfs = [r[0] for r in con.execute(
            """
            SELECT count(DISTINCT doc_id) AS df
            FROM (SELECT doc_id,
                         unnest(string_split_regex(trim(text), '\\s+'))
                           AS tok
                  FROM documents)
            GROUP BY tok ORDER BY df DESC LIMIT 150
            """).fetchall()]
        con.close()
        for df_count in dfs:
            x = math.log(n_docs / df_count)
            frac = abs((x * 1e6) % 1 - 0.5)
            assert frac > 1e-6, (
                f"{d}: idf for df={df_count} (n={n_docs}) is "
                f"{x!r} — within {frac:.2e} of a 6-dp rounding "
                "boundary; engines may disagree deterministically. "
                "Coarsen the rounding or drop the value from the "
                "compared output.")


def test_f13_trig_constants_clear_of_rounding_boundaries():
    """f13 rounds sin/cos products at 12 dp; trig is not correctly
    rounded, so a constant within ~1 ulp of a boundary could split
    the engines. The angle lattice is FIXED, so this is decidable
    once: every one of the 1125 matrix entries must clear its
    boundary by >10 ulps (measured: min 90). Fails loudly if the
    lattice constants ever change into a boundary."""
    import math

    DEG2RAD = math.pi / 180.0
    worst = math.inf
    for oi in range(125):
        ea = -20.0 + 10.0 * (oi // 25)
        eb = -20.0 + 10.0 * ((oi // 5) % 5)
        ec = -20.0 + 10.0 * (oi % 5)
        sa, ca = math.sin(ea * DEG2RAD), math.cos(ea * DEG2RAD)
        sb, cb = math.sin(eb * DEG2RAD), math.cos(eb * DEG2RAD)
        sc, cc = math.sin(ec * DEG2RAD), math.cos(ec * DEG2RAD)
        for v in (ca * cb, -(sa * cb), sb,
                  sa * cc + ca * sb * sc, ca * cc - sa * sb * sc,
                  -(cb * sc), sa * sc - ca * sb * cc,
                  ca * sc + sa * sb * cc, cb * cc):
            x = abs(v) * 1e12
            if x == 0.0:
                continue
            dist_ulps = abs(x % 1.0 - 0.5) / math.ulp(x)
            worst = min(worst, dist_ulps)
    assert worst > 10, (
        f"an f13 rotation-matrix entry is {worst:.1f} ulps from a "
        "12-dp rounding boundary — cross-engine trig variation could "
        "split the oracle; coarsen the rounding")
