"""Property tests for the fixed-point numeric kernels behind the
similarity queries: the int64 hi/lo dot fold (_fixed_dot) and the
int8 quantization invariants (sim5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

NANO_BOUND = 2**31 - 1          # per-vector nano-unit component bound
CSUM_BOUND = (1 << 45) - 1      # documented bound for split=2^20


def _spark_fixed_dot(spark, xs, ys, split):
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.similarity import (
        _fixed_dot,
    )

    df = spark.createDataFrame([(xs, ys)], "x array<long>, y array<long>")
    row = df.select(
        _fixed_dot("x", "y", split=split).cast("string").alias("d")
    ).collect()[0]
    return int(row["d"])


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-NANO_BOUND, max_value=NANO_BOUND),
    st.integers(min_value=-NANO_BOUND, max_value=NANO_BOUND)),
    min_size=1, max_size=64))
def test_fixed_dot_exact_vs_bignum(spark, pairs):
    """split=2^10 domain: both operands are nano-unit components."""
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    expected = sum(x * y for x, y in pairs)  # Python bignum, exact
    assert _spark_fixed_dot(spark, xs, ys, 1 << 10) == expected


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-NANO_BOUND, max_value=NANO_BOUND),
    st.integers(min_value=-CSUM_BOUND, max_value=CSUM_BOUND)),
    min_size=1, max_size=64))
def test_fixed_dot_exact_wide_y(spark, pairs):
    """split=2^20 domain: y up to 2^45 (centroid sums)."""
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    expected = sum(x * y for x, y in pairs)
    assert _spark_fixed_dot(spark, xs, ys, 1 << 20) == expected


def test_quantize_invariants(spark):
    """sim5 semantics on a hand-built table: codes within ±127,
    reconstruction error per component ≤ scale/2 (half-up rounding),
    zero vector quantizes to zeros with zero error."""
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.similarity import (
        QUANT_LEVELS,
    )
    from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES
    import math
    import os
    import tempfile

    vecs = [
        (0, [0.5, -0.25, 0.125, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [-1.0, 1.0, 0.3333333, -0.0000001]),
        (3, [1e-9, -1e-9, 5e-10, 0.0]),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    rows = {r["vec_id"]: r for r in
            QUERIES["sim5_quantize_int8"].builder(spark, d).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for vid, emb in vecs:
        r = rows[vid]
        m = r["max_abs_nano"]
        codes = [int(t) for t in r["q_codes"].split(",")]
        assert all(abs(q) <= QUANT_LEVELS for q in codes)
        if m == 0:
            assert codes == [0] * len(emb)
            assert r["mean_abs_err"] == 0.0
            continue
        # exact per-component check against Python integer half-up
        # (mirror Spark: float32 storage -> double -> decimal(18,9)
        # HALF_UP -> nano units)
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        for x, q in zip(emb, codes):
            xv = float(np.float32(x))
            ci = int(Decimal(xv).quantize(Decimal("1.000000000"),
                                          rounding=ROUND_HALF_UP)
                     * (10 ** 9))
            expected_q = math.floor(
                (2 * QUANT_LEVELS * ci + m) / (2 * m))
            assert q == expected_q
            # |127*ci - q*m| <= m/2  (half-up rounding bound)
            assert abs(QUANT_LEVELS * ci - q * m) <= m / 2
        assert r["mean_abs_err"] <= m / (2 * QUANT_LEVELS * 1e9) + 1e-15
