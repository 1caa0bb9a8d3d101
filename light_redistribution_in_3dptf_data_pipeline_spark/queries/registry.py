"""Registry of oracle-checked queries.

Conventions that make Spark↔DuckDB value-hash parity *exact* (not
approximate):

1. **Decimal-exact aggregation.** Sums/averages over double columns are
   order-dependent in IEEE754; Spark's partial aggregation and DuckDB's
   scan order differ. We cast measures to DECIMAL first (the synthetic
   data is 2-decimal money), aggregate exactly, and convert to DOUBLE
   only for the final output — both engines then produce bit-identical
   doubles.
2. **Deterministic tie-breaks.** Every window ORDER BY / top-k carries a
   unique key as the last sort column.
3. **Explicit output casts.** Final schemas use only BIGINT / DOUBLE /
   STRING / TIMESTAMP / BOOLEAN so the two engines' result dtypes line
   up (DuckDB's DECIMAL sum widens differently from Spark's).
4. **Matching aliases.** Every computed column is aliased identically in
   the Spark builder and the oracle SQL (driver sorts columns by name
   before hashing).
5. **Quantize with shared IEEE ops, not decimal ``round()``, when a
   compared double is rounding-boundary-prone.** Spark's ``round``
   rounds the shortest-decimal string repr (BigDecimal.valueOf) while
   DuckDB rounds ``x * 10^d`` — they can disagree within one ulp of a
   half-way boundary. On bit-identical inputs the per-value risk is
   ~1e-7 and the existing cosine/idf rounds rely on that; for NEW
   aggregated-then-compared doubles prefer the exact pattern:
   ``floor(x * 1e9)`` into a BIGINT (the ``rms_q`` mm-oracle pattern)
   — pure IEEE multiply+floor, identical in any engine — or keep the
   value an exact integer/decimal until the final cast.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (builder, oracle) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
