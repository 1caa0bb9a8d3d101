"""Temporal join operators Spark lacks natively: as-of and range joins
(SURVEY custom-operator note; the J5 adjacent-group join is the
reference's degenerate case, ``src/core/point3d_transformation.py:29-43``).

**As-of join** (`asof_join`): for every left row, the latest right row
with ``right.ts <= left.ts`` per key. Implemented as the scalable
union-tag formulation: tag both sides, union, one per-key window with
``last(..., ignorenulls)`` over (ts, right-first), keep left rows. One
shuffle on the key — no range condition ever reaches a join operator,
so there is no nested-loop blowup at any scale. DuckDB has a native
ASOF JOIN, which makes a perfect oracle.

**Range join** (`binned_range_join`): equi-joinable *binning* of an
interval predicate ``l.v BETWEEN r.lo AND r.hi``: intervals explode to
the fixed-width bins they overlap, probes join on their bin, then the
exact predicate filters. Turns a nested-loop O(N·M) into a hash join
O(N + M·bins_per_interval) — the standard trick interval-heavy engines
apply, expressed in pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload: list[str], suffix: str = "_r") -> DataFrame:
    """Backward as-of join: left rows gain the most recent right-side
    ``payload`` columns at or before their ``ts`` (ties: right row at
    the same instant matches).

    Returns left columns + payload columns (suffixed). Left rows with
    no prior right row keep nulls — the LEFT OUTER as-of semantics.

    Deterministic under duplicate right timestamps: peers at the same
    (key, ts) are tie-broken by the payload columns themselves (the
    greatest payload tuple wins), so repeated runs pick the same match.
    Payload columns must therefore be of orderable types (no maps).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key), F.col(ts),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)])
    tagged_l = left.select(
        F.col(key), F.col(ts),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType)
           .alias(f"{c}{suffix}") for c in payload],
        *[F.col(c) for c in lcols if c not in (key, ts)])

    unioned = tagged_r.unionByName(tagged_l)
    # right rows sort before left rows at equal ts → "<=" semantics;
    # the payload columns break ties among right rows at the same
    # instant so `last` picks a well-defined (max-payload) match.
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts), F.desc("_is_right"),
                  *[F.asc_nulls_first(f"{c}{suffix}") for c in payload])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        "*", *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
               .alias(f"_filled_{c}") for c in payload])
    return (filled.filter(F.col("_is_right") == 0)
            .select(key, ts,
                    *[c for c in lcols if c not in (key, ts)],
                    *[F.col(f"_filled_{c}").alias(f"{c}{suffix}")
                      for c in payload]))


def binned_range_join(probes: DataFrame, intervals: DataFrame,
                      value_col: str, lo_col: str, hi_col: str,
                      bin_width: float) -> DataFrame:
    """Inner join on ``probes.value BETWEEN intervals.lo AND hi`` via
    bin-key equi-join. ``bin_width`` should be ≥ the typical interval
    width so each interval lands in O(1) bins."""
    bin_of = lambda c: F.floor(c / F.lit(bin_width)).cast("bigint")
    exploded = intervals.withColumn(
        "_bin", F.explode(F.sequence(bin_of(F.col(lo_col)),
                                     bin_of(F.col(hi_col)))))
    probed = probes.withColumn("_bin", bin_of(F.col(value_col)))
    return (probed.join(exploded, "_bin")
            .filter(F.col(value_col).between(F.col(lo_col),
                                             F.col(hi_col)))
            .drop("_bin"))
