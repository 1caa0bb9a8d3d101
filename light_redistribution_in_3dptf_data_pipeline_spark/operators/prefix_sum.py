"""Scalable global row numbering: per-bucket row_number + broadcast
prefix-sum offsets.

``Window.orderBy(...)`` with no partition funnels the whole table
through ONE task — the classic 100 TB killer. When a bucketing
expression exists that is monotone in the sort order (an hour/day
truncation of the leading timestamp, a high-order key prefix, ...),
the global row number decomposes exactly:

    rn(row) = offset(bucket) + local_rn(row within bucket)

where offset(bucket) = total rows in all earlier buckets. The offsets
table has one row per bucket (thousands at any scale), so its prefix
sum runs on a single tiny partition and broadcasts back; the per-bucket
row_number shuffles on the bucket key like any grouped window.

Used by w1/t1 (scale-out forms of the reference's global enumerations,
file_rename_sort.py:7-13 / point3d_transformation.py:24) and mirrored
inline by the flagship's w9 formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_row_number(df: DataFrame, bucket: Column,
                        order_cols: Sequence[str | Column],
                        out: str = "rn") -> DataFrame:
    """Append a 1-based global row number ``out`` ordered by
    ``order_cols``, computed without any global-order window.

    ``bucket`` MUST be monotone non-decreasing in the sort order
    (rows with equal sort keys land in the same bucket) — e.g.
    ``date_trunc('hour', ts)`` when ordering by (ts, id).

    ``order_cols`` MUST uniquely key rows within a bucket (append a
    unique id as the last column, the registry tie-break convention):
    with ties, ``row_number`` assigns an arbitrary — run-dependent —
    order among the tied rows.
    """
    tagged = df.withColumn("__bk", bucket)
    w_local = Window.partitionBy("__bk").orderBy(*order_cols)
    local = tagged.withColumn("__lrn", F.row_number().over(w_local))

    # One row per bucket: prefix-sum on a single tiny partition.
    w_bk = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (local.groupBy("__bk").agg(F.count("*").alias("__n"))
               .withColumn("__off",
                           F.coalesce(F.sum("__n").over(w_bk), F.lit(0)))
               .select("__bk", "__off"))

    return (local.join(F.broadcast(offsets), "__bk")
            .withColumn(out, (F.col("__lrn") + F.col("__off"))
                        .cast("bigint"))
            .drop("__bk", "__lrn", "__off"))


def bucketed_running_sum(df: DataFrame, bucket: Column, value: str | Column,
                         order_cols: Sequence[str | Column],
                         out: str = "running_sum") -> DataFrame:
    """Append an inclusive global running sum of ``value`` ordered by
    ``order_cols``, computed without any global-order window — the
    running-sum twin of :func:`bucketed_row_number`, with the same
    monotone-``bucket`` contract.

    Decomposition: running(row) = bucket_offset + local_running(row),
    where bucket_offset is the prefix sum of per-bucket value totals
    (one row per bucket, single tiny partition, broadcast back).
    Used by tx11's token-budget sequence packing: the global token
    cumsum over (doc_id, chunk_idx) order at 100 TB must not funnel
    every chunk through one task.

    Same contracts as :func:`bucketed_row_number`: ``bucket`` monotone
    in the sort order, AND ``order_cols`` unique within a bucket —
    with ties the ROWS-frame cumsum assigns nondeterministic per-row
    running sums among the tied rows (the per-bucket total stays
    right, the row attribution doesn't).

    Cost shape: the input is consumed TWICE — once under the window,
    once (column-pruned to bucket+value) by the offsets aggregate. If
    deriving ``value`` is expensive (tx11's per-chunk regex token
    count), the derivation runs twice; at bench scale a
    localCheckpoint of the input is a wash (measured r5: checkpoint
    write ≈ recompute saved), but on a 100 TB corpus where the value
    expression dominates scan cost, checkpoint/persist the input
    frame before calling this.
    """
    tagged = df.withColumn("__bk", bucket).withColumn(
        "__v", value if isinstance(value, Column) else F.col(value))
    w_local = (Window.partitionBy("__bk").orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, 0))
    local = tagged.withColumn("__lrs", F.sum("__v").over(w_local))

    w_bk = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (local.groupBy("__bk").agg(F.sum("__v").alias("__n"))
               .withColumn("__off",
                           F.coalesce(F.sum("__n").over(w_bk), F.lit(0)))
               .select("__bk", "__off"))

    return (local.join(F.broadcast(offsets), "__bk")
            .withColumn(out, (F.col("__lrs") + F.col("__off"))
                        .cast("bigint"))
            .drop("__bk", "__lrs", "__off", "__v"))
