"""Streaming sessionization + stateful group assembly (SURVEY §2.10).

The reference replays a bounded photo stream and detects skipped poses
from capture-time gaps (``src/core/point3d_transformation.py:11-62``)
and assembles exactly-5 exposure groups for HDR merge
(``src/core/handlehdrgen.py:24-42``). Streaming-native equivalents:

- **Gap sessions** → ``session_window(ts, gap)``: a session closes
  when no event arrives within the gap; the same expression runs in
  batch and streaming, which is what the parity tests assert.
- **Exactly-5 groups** → ``applyInPandasWithState``: per-key counter
  state, emit when the bracket completes; incomplete groups are held
  (and ultimately dropped, like the reference skipping short groups).
- **Late data** → ``withWatermark``: sessions finalize only once the
  watermark passes, bounding state.

Scale notes: session state is partitioned by the session key; at
100 TB of events the watermark bounds state size, and the gap
threshold controls session fan-in. No collect, no global order —
unlike the batch W1-W4 chain, this form scales horizontally, which is
why it exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)


def gap_sessions(events: DataFrame, gap_seconds: float = 12.0,
                 ts_col: str = "ts", key_col: str | None = None,
                 watermark: str = "1 minute") -> DataFrame:
    """Session-window aggregation: one row per burst of activity
    separated by > gap. Works identically on batch and streaming
    DataFrames (stream-batch parity is tested).
    """
    gap = f"{gap_seconds} seconds"
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    # Streaming session windows need a grouping key; the reference's
    # single-camera stream gets a constant one (dropped from output).
    if key_col is None:
        df = df.withColumn("_stream_key", F.lit(0))
        group_key = "_stream_key"
    else:
        group_key = key_col
    keys = [F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(group_key)]
    out = df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    cols = ([F.col(key_col)] if key_col else []) + [
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events", "first_ts", "last_ts",
    ]
    return out.select(*cols)


GROUP_SCHEMA = StructType([
    StructField("pose_id", IntegerType()),
    StructField("n_exposures", IntegerType()),
    StructField("paths", StringType()),        # comma-joined, sorted
    StructField("first_ts", TimestampType()),
    StructField("last_ts", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("paths", StringType()),
    StructField("first_us", LongType()),
    StructField("last_us", LongType()),
])


def assemble_exposure_groups(catalog: DataFrame, expected: int = 5,
                             timeout_ms: int = 30_000) -> DataFrame:
    """Stateful exactly-N group assembler (applyInPandasWithState).

    Emits a pose's exposure group the moment its Nth file arrives;
    holds partial state otherwise and drops it on processing-time
    timeout — the streaming form of ``handlehdrgen.py:25-27`` (skip
    incomplete groups). Input needs (pose_id INT, path STRING,
    modificationTime TIMESTAMP).
    """
    assemble = _make_assembler(expected, timeout_ms)
    return (catalog
            .groupBy("pose_id")
            .applyInPandasWithState(
                assemble, GROUP_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.ProcessingTimeTimeout))


def _make_assembler(expected: int, timeout_ms: int):
    """The per-group stateful function behind
    :func:`assemble_exposure_groups`, exposed so the timeout path
    (state dropped, nothing emitted — the reference skipping an
    incomplete group) is unit-testable with a stub GroupState instead
    of a wall-clock processing-time trigger."""
    def assemble(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        (pose_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            paths_s, first_us, last_us = state.get
            paths = paths_s.split(",") if paths_s else []
        else:
            paths, first_us, last_us = [], None, None
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                paths.append(row["path"])
                us = int(pd.Timestamp(row["modificationTime"]).value // 1000)
                first_us = us if first_us is None else min(first_us, us)
                last_us = us if last_us is None else max(last_us, us)
        if len(paths) >= expected:
            state.remove()
            yield pd.DataFrame([{
                "pose_id": pose_id,
                "n_exposures": len(paths),
                "paths": ",".join(sorted(paths)),
                "first_ts": pd.Timestamp(first_us * 1000),
                "last_ts": pd.Timestamp(last_us * 1000),
            }])
        else:
            state.update((",".join(paths), first_us, last_us))
            state.setTimeoutDuration(timeout_ms)

    return assemble


def exposure_groups_batch(catalog: DataFrame, expected: int = 5,
                          ts_col: str = "modificationTime") -> DataFrame:
    """Batch restatement of :func:`assemble_exposure_groups` — the
    exactly-N complete-group rule of ``handlehdrgen.py:25-27``: group
    by pose, keep only groups with exactly ``expected`` members, emit
    the sorted path roster + time envelope. Same output columns as the
    streaming GROUP_SCHEMA, so stream↔batch parity is a direct frame
    compare (tests/test_streaming.py). One grouped shuffle on pose_id;
    incomplete groups are filtered after the partial agg, so nothing
    beyond (count, roster, envelope) ever shuffles."""
    return (catalog.groupBy("pose_id")
            .agg(F.count("*").cast("int").alias("n_exposures"),
                 F.array_join(F.sort_array(F.collect_list("path")), ",")
                  .alias("paths"),
                 F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts"))
            .filter(F.col("n_exposures") == expected))


def run_stream_to_memory(stream_df: DataFrame, query_name: str):
    """Drain a bounded stream into an in-memory table (availableNow),
    returning the started query. Test/driver helper."""
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
