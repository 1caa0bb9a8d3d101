"""Stream-batch parity tests (SURVEY §5.4): session_window detector and
the exactly-5 stateful group assembler, driven through real streaming
file sources with availableNow triggers."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.streaming import sessionization as ss

EVENT_SCHEMA = "event_id INT, ts TIMESTAMP"


@pytest.fixture(scope="module")
def event_rows():
    """Bursts of 5 events 2 s apart, separated by 20 s gaps; one burst
    of 3 (simulating the robot skipping mid-pose)."""
    rows, eid, t = [], 0, 1_700_000_000
    for burst, n in enumerate([5, 5, 3, 5]):
        for _ in range(n):
            rows.append((eid, t))
            eid += 1
            t += 2
        t += 20
    return rows


SENTINEL_EPOCH = 1_700_000_000 + 3_600


@pytest.fixture(scope="module")
def event_parquet(spark, tmp_path_factory, event_rows):
    d = tmp_path_factory.mktemp("stream_src")
    df = spark.createDataFrame(
        [(i, t) for i, t in event_rows], "event_id INT, epoch BIGINT"
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"))
    df.write.mode("overwrite").parquet(str(d / "events"))
    # Sentinel end-of-replay event far past every real session: in
    # append mode a session only emits once the watermark (max event
    # time - delay) passes its end, so a bounded replay needs one
    # trailing event to finalize the tail sessions.
    spark.createDataFrame(
        [(999, SENTINEL_EPOCH)], "event_id INT, epoch BIGINT"
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts")) \
     .write.mode("append").parquet(str(d / "events"))
    return str(d / "events")


def _real_sessions(rows):
    """Drop the sentinel's own 1-event session (it is never finalized
    in streaming and is not part of the replay)."""
    import datetime
    cutoff = datetime.datetime.utcfromtimestamp(SENTINEL_EPOCH - 60)
    return [r for r in rows if r[0] < cutoff]


def test_session_window_stream_batch_parity(spark, event_parquet):
    batch = spark.read.parquet(event_parquet)
    batch_out = _real_sessions(sorted(map(tuple, ss.gap_sessions(
        batch, gap_seconds=12.0).collect())))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .parquet(event_parquet))
    q = ss.run_stream_to_memory(
        ss.gap_sessions(stream, gap_seconds=12.0), "sessions_t")
    q.awaitTermination(60)
    stream_out = _real_sessions(sorted(map(tuple, spark.sql(
        "SELECT * FROM sessions_t").collect())))

    assert len(batch_out) == 4
    assert [r[2] for r in batch_out] == [5, 5, 3, 5]  # n_events per burst
    assert stream_out == batch_out


def test_session_window_matches_flagship_groups(spark, event_parquet):
    """With bursts shorter than the gap, session_window must find the
    same capture groups as the reference's count-based chunking when
    all groups are complete — and diverge exactly on the short one."""
    batch = spark.read.parquet(event_parquet)
    sessions = _real_sessions(sorted(
        map(tuple, ss.gap_sessions(batch, gap_seconds=12.0).collect())))
    short = [s for s in sessions if s[2] < 5]
    assert len(short) == 1  # the 3-event burst = the missing pose signal
    assert short[0][2] == 3


@pytest.fixture(scope="module")
def catalog_parquet(spark, tmp_path_factory):
    """File-catalog rows arriving in two micro-batches: pose 0 complete
    in batch 1; pose 1 split across batches; pose 2 never completes."""
    d = tmp_path_factory.mktemp("cat_src")
    t0 = 1_700_000_000
    b1 = [(0, f"/img/0_{i}.JPG", t0 + 2 * i) for i in range(5)] + \
         [(1, f"/img/1_{i}.JPG", t0 + 20 + 2 * i) for i in range(3)] + \
         [(2, f"/img/2_0.JPG", t0 + 40)]
    b2 = [(1, f"/img/1_{i}.JPG", t0 + 20 + 2 * i) for i in range(3, 5)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            rows, "pose_id INT, path STRING, epoch BIGINT"
        ).select("pose_id", "path",
                 F.timestamp_seconds("epoch").alias("modificationTime")) \
         .write.mode("overwrite").parquet(str(d / name))
    return str(d)


def test_stateful_group_assembler(spark, catalog_parquet):
    """applyInPandasWithState emits exactly the complete groups, with
    cross-batch state for the split pose."""
    stream = (spark.readStream
              .schema("pose_id INT, path STRING,"
                      " modificationTime TIMESTAMP")
              .option("maxFilesPerTrigger", "1")
              .parquet(catalog_parquet + "/*"))
    q = ss.run_stream_to_memory(
        ss.assemble_exposure_groups(stream), "groups_t")
    q.awaitTermination(90)
    time.sleep(0.5)
    rows = {r.pose_id: r for r in spark.sql(
        "SELECT * FROM groups_t").collect()}
    assert set(rows) == {0, 1}          # pose 2 incomplete → never emitted
    assert rows[0].n_exposures == 5
    assert rows[1].n_exposures == 5     # assembled across micro-batches
    assert rows[0].paths == ",".join(f"/img/0_{i}.JPG" for i in range(5))


def test_exposure_groups_stream_batch_parity(spark, catalog_parquet):
    """The batch exactly-N rule (exposure_groups_batch, the w11 query
    core) and the stateful streaming assembler agree row-for-row on
    the same replayed catalog: complete groups identical, the
    incomplete pose dropped by both."""
    batch = spark.read.parquet(catalog_parquet + "/*")
    batch_out = sorted(map(tuple,
                           ss.exposure_groups_batch(batch).collect()))

    stream = (spark.readStream
              .schema("pose_id INT, path STRING,"
                      " modificationTime TIMESTAMP")
              .option("maxFilesPerTrigger", "1")
              .parquet(catalog_parquet + "/*"))
    q = ss.run_stream_to_memory(
        ss.assemble_exposure_groups(stream), "groups_parity_t")
    q.awaitTermination(90)
    time.sleep(0.5)
    stream_out = sorted(map(tuple, spark.sql(
        "SELECT pose_id, n_exposures, paths, first_ts, last_ts"
        " FROM groups_parity_t").collect()))

    assert [r[0] for r in batch_out] == [0, 1]   # pose 2 incomplete
    assert stream_out == batch_out


def test_w11_query_matches_streaming_assembler(spark, tmp_path):
    """The registered w11 batch query ≡ replaying its own derived
    catalog through the applyInPandasWithState assembler — the
    stream↔batch parity of the reference's exactly-5 grouping rule
    end-to-end (enumeration → rename → assembly), plus an injected
    incomplete pose that both sides must drop."""
    from conftest import SF_DIR
    from light_redistribution_in_3dptf_data_pipeline_spark.catalog import (
        load_table)
    from light_redistribution_in_3dptf_data_pipeline_spark.queries import (
        QUERIES)
    from light_redistribution_in_3dptf_data_pipeline_spark.queries.windows import (
        exposure_catalog)

    batch_out = sorted(map(tuple, QUERIES["w11_exposure_groups_batch"]
                           .builder(spark, SF_DIR).collect()))

    events = load_table(spark, SF_DIR, "events")
    catalog = exposure_catalog(events).select(
        F.col("pose_id").cast("int").alias("pose_id"), "path",
        F.col("ts").alias("modificationTime"))
    # Inject an incomplete group (3 of 5 exposures) past the real ids.
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    incomplete = spark.createDataFrame(
        [(10_000_000, f"10000000_{i}.JPG", t0) for i in range(3)],
        "pose_id INT, path STRING, modificationTime TIMESTAMP")
    d = str(tmp_path / "w11_catalog")
    catalog.unionByName(incomplete).write.mode("overwrite").parquet(d)

    stream = (spark.readStream
              .schema("pose_id INT, path STRING,"
                      " modificationTime TIMESTAMP")
              .parquet(d))
    q = ss.run_stream_to_memory(
        ss.assemble_exposure_groups(stream), "w11_stream_t")
    q.awaitTermination(120)
    time.sleep(0.5)
    stream_out = sorted(map(tuple, spark.sql(
        "SELECT CAST(pose_id AS BIGINT), CAST(n_exposures AS BIGINT),"
        " paths, first_ts, last_ts FROM w11_stream_t").collect()))

    assert len(batch_out) > 0
    assert stream_out == batch_out   # incomplete pose absent from both


def test_assembler_timeout_drops_incomplete_group():
    """ProcessingTimeTimeout path: a timed-out partial group is
    removed without emitting — handlehdrgen.py:25-27's skip rule under
    the streaming state machine (unit-level, stub GroupState)."""
    from light_redistribution_in_3dptf_data_pipeline_spark.streaming.sessionization import (
        _make_assembler)

    class StubState:
        def __init__(self):
            self.hasTimedOut = True
            self.exists = True
            self.get = ("a.JPG,b.JPG", 1, 2)
            self.removed = False

        def remove(self):
            self.removed = True

        def update(self, v):          # pragma: no cover - must not run
            raise AssertionError("timed-out state must not update")

        def setTimeoutDuration(self, ms):  # pragma: no cover
            raise AssertionError("timed-out state must not re-arm")

    assemble = _make_assembler(expected=5, timeout_ms=1000)
    state = StubState()
    emitted = list(assemble((7,), iter([]), state))
    assert emitted == []
    assert state.removed


def test_tumbling_window_stream_batch_parity(spark, event_parquet):
    """The w7 tumbling groupBy runs unchanged under readStream: same
    windows, same counts (sentinel's unfinalized window excluded)."""
    def tumbling(df):
        return (df.groupBy(F.window("ts", "30 seconds").alias("w"))
                .agg(F.count("*").cast("bigint").alias("n"))
                .select(F.col("w.start").alias("ws"), "n"))

    batch = spark.read.parquet(event_parquet)
    batch_out = _real_sessions(sorted(
        map(tuple, tumbling(batch).collect())))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .parquet(event_parquet).withWatermark("ts", "1 minute"))
    q = ss.run_stream_to_memory(tumbling(stream), "tumbling_t")
    q.awaitTermination(60)
    stream_out = _real_sessions(sorted(map(tuple, spark.sql(
        "SELECT * FROM tumbling_t").collect())))

    assert stream_out == batch_out
    assert sum(n for _, n in batch_out) == 18  # all replayed events


KEYED_SCHEMA = "event_id INT, user_id INT, ts TIMESTAMP"


@pytest.fixture(scope="module")
def keyed_event_parquet(spark, tmp_path_factory):
    """Two interleaved users with different session rhythms — the
    registered w10_session_window_batch shape (per-key sessions)."""
    rows, eid, t = [], 0, 1_700_000_000
    for burst in range(4):
        for i in range(4):
            rows.append((eid, 1, t + i * 2))          # user 1: tight burst
            eid += 1
        rows.append((eid, 2, t + 5))                  # user 2: singletons
        eid += 1
        t += 40
    d = tmp_path_factory.mktemp("keyed_stream_src")
    df = spark.createDataFrame(
        rows, "event_id INT, user_id INT, epoch BIGINT"
    ).select("event_id", "user_id",
             F.timestamp_seconds("epoch").alias("ts"))
    df.write.mode("overwrite").parquet(str(d / "events"))
    spark.createDataFrame(
        [(999, 1, SENTINEL_EPOCH), (998, 2, SENTINEL_EPOCH)],
        "event_id INT, user_id INT, epoch BIGINT"
    ).select("event_id", "user_id",
             F.timestamp_seconds("epoch").alias("ts")) \
     .write.mode("append").parquet(str(d / "events"))
    return str(d / "events")


def test_keyed_session_window_stream_batch_parity(spark,
                                                  keyed_event_parquet):
    """Per-key gap sessions (the w10 query shape) emit identical rows
    batch and streamed: keys session independently, and a key's
    sessions never merge across another key's events."""
    def clean(rows):
        import datetime
        cutoff = datetime.datetime.utcfromtimestamp(SENTINEL_EPOCH - 60)
        return [r for r in rows if r[1] < cutoff]

    batch = spark.read.parquet(keyed_event_parquet)
    batch_out = clean(sorted(map(tuple, ss.gap_sessions(
        batch, gap_seconds=12.0, key_col="user_id").collect())))

    stream = (spark.readStream.schema(KEYED_SCHEMA)
              .parquet(keyed_event_parquet))
    q = ss.run_stream_to_memory(
        ss.gap_sessions(stream, gap_seconds=12.0, key_col="user_id"),
        "keyed_sessions_t")
    q.awaitTermination(60)
    stream_out = clean(sorted(map(tuple, spark.sql(
        "SELECT * FROM keyed_sessions_t").collect())))

    # user 1: four 4-event sessions; user 2: four 1-event sessions
    per_user = {}
    for r in batch_out:
        per_user.setdefault(r[0], []).append(r[3])
    assert per_user == {1: [4, 4, 4, 4], 2: [1, 1, 1, 1]}
    assert stream_out == batch_out
