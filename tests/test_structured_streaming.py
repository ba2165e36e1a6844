"""Structured Streaming twins: run the streaming operators over the real
testdata events via a file source + availableNow trigger and compare
against their batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.streaming.structured import (
    _make_session_fn,
    streaming_event_windows,
    streaming_sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_dir(events_batch, tmp_path_factory):
    # the file stream source requires a directory
    d = str(tmp_path_factory.mktemp("events_src") / "events")
    events_batch.write.parquet(d)
    return d


@pytest.fixture(scope="module")
def events_stream(spark, events_batch, events_dir):
    return spark.readStream.schema(events_batch.schema).parquet(events_dir)


def _run_to_memory(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"availableNow run {name!r} did not drain in 300s")
    return q


def test_windowed_agg_matches_batch(spark, events_batch, events_stream, tmp_path):
    """Append mode emits a window once the watermark passes its end; after
    an availableNow run the emitted rows must equal the batch rollup for
    every window closed under the final watermark (max event time - 2h).
    The still-open tail windows are exactly the difference."""
    _run_to_memory(
        streaming_event_windows(events_stream, watermark="2 hours"),
        "win_stream", tmp_path,
    )
    got = {
        (r.hour_unix, r.event_type, r.cnt, r.value_milli)
        for r in spark.sql("SELECT * FROM win_stream").collect()
    }
    max_ts = events_batch.agg(
        F.max(F.col("ts").cast("timestamp").cast("long"))
    ).collect()[0][0]
    watermark_cutoff = max_ts - 2 * 3600
    rollup = (
        events_batch.groupBy(
            F.unix_timestamp(F.window("ts", "1 hour").getField("start"))
            .alias("hour_unix"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("value_milli"),
        )
        .collect()
    )
    want_closed = {
        (r.hour_unix, r.event_type, r.cnt, r.value_milli)
        for r in rollup
        if r.hour_unix + 3600 <= watermark_cutoff
    }
    want_all = {
        (r.hour_unix, r.event_type, r.cnt, r.value_milli) for r in rollup
    }
    assert want_closed <= got <= want_all and got
    # nothing beyond the boundary ambiguity is missing
    assert len(want_all) - len(got) <= len(want_all) - len(want_closed)


def test_late_events_dropped_by_watermark(spark, events_batch, tmp_path):
    """A record older than watermark behind the max event time must not
    reopen its (already closed) window: stream the events in two files —
    current data first, then a straggler 10 hours late."""
    base = events_batch.orderBy("ts")
    last_ts = base.agg(F.max("ts")).collect()[0][0]
    src = str(tmp_path / "late_src")
    on_time = base.where(F.col("ts") >= F.lit(last_ts) - F.expr("INTERVAL 12 HOURS"))
    on_time.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "late_out")

    def run_once():
        # parquet sink: checkpoint-resumable (memory sink is not), output
        # accumulates across runs
        stream = spark.readStream.schema(events_batch.schema).parquet(src)
        q = (
            streaming_event_windows(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "late_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def emitted():
        df = spark.read.parquet(out)
        return df.agg(F.coalesce(F.sum("cnt"), F.lit(0))).collect()[0][0]

    # run 1: on-time data only — advances the checkpointed watermark to
    # max_ts - 1h and emits every window closed under it
    run_once()
    got1 = emitted()
    max_epoch = on_time.agg(
        F.max(F.col("ts").cast("timestamp").cast("long"))
    ).collect()[0][0]
    cutoff = max_epoch - 3600
    closed_on_time = on_time.where(
        (F.floor(F.col("ts").cast("timestamp").cast("long") / 3600) + 1) * 3600
        <= cutoff
    ).count()
    assert closed_on_time <= got1 <= on_time.count() and got1 > 0

    # run 2 (same checkpoint): a straggler 10 hours below the persisted
    # watermark must be DISCARDED — its window already finalized — so the
    # cumulative output must not grow
    late = (
        on_time.orderBy("ts").limit(1)
        .withColumn("ts", F.col("ts") - F.expr("INTERVAL 10 HOURS"))
        .withColumn("event_id", F.lit(999999))
    )
    late.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = emitted()
    assert got2 == got1, f"late event leaked: {got1} -> {got2} emitted"


def test_stateful_sessionize_closed_sessions_match_batch(
    spark, events_batch, events_stream, tmp_path
):
    """applyInPandasWithState emits closed sessions; with the whole table
    in one availableNow run, that is every session except each user's
    final (still-open) one — compare against the batch window plan.
    flush_timeout=False so the availableNow run can drain: with pending
    processing-time timeouts Spark schedules no-data batches until every
    timeout has fired (gap_s of wall clock — this test used to "pass" by
    reading the sink after awaitTermination() expired, leaving the query
    running for the rest of the session)."""
    _run_to_memory(
        streaming_sessionize(events_stream, 1800, flush_timeout=False),
        "sess_stream", tmp_path,
    )
    got = {
        (r.user_id, r.session_id, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    batch = (
        events_batch.withColumn(
            "_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    closed_batch = batch.join(last, ["user_id", "session_id"], "left_anti")
    want = {
        (r.user_id, r.session_id, r.n_events) for r in closed_batch.collect()
    }
    assert got == want and got


class _FakeGroupState:
    """Drives _make_session_fn's state contract without a streaming query
    (the availableNow e2e test above never reaches the processing-time
    timeout branch)."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = tuple(value)

    def remove(self):
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _feed(fn, state, ts_list):
    import pandas as pd

    batches = iter([pd.DataFrame({"ts": pd.to_datetime(ts_list, unit="s")})])
    return [
        tuple(t) for out in fn((7,), batches, state)
        for t in out.itertuples(index=False)
    ]


def _timeout(fn, state):
    state.hasTimedOut = True
    rows = [
        tuple(t) for out in fn((7,), iter([]), state)
        for t in out.itertuples(index=False)
    ]
    state.hasTimedOut = False
    return rows


def test_sessionize_timeout_flush_preserves_ordinal():
    """A processing-time timeout flush must close the open session WITHOUT
    resetting the per-user session ordinal: when the user reappears, the
    next session continues the numbering (no duplicate (user, session_id)
    keys in append-mode output)."""
    fn = _make_session_fn(1800)
    state = _FakeGroupState()

    # two event-time sessions in one batch: session 1 closes, session 2 open
    closed = _feed(fn, state, [1000, 1100, 10000])
    assert closed == [(7, 1, 2, 1000, 1100)]
    assert state.get[0] == 2  # next_session

    # inactivity timeout: flushes open session 2, ordinal survives
    flushed = _timeout(fn, state)
    assert flushed == [(7, 2, 1, 10000, 10000)]
    assert state.exists and state.get == (3, None, 0, 0)
    assert state.timeout_set == 1800 * 1000

    # the user reappears: new session numbered 3, not 1
    closed2 = _feed(fn, state, [20000, 20010, 30000])
    assert closed2 == [(7, 3, 2, 20000, 20010)]

    # flush session 4, then a second timeout on the empty tombstone drops
    # the state entirely
    flushed2 = _timeout(fn, state)
    assert flushed2 == [(7, 4, 1, 30000, 30000)]
    assert _timeout(fn, state) == []
    assert not state.exists


def test_sessionize_sorts_across_arrow_chunks():
    """A group larger than one Arrow chunk arrives as multiple pdfs in
    arbitrary time order; the state fn must sort the WHOLE batch before
    running the gap machine (chunk-local sorting would see negative gaps
    and merge real session boundaries)."""
    import pandas as pd

    fn = _make_session_fn(1800)
    state = _FakeGroupState()
    # chunk 2 holds EARLIER events than chunk 1; correct global order is
    # [100, 200, 5000, 10000] -> session 1 = {100, 200}, session 2 =
    # {5000, 10000}? gap(200->5000)=4800>1800 closes s1; gap(5000->10000)
    # =5000>1800 closes s2; session 3 open at 10000
    batches = iter(
        [
            pd.DataFrame({"ts": pd.to_datetime([5000, 10000], unit="s")}),
            pd.DataFrame({"ts": pd.to_datetime([100, 200], unit="s")}),
        ]
    )
    closed = [
        tuple(t) for out in fn((7,), batches, state)
        for t in out.itertuples(index=False)
    ]
    assert closed == [(7, 1, 2, 100, 200), (7, 2, 1, 5000, 5000)]
    assert state.get == (3, 10000, 1, 10000)
