"""Structured Streaming operators — the streaming twins of the batch
event-analytics queries (``__spark_entry__.q_event_windows`` /
``q_sessionize``), per the build brief: ``readStream`` →
transformations → ``writeStream``, watermarks + windowed aggregations
for late data, and ``applyInPandasWithState`` for custom stateful
operators.

The crawl engine itself maps streaming→batch deliberately (each epoch is
one batch over snapshot tables — see epochs.py); these operators cover
the *continuous* ingestion side a production pipeline runs next to the
crawl: event streams landing in object storage, windowed rollups with
bounded lateness, and gap-based sessionization with explicit state.

All functions take a (possibly streaming) DataFrame and return a
DataFrame — source/sink choice stays with the caller, so the same plan
runs under ``readStream``+``availableNow`` in tests and a continuous
trigger in production.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

__all__ = [
    "streaming_event_windows",
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_trending_words",
    "SESSION_OUTPUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
]


def streaming_event_windows(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows with a lateness bound.

    The watermark lets state for a window be dropped once event time has
    advanced past window_end + watermark: events later than that are
    discarded instead of reopening the window (the documented late-data
    contract). Output matches the batch twin q_event_windows on closed
    windows: (hour_unix, event_type, cnt, value_milli)."""
    # event time must be TIMESTAMP (tz-aware); testdata lands as NTZ and
    # the cast reads the session timezone — pin UTC like the batch twins
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("value_milli"),
        )
        .select(
            F.unix_timestamp(F.col("w").getField("start")).alias("hour_unix"),
            "event_type", "cnt", "value_milli",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    key_col: str = "fingerprint",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous-ingestion exact dedup: keep the first document seen per
    ``key_col`` (e.g. the md5 token-stream fingerprint from
    textstats.fingerprint_col), with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` is the declarative form: the seen-key
    state for a key is dropped once event time passes its timestamp +
    watermark, so state stays O(keys per watermark window) instead of
    O(all keys ever) — the streaming complement of the batch
    ``exact_dup_groups`` query, with the same first-wins semantics the
    crawl engine's seen-set uses. A duplicate arriving later than the
    watermark re-admits the key; that is the documented trade-off of
    bounded state (the batch dedup pass downstream catches stragglers)."""
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def streaming_trending_words(
    docs: DataFrame,
    tokens_col: str = "tokens",
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window word counts over an ingest stream — the streaming
    twin of the batch top-words report: (window_unix, word, cnt) per
    closed window, late data bounded by the watermark.

    Stateless explode feeds a windowed hash aggregation; per-window state
    is O(distinct words per window) and is dropped at the watermark.
    Ranking/limit is left to the consumer (a global top-k inside the
    stream would force a single-partition sort per trigger; the idiomatic
    plan is per-window counts out, rank in the serving layer or a
    foreachBatch)."""
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        docs.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode(tokens_col).alias("word"))
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), "word")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w").getField("start")).alias("window_unix"),
            "word",
            "cnt",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("n_events", LongType()),
    StructField("start_unix", LongType()),
    StructField("end_unix", LongType()),
])

# (next session ordinal, last event epoch-seconds, open-session event
# count, open-session start) — the entire per-user state, explicit and
# replayable from a checkpoint
SESSION_STATE_SCHEMA = StructType([
    StructField("next_session", LongType()),
    StructField("last_ts", LongType()),
    StructField("open_count", LongType()),
    StructField("open_start", LongType()),
])


def _make_session_fn(gap_s: int, use_timeout: bool = True):
    def fn(
        key: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # inactivity flush: the open session closes with what it has.
            # The session ordinal must SURVIVE the flush — state.remove()
            # would reset next_session to 1 when the user reappears,
            # emitting a duplicate (user_id, session_id) key in append-mode
            # output and breaking the batch-twin ordinal contract. Keep a
            # tombstone state carrying only the advanced ordinal; the empty
            # open session (open_count=0) emits nothing on a later timeout,
            # and the refreshed timeout bounds how long the tombstone lives.
            next_session, last_ts, open_count, open_start = state.get
            if open_count:
                state.update((next_session + 1, None, 0, 0))
                if use_timeout:
                    state.setTimeoutDuration(gap_s * 1000)
                yield pd.DataFrame(
                    [(user_id, next_session, open_count, open_start, last_ts)],
                    columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
                )
            else:
                # ordinal-only tombstone timing out a second time: nothing
                # left to protect, drop the state for real
                state.remove()
            return

        if state.exists:
            next_session, last_ts, open_count, open_start = state.get
        else:
            next_session, last_ts, open_count, open_start = 1, None, 0, 0

        closed = []
        # gather the group's WHOLE micro-batch before sorting: Spark only
        # groups by key, it never orders by time, and a group larger than
        # one Arrow chunk (maxRecordsPerBatch) would otherwise interleave
        # chunk-sorted runs — negative gaps, merged sessions
        chunks = [
            (pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000)
            .to_numpy()
            for pdf in batches
        ]
        if chunks:
            ts = np.concatenate(chunks)
            ts.sort()
            for t in ts:
                t = int(t)
                if last_ts is not None and t - last_ts > gap_s:
                    closed.append(
                        (user_id, next_session, open_count, open_start, last_ts)
                    )
                    next_session += 1
                    open_count = 0
                if open_count == 0:
                    open_start = t
                open_count += 1
                last_ts = t
        state.update((next_session, last_ts, open_count, open_start))
        if use_timeout:
            # the open session flushes after gap_s of processing-time silence
            state.setTimeoutDuration(gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
            )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_s: int = 1800, flush_timeout: bool = True
) -> DataFrame:
    """Gap-based sessionization as an explicit stateful operator
    (``applyInPandasWithState``): per-user state carries the open session
    only; a session closes when a gap > gap_s appears in event time, or
    — with ``flush_timeout`` (the production default) — when the user
    goes silent for gap_s of processing time (state timeout). Emits one
    row per *closed* session — the streaming complement of the batch
    window-plan sessionize (same session ordinals for closed sessions).

    ``flush_timeout=False`` disables the inactivity flush: open sessions
    stay in state until more events arrive. Use it for bounded replays
    (availableNow) — with pending processing-time timeouts an
    availableNow trigger cannot drain: Spark keeps scheduling no-data
    batches until every registered timeout has fired (gap_s of wall
    clock), so a drain-and-stop run would block for the full gap."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_s, use_timeout=flush_timeout),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if flush_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
