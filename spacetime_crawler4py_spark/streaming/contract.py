"""Driver-contract wrappers for the Structured Streaming operators.

Each function here runs one of the streaming operators from
``streaming/structured.py`` end-to-end — file source → availableNow
trigger → sink — over the driver's testdata tables, shaped so the final
emitted output is *deterministic* and therefore SQL-oracle-checkable
(rows + schema + value hash vs DuckDB), not just rows-only.

What makes the outputs exact:

* **Append-mode emission is a closed-form predicate.** An availableNow
  run ends with a final batch that commits the terminal watermark
  (max event time − delay, at millisecond precision) and emits every
  window/session closed under it. Windowed aggs emit exactly the
  windows with ``window_end <= watermark`` (boundary equality verified
  empirically against Spark 4.1: a window whose end equals the final
  watermark IS emitted), so the oracle is the batch rollup filtered by
  that inequality.
* **Batch boundaries are pinned.** Inputs are written as one parquet
  file per logical arrival; multi-arrival scenarios (the dedup
  eviction/re-admission query) run one checkpointed availableNow pass
  per arrival, so the watermark each batch sees is a function of the
  data alone, never of file-listing order or trigger timing.
* **Only deterministic columns are emitted.** ``dropDuplicatesWithinWatermark``
  keeps an arbitrary first-in-batch row per key, so the dedup contract
  projects the key column only; sessionization emits per-session
  aggregates that are invariant to intra-batch row order (the state fn
  sorts event times within each Arrow chunk, and at contract scale each
  user group arrives as a single chunk).

The streaming semantics themselves (late-data drop, state timeout,
re-admission across checkpointed runs) are property-tested in
``tests/test_structured_streaming.py``; these wrappers make the same
operators first-class contract queries.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.streaming.structured import (
    streaming_dedup,
    streaming_event_windows,
    streaming_sessionize,
    streaming_trending_words,
)

__all__ = [
    "q_streaming_event_windows",
    "q_streaming_sessionize",
    "q_streaming_dedup",
    "q_streaming_trending_words",
]

# epoch seconds of 2024-01-01T00:00:00Z — the synthetic ingest clock's
# origin for tables that carry no event time of their own (documents)
_T0 = 1_704_067_200


def _workdir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"sgc_stream_{tag}_")


def _run_available_now(
    sdf: DataFrame,
    *,
    fmt: str,
    ck_dir: str,
    name: str | None = None,
    path: str | None = None,
    timeout_s: int = 600,
) -> None:
    w = (
        sdf.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
    )
    if name is not None:
        w = w.queryName(name)
    if path is not None:
        w = w.option("path", path)
    q = w.start()
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"streaming contract query did not drain in {timeout_s}s")


def q_streaming_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup over the events table as a
    single availableNow run. Emits exactly the hourly windows closed
    under the terminal watermark (max event time − 2h); the oracle is
    the batch rollup with the same ``window_end <= watermark`` filter."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = _workdir("ew")
    src = os.path.join(tmp, "src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_event_windows(stream, window="1 hour", watermark="2 hours")
    name = f"sgc_ew_{uuid.uuid4().hex[:8]}"
    _run_available_now(out, fmt="memory", ck_dir=os.path.join(tmp, "ck"), name=name)
    return spark.table(name).orderBy("hour_unix", "event_type")


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based stateful sessionization (``applyInPandasWithState``)
    over the events table: one availableNow run emits every *closed*
    session — all sessions except each user's final (still-open) one —
    with the same ordinals as the batch window plan."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = _workdir("sess")
    src = os.path.join(tmp, "src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    # flush_timeout=False: pending processing-time timeouts would keep
    # the availableNow trigger scheduling no-data batches for gap_s of
    # wall clock before it can drain (see streaming_sessionize)
    out = streaming_sessionize(stream, 1800, flush_timeout=False)
    name = f"sgc_sess_{uuid.uuid4().hex[:8]}"
    _run_available_now(out, fmt="memory", ck_dir=os.path.join(tmp, "ck"), name=name)
    return spark.table(name).orderBy("user_id", "session_id")


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion exact dedup with *real* watermark state
    eviction and re-admission, made deterministic by pinning arrivals:

    * arrival 1 (T0):      all documents + a mirrored copy of the
      ``doc_id % 5`` slice (same texts, new ids — in-batch duplicates);
      emits one row per distinct checksum.
    * arrival 2 (T0+1d):   the ``doc_id % 5`` slice again. The terminal
      watermark of run 1 (T0 − 1h) has not passed T0 + 1h, so every key's
      state is still live → all duplicates dropped, nothing emitted.
    * arrival 3 (T0+2d):   the ``doc_id % 7`` slice. Run 2's terminal
      watermark (T0+1d−1h) evicted every key admitted at T0
      (T0+1h < T0+1d−1h), so these keys RE-ADMIT → one extra row per
      distinct checksum in the slice.

    Output is the key column only (which duplicate row survives a batch
    is explicitly unspecified); the oracle is distinct-checksums UNION
    ALL the re-admitted slice."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.md5(F.col("text")).alias("checksum")
    base = docs.select("doc_id", key)
    mirrored = base.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    arrivals = [
        (base.unionByName(mirrored), _T0),
        (base.where(F.col("doc_id") % 5 == 0), _T0 + 86_400),
        (base.where(F.col("doc_id") % 7 == 0), _T0 + 2 * 86_400),
    ]
    tmp = _workdir("dedup")
    src = os.path.join(tmp, "src")
    out_dir = os.path.join(tmp, "out")
    ck = os.path.join(tmp, "ck")
    schema = None
    for batch_df, t in arrivals:
        batch = batch_df.withColumn("ts", F.timestamp_seconds(F.lit(t)))
        schema = schema or batch.schema
        # one file per arrival; each checkpointed run drains exactly it
        batch.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = streaming_dedup(
            stream, key_col="checksum", ts_col="ts", watermark="1 hour"
        ).select("checksum")
        # parquet sink: checkpoint-resumable across the three runs
        # (memory sink is not), output accumulates
        _run_available_now(deduped, fmt="parquet", ck_dir=ck, path=out_dir)
    return spark.read.parquet(out_dir).orderBy("checksum")


def q_streaming_trending_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1h window / 30min slide) word counts over a
    document ingest stream with a synthetic deterministic clock
    (ts = T0 + 97s·doc_id — 97 shares no factor with the 1800s slide,
    so no window end ever ties the terminal watermark). Emits every
    slide-aligned window closed under max event time − 2h."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from spacetime_crawler4py_spark.operators.textstats import report_tokens_col

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            report_tokens_col(F.col("text")).alias("tokens"),
            F.timestamp_seconds(F.lit(_T0) + F.col("doc_id") * 97).alias("ts"),
        )
    )
    tmp = _workdir("trend")
    src = os.path.join(tmp, "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = streaming_trending_words(
        stream, tokens_col="tokens", ts_col="ts",
        window="1 hour", slide="30 minutes", watermark="2 hours",
    )
    name = f"sgc_trend_{uuid.uuid4().hex[:8]}"
    _run_available_now(out, fmt="memory", ck_dir=os.path.join(tmp, "ck"), name=name)
    return spark.table(name).orderBy("window_unix", "word")
