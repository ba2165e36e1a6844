"""Streaming dedup + trending-words twins (streaming/structured.py):
file source + availableNow runs, compared against batch equivalents,
plus the bounded-state re-admission trade-off of
dropDuplicatesWithinWatermark across checkpointed runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.streaming.structured import (
    streaming_dedup,
    streaming_trending_words,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_to_memory(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


@pytest.fixture(scope="module")
def dup_docs(spark):
    """9 rows over 3 fingerprint keys, all within one watermark window."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (i, f"fp{i % 3}", 1_700_000_000 + i * 60)  # 1 min apart
        for i in range(9)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, fingerprint string, ts_unix long"
    ).withColumn("ts", F.col("ts_unix").cast("timestamp")).drop("ts_unix")


def test_streaming_dedup_first_wins_per_key(spark, dup_docs, tmp_path):
    src = str(tmp_path / "dedup_src")
    dup_docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(dup_docs.schema).parquet(src)
    _run_to_memory(
        streaming_dedup(stream, key_col="fingerprint", watermark="1 hour"),
        "dedup_stream", tmp_path,
    )
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    assert len(got) == 3
    assert {r["fingerprint"] for r in got} == {"fp0", "fp1", "fp2"}


def test_streaming_dedup_state_expires_past_watermark(spark, dup_docs, tmp_path):
    """The documented bounded-state trade-off: a duplicate arriving AFTER
    the key's state aged out (event time advanced past ts + watermark)
    is re-admitted; within-watermark duplicates stay dropped."""
    src = str(tmp_path / "exp_src")
    out = str(tmp_path / "exp_out")
    ck = str(tmp_path / "exp_ck")
    dup_docs.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(dup_docs.schema).parquet(src)
        q = (
            streaming_dedup(stream, key_col="fingerprint", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def add_rows(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, fingerprint string, ts_unix long"
        ).select(
            "doc_id", "fingerprint", F.col("ts_unix").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(src)

    run_once()
    assert spark.read.parquet(out).count() == 3

    # a fresh key 10 days later: emitted, and — because the watermark only
    # advances at batch END — this run is what ages out the original keys'
    # state (watermark jumps to +10d - 1h after the batch)
    add_rows([(200, "fp_new", 1_700_000_000 + 10 * 86400)])
    run_once()
    assert spark.read.parquet(out).count() == 4

    # NOW a duplicate of fp0: its state is gone -> re-admitted (the
    # documented bounded-state trade-off); a batch dedup pass downstream
    # owns stragglers like this
    add_rows([(100, "fp0", 1_700_000_000 + 10 * 86400 + 60)])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if r["fingerprint"] == "fp0") == 2


def test_trending_words_matches_batch_on_closed_windows(spark, tmp_path):
    """Sliding-window word counts from the stream must equal the batch
    sliding-window rollup for every window closed under the final
    watermark; open tail windows are the only admissible difference."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.array(F.col("event_type")).alias("tokens"),
    )
    src = str(tmp_path / "words_src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    _run_to_memory(
        streaming_trending_words(
            stream, window="1 hour", slide="30 minutes", watermark="2 hours"
        ),
        "words_stream", tmp_path,
    )
    got = {
        (r.window_unix, r.word, r.cnt)
        for r in spark.sql("SELECT * FROM words_stream").collect()
    }
    rollup = (
        events.select("ts", F.explode("tokens").alias("word"))
        .groupBy(
            F.unix_timestamp(
                F.window("ts", "1 hour", "30 minutes").getField("start")
            ).alias("window_unix"),
            "word",
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    max_ts = events.agg(F.max(F.col("ts").cast("long"))).collect()[0][0]
    cutoff = max_ts - 2 * 3600
    want_closed = {
        (r.window_unix, r.word, r.cnt)
        for r in rollup
        if r.window_unix + 3600 <= cutoff
    }
    want_all = {(r.window_unix, r.word, r.cnt) for r in rollup}
    assert want_closed <= got <= want_all and got
