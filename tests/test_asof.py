"""asof_join (operators/asof.py) on hand-computed frames. The
cross-engine gate (DuckDB native ASOF JOIN, check_oracle
asof_latest_order) covers the real-table path; these pin the semantics:
backward-inclusive boundary, tiebreak, inner-vs-left, per-key isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, 100),  # id, key, ts
            (2, 10, 205),
            (3, 10, 200),  # exactly equal to a right ts: inclusive
            (4, 10, 50),   # before any right row
            (5, 20, 500),  # other key: right rows of key 10 must not leak
        ],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [
            (10, 90, "a"),
            (10, 200, "b"),
            (10, 300, "c"),
            (20, 400, "x"),
        ],
        "k long, rts long, val string",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        r["id"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            value_cols=["val"],
        ).collect()
    }
    # id 4 (ts=50, no right <= 50) dropped by inner semantics
    assert got == {1: "a", 2: "b", 3: "b", 5: "x"}


def test_asof_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    got = {
        r["id"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            value_cols=["val"], inner=False,
        ).collect()
    }
    assert got[4] is None and len(got) == 5


def test_asof_tiebreak_picks_largest(spark):
    left = spark.createDataFrame([(1, 10, 100)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(10, 100, 7, "lo"), (10, 100, 9, "hi"), (10, 100, 8, "mid")],
        "k long, rts long, seq long, val string",
    )
    rows = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        value_cols=["val"], right_tiebreak="seq",
    ).collect()
    assert [r["val"] for r in rows] == ["hi"]


def test_asof_all_left_columns_survive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left.withColumn("extra", F.col("id") * 2), right,
        on="k", left_ts="ts", right_ts="rts", value_cols=["val"],
    )
    assert set(out.columns) == {"id", "k", "ts", "extra", "val"}
    assert {r["extra"] for r in out.collect()} == {2, 4, 6, 10}
