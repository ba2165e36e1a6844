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


# ---------------------------------------------------------------------------
# range_join_binned
# ---------------------------------------------------------------------------


def _range_frames(spark):
    pts = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 10, 99), (4, 20, 100)],
        "pid long, k long, p long",
    )
    # interval [100, 250] spans 3 bins at width 100; [0, 50] in one bin
    ivs = spark.createDataFrame(
        [(10, 100, 250, "w1"), (10, 0, 50, "w2"), (20, 90, 110, "w3")],
        "k long, s long, en long, name string",
    )
    return pts, ivs


def test_range_join_inclusive_bounds_and_keys(spark):
    from spacetime_crawler4py_spark.operators.asof import range_join_binned

    pts, ivs = _range_frames(spark)
    got = {
        (r["pid"], r["name"])
        for r in range_join_binned(
            pts, ivs, left_point="p", right_start="s", right_end="en",
            bin_width=100, on="k",
        ).collect()
    }
    # pid 1: p=100 hits both bounds-inclusive ends of w1 start; pid 2:
    # p=250 == w1 end (inclusive); pid 3: 99 in no k=10 interval;
    # pid 4: k=20 -> w3 only
    assert got == {(1, "w1"), (2, "w1"), (4, "w3")}


def test_range_join_no_duplicate_matches_across_bins(spark):
    """An interval spanning many bins must still match each point exactly
    once (the point owns a single bin)."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.operators.asof import range_join_binned

    pts = spark.createDataFrame(
        [(i, 1, i * 10) for i in range(50)], "pid long, k long, p long"
    )
    ivs = spark.createDataFrame([(1, 0, 490, "all")], "k long, s long, en long, name string")
    out = range_join_binned(
        pts, ivs, left_point="p", right_start="s", right_end="en",
        bin_width=7, on="k",
    )
    assert out.count() == 50
    assert out.groupBy("pid").count().where(F.col("count") > 1).count() == 0
