"""Exact per-group nearest-rank percentiles
(operators/percentiles.exact_group_percentiles): hand-computed ranks,
NULL handling, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.percentiles import (
    exact_group_percentiles,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_nearest_rank_hand_computed(spark):
    # group a: values 1..10 -> p50 = rank ceil(5) = 5, p95 = rank
    # ceil(9.5) = 10, p99 = rank ceil(9.9) = 10
    # group b: [7, 7, 7, 100] -> p50 = rank 2 = 7, p95/p99 = rank 4 = 100
    rows = [("a", v) for v in range(1, 11)] + [
        ("b", 7), ("b", 7), ("b", 7), ("b", 100),
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    out = exact_group_percentiles(df, "k", "v", [50, 95, 99])
    assert _rows(out) == {("a", 10, 5, 10, 10), ("b", 4, 7, 100, 100)}


def test_null_values_excluded_and_duplicate_mass(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 1), ("a", 1), ("a", 9)],
        "k string, v long",
    )
    out = exact_group_percentiles(df, "k", "v", [50, 75, 100])
    # n = 4 (NULL dropped); sorted [1,1,1,9]: p50 = rank 2 = 1,
    # p75 = rank 3 = 1, p100 = rank 4 = 9
    assert _rows(out) == {("a", 4, 1, 1, 9)}


def test_invalid_ps_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        exact_group_percentiles(df, "k", "v", [0])
    with pytest.raises(ValueError):
        exact_group_percentiles(df, "k", "v", [])


def test_partitioning_invariance(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.xxhash64("id") % 500).alias("v"),
    )
    one = exact_group_percentiles(df.coalesce(1), "k", "v", [50, 95])
    many = exact_group_percentiles(df.repartition(17), "k", "v", [50, 95])
    assert _rows(one) == _rows(many)
