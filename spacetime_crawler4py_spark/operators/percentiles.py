"""Exact per-group percentiles at corpus scale — the crawl-ops SLO
aggregate (per-domain fetch-latency p50/p95/p99, per-event-type value
tails) computed EXACTLY, not with approx_percentile sketches, and
bit-identically on any engine or partitioning.

Method: nearest-rank percentiles off a value HISTOGRAM, not a sort.

1. hash-agg ``(key, v) -> cnt``  — the only corpus-sized shuffle, fully
   map-side combinable, and skew-proof where a per-key sort is not: a
   key holding half the corpus still collapses to one histogram row per
   distinct value on the mappers.
2. one window over the histogram (cumulative count ordered by value) —
   O(distinct values per key) rows, orders of magnitude smaller than the
   input for quantized metrics (latency ms, size bytes, milli-scores).
3. the p-th percentile is the smallest value whose cumulative count
   reaches ``ceil(n * p / 100)`` (nearest-rank definition) — picked with
   a conditional min, all-integer arithmetic. ceil is spelled
   ``(n*p + 99) div 100``: with positive operands truncating (Spark,
   Java) and flooring (DuckDB ``//``, Python) integer division agree,
   whereas the negate-and-divide ceil trick does NOT (Spark ``div``
   truncates toward zero, DuckDB ``//`` floors — found by the
   hand-computed rank test).

Values must arrive as integers (quantize floats to cents/milli at the
call site — that choice is the caller's contract with its data). NULL
values are excluded (they carry no rank), NULL keys form their own group
as in SQL GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_group_percentiles"]


def exact_group_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: list[int] = (50, 95, 99),
) -> DataFrame:
    """One row per key: ``(key, n, p{p} ...)`` where p{p} is the exact
    nearest-rank p-th percentile of the integer ``value_col``."""
    if not ps or any(not 0 < p <= 100 for p in ps):
        raise ValueError("ps must be percentages in (0, 100]")
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("long").alias("v"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("key").orderBy("v")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("key"))
    )
    # ceil(n * p / 100) in engine-portable integer math (see module doc)
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {int(p)} + 99) div 100"),
                F.col("v"),
            )
        ).alias(f"p{int(p)}")
        for p in ps
    ]
    return (
        cum.groupBy("key")
        .agg(F.max("n").alias("n"), *picks)
        .withColumnRenamed("key", key_col)
    )
