"""As-of (temporal point-in-time) join — an operator Spark's DataFrame
API lacks natively, composed from a union + last-value window so it
scales as ONE shuffle instead of a range-join explosion.

For each left row, attach the right row with the same key and the
largest right timestamp <= the left timestamp (backward, inclusive) —
the enrichment shape of "the customer's latest order at event time",
"the config active when the crawl fetched", etc. A naive
``left.join(right, key).where(rts <= lts)`` + argmax builds the full
(left x matching-right) product first — quadratic per hot key; the
merge-interleave below is what databases with native ASOF JOIN
(the DuckDB correctness oracle runs one) do under the hood:

* both sides union into one frame tagged ``_side`` (right=0, left=1);
* one window partitioned by key, ordered by (ts, _side, tiebreak),
  carries each right value forward with ``last(ignorenulls=True)`` over
  an unbounded-preceding running frame — right rows sort BEFORE left
  rows at equal ts, giving inclusive backward semantics;
* left rows are filtered back out with the filled values attached.

Cost: one shuffle on the key (the window), linear rows. Per-key state is
the window sort — skew on a hot key is the same bound as any
sessionization; pre-bucketing both sides by key removes the shuffle the
way ivf/pagerank bucketing does.

Ties between right rows with the SAME (key, ts): pass ``right_tiebreak``
(a right column); the row with the largest tiebreak wins
deterministically. Without it, equal-timestamp right duplicates make the
result order-dependent — dedupe the right side first.

``value_cols`` must be non-null on the right side: each column is
carried forward independently, so a null value in the winning right row
would backfill from an older row instead of surfacing as null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
    inner: bool = True,
) -> DataFrame:
    """Backward-inclusive as-of join; returns every ``left`` column plus
    ``value_cols`` from the matched right row. ``inner=True`` drops left
    rows with no right row at or before their timestamp; ``inner=False``
    keeps them with nulls (ASOF LEFT JOIN)."""
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast("boolean").alias("_m"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0)
    )
    l2 = l2.withColumn("_tb", F.lit(None).cast("long"))
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_row"].dataType).alias("_row"),
        F.lit(True).alias("_m"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        tb.alias("_tb"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        "_side",
        "_row",
        F.last("_m", ignorenulls=True).over(w).alias("_matched"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("_side") == 1)
    if inner:
        out = out.where(F.col("_matched"))
    return out.select(
        F.col("_row.*"),
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: str | None = None,
) -> DataFrame:
    """Interval-containment join (``start <= point <= end``, inclusive)
    without the nested-loop explosion — Spark plans a raw inequality join
    as BroadcastNestedLoop/cartesian, which is quadratic the moment the
    intervals side stops fitting in a broadcast.

    The scalable composition is binning: every interval explodes to the
    integer bins it overlaps (fanout bounded by interval_length /
    bin_width + 1 — pick bin_width near the typical interval length so
    fanout is ~2), points carry their single bin, and the join becomes a
    shuffle equi-join on (bin[, key]) followed by the exact BETWEEN
    filter. A (point, interval) pair can only meet in the point's one
    bin, so no dedup pass is needed. Point/start/end are numeric
    (epoch micros for time); ``on`` adds an equality key to the join."""
    lb = left.withColumn(
        "_bin", F.floor(F.col(left_point) / F.lit(bin_width))
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bin_width)),
                F.floor(F.col(right_end) / F.lit(bin_width)),
            )
        ),
    )
    keys = ["_bin"] + ([on] if on else [])
    return (
        lb.join(rb, keys)
        .where(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) <= F.col(right_end))
        )
        .drop("_bin")
    )
