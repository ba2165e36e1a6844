"""Recrawl scheduling — close the loop between sitemap freshness
metadata (sources/sitemaps.py) and the crawl's completion state: decide
WHICH known URLs deserve a refetch and how urgently, before the
politeness dequeue decides WHEN each domain may have them.

The reference crawls once and stops; a production crawl is a steady
state where most frontier work is re-validation. The standard signal
set (what search-engine recrawl schedulers and the sitemaps protocol
itself encode): publisher-declared priority, declared lastmod vs the
recorded fetch time, and staleness age.

Everything is integer arithmetic on unix seconds / milli-priorities, so
the schedule is engine-reproducible (SQL-oracle-checkable) and stable
under any partitioning. The operator is one broadcast-or-shuffle
equi-join + a CASE — scan-level cost at 10^10 URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recrawl_candidates"]


def recrawl_candidates(
    candidates: DataFrame,
    completions: DataFrame,
    now_unix: int,
    max_age_days: int = 30,
) -> DataFrame:
    """Refetch schedule from sitemap candidates + completion state.

    candidates:  (url, lastmod [W3C datetime or NULL], priority_milli)
                 — sitemap_frontier_candidates output.
    completions: (url, fetched_unix) — last successful fetch per URL.

    Classification:
      * no completion row                      -> reason 'new'
      * lastmod day > fetch day                -> reason 'changed'
      * otherwise                              -> excluded (fresh)

    score = priority_milli + 10 * age_days (capped at max_age_days);
    'new' URLs take the full cap — never-seen beats any equally-weighted
    stale page. lastmod is read at day precision (the common sitemap
    granularity): sub-day lastmod churn does not thrash the schedule.
    The day is converted to unix seconds via datediff from the epoch —
    a pure date computation, so the schedule does not depend on the
    session timezone (unix_timestamp(to_date(...)) would)."""
    lastmod_unix = (
        F.datediff(
            F.to_date(F.substring(F.col("lastmod"), 1, 10)),
            F.to_date(F.lit("1970-01-01")),
        ).cast("long")
        * 86400
    )
    joined = candidates.join(completions, "url", "left")
    age_days = F.floor(
        (F.lit(now_unix) - F.col("fetched_unix")) / 86400
    )
    bonus = F.least(
        F.greatest(age_days, F.lit(0)), F.lit(max_age_days)
    ) * 10
    reason = F.when(F.col("fetched_unix").isNull(), "new").when(
        lastmod_unix > F.col("fetched_unix"), "changed"
    )
    return (
        joined.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .select(
            "url",
            "reason",
            "priority_milli",
            F.when(
                F.col("reason") == "new",
                F.col("priority_milli") + max_age_days * 10,
            )
            .otherwise(F.col("priority_milli") + bonus)
            .cast("long")
            .alias("score"),
        )
    )
