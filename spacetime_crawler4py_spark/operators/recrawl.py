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

__all__ = ["recrawl_candidates", "allocate_crawl_budget"]


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


def allocate_crawl_budget(
    weights: DataFrame,
    total_budget: int,
    domain_col: str = "domain",
    weight_col: str = "weight",
) -> DataFrame:
    """Allocate a global per-epoch fetch budget across domains by
    largest-remainder (Hamilton) apportionment — the feedback half of a
    production crawl loop: corpus signals (quality, yield, inlink mass)
    become per-domain weights, and the scheduler turns them into integer
    politeness budgets that sum EXACTLY to the epoch's capacity. The
    reference crawls every domain at one fixed rate; a steady-state
    crawl spends its fetch capacity where the corpus says it pays.

    Input ``weights``: one row per domain with a non-negative integer
    weight. Output: ``(domain, weight, budget)`` with
    sum(budget) == total_budget, each budget within 1 of the exact real
    quota (the Hamilton guarantee), ties on equal remainders broken by
    domain asc — fully deterministic.

    All-integer arithmetic: quota = total_budget * weight; base =
    quota div W; the fractional remainder is compared as the exact
    integer ``quota mod W`` (never a float division), so the allocation
    is bit-identical on any engine and partitioning. The leftover
    ``R = total_budget - sum(base) < n_domains`` seats go to the R
    largest remainders.

    Plan shape: two 1-row broadcast constants (W and R — the same
    benign crossJoin pattern the PageRank dangling-mass step uses) and
    ONE global rank over the per-domain dim. The ranked frame is
    O(domains) — politeness state, not corpus data — the same cardinality
    the watermark dim already carries; at 10^8 domains the rank is a
    single-column sort of an 16-byte row, and budgets below the base
    never enter the rank at all.

    Domains with NULL or non-positive weight are dropped (they receive
    no budget — a zero-weight domain must not outrank a positive one
    for a remainder seat, and a negative weight would silently break
    the sum(budget) == total_budget guarantee). If NO positive weight
    exists the allocation is EMPTY, not a division-by-zero: the epoch
    has nothing to apportion over."""
    w = weights.select(
        F.col(domain_col).alias("domain"),
        F.col(weight_col).cast("long").alias("weight"),
    ).filter(F.col("weight") > 0)
    tot = F.broadcast(w.agg(F.sum("weight").alias("_W")))
    based = (
        w.crossJoin(tot)
        .select(
            "domain",
            "weight",
            (F.col("weight") * total_budget).alias("_q"),
            "_W",
        )
        .withColumn("_base", F.expr("_q div _W"))
        .withColumn("_rem", F.col("_q") % F.col("_W"))
        .drop("_W")
    )
    leftover = F.broadcast(
        based.agg((F.lit(total_budget) - F.sum("_base")).alias("_R"))
    )
    from pyspark.sql import Window

    rk = Window.orderBy(F.desc("_rem"), F.asc("domain"))
    return (
        based.crossJoin(leftover)
        .withColumn("_rk", F.row_number().over(rk))
        .select(
            "domain",
            "weight",
            (F.col("_base") + (F.col("_rk") <= F.col("_R")).cast("long"))
            .alias("budget"),
        )
    )
