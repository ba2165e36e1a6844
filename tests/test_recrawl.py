"""recrawl_candidates: classification, scoring, and exclusion rules."""

from __future__ import annotations


from spacetime_crawler4py_spark.operators.recrawl import recrawl_candidates

DAY = 86400
T0 = 1_704_067_200  # 2024-01-01T00:00:00Z


def test_classification_and_scores(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cands = spark.createDataFrame(
        [
            ("u/new", "2024-01-10", 800),          # never fetched
            ("u/changed", "2024-01-20", 300),      # lastmod after fetch
            ("u/fresh", "2024-01-05", 900),        # fetched after lastmod
            ("u/nolastmod", None, 400),            # fetched, no lastmod
            ("u/ancient", "2024-02-01", 100),      # changed, age > cap
        ],
        "url string, lastmod string, priority_milli long",
    )
    completions = spark.createDataFrame(
        [
            ("u/changed", T0 + 10 * DAY),   # fetched Jan 11, lastmod Jan 20
            ("u/fresh", T0 + 9 * DAY),      # fetched Jan 10, lastmod Jan 5
            ("u/nolastmod", T0 + 3 * DAY),
            ("u/ancient", T0),              # fetched Jan 1, lastmod Feb 1
        ],
        "url string, fetched_unix long",
    )
    now = T0 + 25 * DAY  # Jan 26
    got = {
        r.url: (r.reason, r.score)
        for r in recrawl_candidates(cands, completions, now).collect()
    }
    # new: priority + full cap bonus (30d * 10)
    assert got["u/new"] == ("new", 800 + 300)
    # changed: priority + age bonus (25-10=15 days -> 150)
    assert got["u/changed"] == ("changed", 300 + 150)
    # ancient: age 25 days < cap -> 250
    assert got["u/ancient"] == ("changed", 100 + 250)
    # fresh + no-lastmod rows are excluded entirely
    assert set(got) == {"u/new", "u/changed", "u/ancient"}


def test_age_bonus_caps(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cands = spark.createDataFrame(
        [("u/x", "2024-06-01", 0)], "url string, lastmod string, priority_milli long"
    )
    completions = spark.createDataFrame(
        [("u/x", T0)], "url string, fetched_unix long"
    )
    now = T0 + 400 * DAY  # far beyond the 30-day cap
    (row,) = recrawl_candidates(cands, completions, now).collect()
    assert row.reason == "changed" and row.score == 300


def test_schedule_is_session_timezone_independent(spark):
    """lastmod day -> unix must be a pure date computation: the same
    inputs classify identically under any session timezone."""
    cands = spark.createDataFrame(
        [("u/c", "2024-01-20", 300)], "url string, lastmod string, priority_milli long"
    )
    completions = spark.createDataFrame(
        [("u/c", T0 + 10 * DAY)], "url string, fetched_unix long"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        out = {}
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out[tz] = sorted(
                map(tuple, recrawl_candidates(cands, completions, T0 + 25 * DAY).collect())
            )
        assert out["UTC"] == out["America/Los_Angeles"] == out["Asia/Tokyo"]
        assert out["UTC"] and out["UTC"][0][1] == "changed"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_allocate_crawl_budget_hamilton(spark):
    """Largest-remainder apportionment: budgets sum exactly to the total,
    each within 1 of the real-valued quota, remainder ties broken by
    domain asc, and the result is partitioning-invariant."""
    from spacetime_crawler4py_spark.operators.recrawl import (
        allocate_crawl_budget,
    )

    rows = [("a", 3), ("b", 3), ("c", 3), ("d", 1)]   # W=10, budget=7
    out = {
        r.domain: r.budget
        for r in allocate_crawl_budget(
            spark.createDataFrame(rows, "domain string, weight long"), 7
        ).collect()
    }
    # quotas: a/b/c = 2.1, d = 0.7 -> bases 2,2,2,0; leftover 1 seat goes
    # to the largest remainder (d, rem 7) before the tied a/b/c (rem 1)
    assert out == {"a": 2, "b": 2, "c": 2, "d": 1}
    assert sum(out.values()) == 7

    # property check on a skewed weight set, two partitionings
    import math

    rows2 = [(f"d{i:03d}", (i * i) % 97 + 1) for i in range(50)]
    df2 = spark.createDataFrame(rows2, "domain string, weight long")
    total = 12345
    a = {r.domain: r.budget for r in
         allocate_crawl_budget(df2.coalesce(1), total).collect()}
    b = {r.domain: r.budget for r in
         allocate_crawl_budget(df2.repartition(13), total).collect()}
    assert a == b
    assert sum(a.values()) == total
    W = sum(w for _, w in rows2)
    for d, w in rows2:
        quota = total * w / W
        assert math.floor(quota) <= a[d] <= math.ceil(quota)
