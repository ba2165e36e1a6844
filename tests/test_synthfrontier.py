"""The in-stage synthetic fetcher must serve byte-identical pages to the
synthetic web table (they are two views of one generator)."""

from __future__ import annotations

from spacetime_crawler4py_spark.sources.synthfrontier import (
    make_synthetic_fetcher,
    synthetic_crawl_inputs,
)


def test_fetcher_matches_web_table(spark):
    n_urls, n_domains = 500, 37
    frontier, web = synthetic_crawl_inputs(spark, n_urls, n_domains)
    fetch = make_synthetic_fetcher(n_urls, n_domains)
    rows = web.collect()
    assert len(rows) == n_urls
    for r in rows[:100]:
        status, ctype, payload, final_url = fetch(r.url)
        assert status == r.status
        assert ctype == r.content_type
        assert bytes(r.payload) == payload, r.url
        assert final_url == r.final_url
    # frontier urls == web urls, and the hot domain holds ~25%
    f = frontier.collect()
    assert {x.url for x in f} == {r.url for r in rows}
    hot = sum(1 for x in f if x.domain == "d0.ics.uci.edu")
    assert abs(hot / n_urls - 0.25) < 0.05
