"""robots.txt parsing: differential vs urllib.robotparser (the stdlib
reference implementation for Disallow-prefix semantics) plus the
DataFrame rules builder and the engine's link gate end to end."""

from __future__ import annotations

import urllib.robotparser

import pytest

from spacetime_crawler4py_spark.functions.robots import (
    build_robots_rules,
    parse_robots_txt,
)
from spacetime_crawler4py_spark.oracle.pycrawler import robots_allows

ROBOTS_BODIES = [
    # plain single group
    "User-agent: *\nDisallow: /wp-admin\nDisallow: /search\n",
    # agent-specific group + fallback
    (
        "User-agent: googlebot\nDisallow: /google-only\n\n"
        "User-agent: spacetime\nDisallow: /private\nDisallow: /tmp/\n\n"
        "User-agent: *\nDisallow: /everything\n"
    ),
    # stacked agents sharing one group
    "User-agent: a\nUser-agent: spacetime\nDisallow: /shared\n",
    # comments, blank disallow (allow-all), mixed case keys
    (
        "# banner comment\nUser-Agent: *   # trailing\n"
        "Disallow:\nDisallow: /cgi-bin/ # block cgi\n"
    ),
    # percent-encoded path
    "User-agent: *\nDisallow: /a%20b/\n",
    # disallow everything
    "User-agent: *\nDisallow: /\n",
    # no matching group for us
    "User-agent: otherbot\nDisallow: /other\n",
    # empty file
    "",
]

PROBE_PATHS = [
    "/", "/index.html", "/wp-admin", "/wp-admin/x", "/search?q=1",
    "/google-only/x", "/private", "/private/x", "/privateer", "/tmp/",
    "/tmp/x", "/tmpfile", "/shared/doc", "/cgi-bin/", "/cgi-bin/run",
    "/a b/c", "/a%20b/c", "/everything/z", "/other/page",
]


@pytest.mark.parametrize("body", ROBOTS_BODIES)
@pytest.mark.parametrize("agent", ["spacetime", "SomeOther/1.0"])
def test_parse_matches_robotparser(body, agent):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    prefixes = parse_robots_txt(body, agent=agent)
    rules = {"example.org": prefixes} if prefixes else None
    for path in PROBE_PATHS:
        url = f"https://example.org{path}"
        got = robots_allows(rules, url)
        want = rp.can_fetch(agent, url)
        assert got == want, (body, agent, path, got, want)


def test_engine_gates_links_with_fetched_robots(spark, tmp_path):
    """Full flow: /robots.txt payloads come out of the fetch oracle, the
    DataFrame builder parses them into the rules dict, and the crawl's
    link gate keeps disallowed paths out of the frontier/seen set."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.sources.store import SnapshotStore
    from spacetime_crawler4py_spark.streaming.epochs import CrawlEngine, EngineConfig

    host = "www.ics.uci.edu"
    page = (
        b"<html><body>"
        b'<a href="/about/team">team</a> '
        b'<a href="/private/secrets">secrets</a> '
        b'<a href="/private/more">more</a> '
        b"twenty words of body text follow: "
        + b"word " * 20 + b"</body></html>"
    )
    sub = b"<html><body>about page " + b"filler " * 25 + b"</body></html>"
    rows = [
        (f"https://{host}/robots.txt", 200, f"https://{host}/robots.txt",
         "text/plain", b"User-agent: *\nDisallow: /private\n", host),
        # note: engine-normalized form (no trailing slash on the root)
        (f"https://{host}", 200, f"https://{host}", "text/html", page, host),
        (f"https://{host}/about/team", 200, f"https://{host}/about/team",
         "text/html", sub, host),
        (f"https://{host}/private/secrets", 200,
         f"https://{host}/private/secrets", "text/html", sub, host),
        (f"https://{host}/private/more", 200,
         f"https://{host}/private/more", "text/html", sub, host),
    ]
    web_df = spark.createDataFrame(
        rows,
        "url string, status int, final_url string, content_type string, "
        "payload binary, domain string",
    )
    robots_pages = web_df.where(F.col("url").endswith("/robots.txt")).select(
        F.col("domain").alias("host"), "payload"
    )
    rules = build_robots_rules(robots_pages)
    assert rules == {host: ["/private"]}

    store = SnapshotStore(spark, str(tmp_path / "robots-crawl"))
    eng = CrawlEngine(
        spark, store, web_df,
        EngineConfig(ordering="relaxed", neardup="off", robots=rules),
    )
    eng.seed([f"https://{host}"])
    eng.run()
    seen_urls = {r.url for r in store.read("frontier").collect()}
    assert f"https://{host}/about/team" in seen_urls
    assert not any("/private" in u for u in seen_urls)


def test_build_rules_from_dataframe(spark):
    rows = [
        ("a.example.org", b"User-agent: *\nDisallow: /blog\n"),
        ("b.example.org", b"User-agent: *\nDisallow:\n"),  # allow-all
        ("c.example.org", None),  # fetch failed
        ("d.example.org", b"User-agent: x\nDisallow: /only-x\n"),
    ]
    df = spark.createDataFrame(rows, "host string, payload binary")
    rules = build_robots_rules(df, agent="spacetime")
    assert rules == {"a.example.org": ["/blog"]}
    assert robots_allows(rules, "https://a.example.org/blog/post") is False
    assert robots_allows(rules, "https://a.example.org/about") is True
    assert robots_allows(rules, "https://b.example.org/anything") is True
