"""Sitemap ingestion (sources/sitemaps.py): differential against
xml.etree on well-formed protocol documents, entity/CDATA handling,
index expansion, candidate dedup."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from spacetime_crawler4py_spark.sources.sitemaps import (
    expand_sitemap_index,
    parse_sitemap_entries,
    sitemap_frontier_candidates,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/page?x=1&amp;y=2</loc>
    <lastmod>2024-01-15</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://a.example.com/cdata&raw]]></loc></url>
  <url>
    <loc>
      https://a.example.com/whitespace
    </loc>
    <priority>0.35</priority>
  </url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://b.example.com/sitemap-posts.xml</loc>
    <lastmod>2024-02-01T10:00:00Z</lastmod>
  </sitemap>
  <sitemap><loc>https://b.example.com/sitemap-pages.xml</loc></sitemap>
</sitemapindex>"""

CHILD = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://b.example.com/post/1</loc><priority>0.9</priority></url>
  <url><loc>https://b.example.com/post/2</loc></url>
</urlset>"""


def _etree_urls(xml: str):
    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    root = ET.fromstring(xml)
    out = []
    for u in root.iter(f"{ns}url"):
        loc = u.find(f"{ns}loc").text.strip()
        pr = u.find(f"{ns}priority")
        out.append((loc, 500 if pr is None else int(float(pr.text) * 1000)))
    return out


def test_urlset_matches_etree(spark):
    df = spark.createDataFrame([("a.example.com", URLSET)], "host string, xml string")
    got = {
        (r.loc, r.priority_milli)
        for r in parse_sitemap_entries(df).where("kind = 'url'").collect()
    }
    assert got == set(_etree_urls(URLSET)) and len(got) == 3
    # entity + CDATA decoding specifically
    locs = {loc for loc, _ in got}
    assert "https://a.example.com/page?x=1&y=2" in locs
    assert "https://a.example.com/cdata&raw" in locs
    assert "https://a.example.com/whitespace" in locs


def test_fields_and_defaults(spark):
    df = spark.createDataFrame([("a.example.com", URLSET)], "host string, xml string")
    rows = {r.loc: r for r in parse_sitemap_entries(df).collect()}
    r = rows["https://a.example.com/page?x=1&y=2"]
    assert (r.lastmod, r.changefreq, r.priority_milli) == ("2024-01-15", "daily", 800)
    r2 = rows["https://a.example.com/cdata&raw"]
    assert r2.lastmod is None and r2.changefreq is None and r2.priority_milli == 500
    assert rows["https://a.example.com/whitespace"].priority_milli == 350


def test_index_expansion(spark):
    idx = spark.createDataFrame([("b.example.com", INDEX)], "host string, xml string")
    entries = parse_sitemap_entries(idx)
    kinds = {r.kind for r in entries.collect()}
    assert kinds == {"sitemap"}
    children = spark.createDataFrame(
        [("https://b.example.com/sitemap-posts.xml", CHILD)],
        "loc string, xml string",
    )
    expanded = expand_sitemap_index(entries, children)
    got = {(r.host, r.kind, r.loc, r.priority_milli) for r in expanded.collect()}
    assert got == {
        ("b.example.com", "url", "https://b.example.com/post/1", 900),
        ("b.example.com", "url", "https://b.example.com/post/2", 500),
    }


def test_frontier_candidates_dedup(spark):
    xml = """<urlset>
      <url><loc>https://c.example.com/p</loc><lastmod>2024-01-01</lastmod>
        <priority>0.2</priority></url>
      <url><loc>https://c.example.com/p</loc><lastmod>2024-03-01</lastmod>
        <priority>0.7</priority></url>
      <url><loc>https://c.example.com/q</loc></url>
    </urlset>"""
    df = spark.createDataFrame([("c.example.com", xml)], "host string, xml string")
    cands = {
        (r.url, r.lastmod, r.priority_milli)
        for r in sitemap_frontier_candidates(parse_sitemap_entries(df)).collect()
    }
    assert cands == {
        ("https://c.example.com/p", "2024-03-01", 700),
        ("https://c.example.com/q", None, 500),
    }


ROBOTS = """# corp robots
User-agent: *
Disallow: /private/
Sitemap: https://d.example.com/sitemap.xml

User-agent: crawler
Allow: /
SITEMAP: https://d.example.com/sitemap-news.xml   # inline comment
sitemap: https://d.example.com/sitemap.xml
Sitemap:
"""


def test_sitemap_directives_match_robotparser():
    import urllib.robotparser

    from spacetime_crawler4py_spark.functions.robots import (
        parse_sitemap_directives,
    )

    got = parse_sitemap_directives(ROBOTS)
    assert got == [
        "https://d.example.com/sitemap.xml",
        "https://d.example.com/sitemap-news.xml",
    ]
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(ROBOTS.splitlines())
    # robotparser keeps duplicates AND the empty value of a bare
    # "Sitemap:" line; ours dedups and drops empties — compare the
    # non-empty sets
    assert set(got) == {u for u in rp.site_maps() if u}


def test_sitemap_urls_from_robots_df(spark):
    from spacetime_crawler4py_spark.functions.robots import (
        sitemap_urls_from_robots,
    )

    df = spark.createDataFrame(
        [("d.example.com", ROBOTS), ("e.example.com", "User-agent: *\n")],
        "host string, content string",
    )
    got = {
        (r.host, r.sitemap_url) for r in sitemap_urls_from_robots(df).collect()
    }
    assert got == {
        ("d.example.com", "https://d.example.com/sitemap.xml"),
        ("d.example.com", "https://d.example.com/sitemap-news.xml"),
    }


def test_cdata_content_stays_literal(spark):
    """Per XML, CDATA content is literal: entities inside it must NOT be
    decoded (xml.etree agrees)."""
    xml = ("<urlset><url><loc><![CDATA[https://x.example.com/?a=1&amp;b=2]]>"
           "</loc></url></urlset>")
    df = spark.createDataFrame([("x.example.com", xml)], "host string, xml string")
    (row,) = parse_sitemap_entries(df).collect()
    assert row.loc == "https://x.example.com/?a=1&amp;b=2"
    ns_free = ET.fromstring(xml)
    assert row.loc == ns_free.find("url/loc").text


def test_index_expansion_with_host_carrying_payloads(spark):
    """Fetched child payloads naturally carry their own host column; the
    join must not become ambiguous (the index entry's host wins)."""
    idx = spark.createDataFrame([("b.example.com", INDEX)], "host string, xml string")
    children = spark.createDataFrame(
        [("fetcher.internal", "https://b.example.com/sitemap-posts.xml", CHILD)],
        "host string, loc string, xml string",
    )
    expanded = expand_sitemap_index(parse_sitemap_entries(idx), children)
    got = {(r.host, r.loc) for r in expanded.collect()}
    assert got == {
        ("b.example.com", "https://b.example.com/post/1"),
        ("b.example.com", "https://b.example.com/post/2"),
    }


def test_sitemap_directive_with_internal_space_twins_agree(spark):
    """Both kernels keep internal whitespace in the directive value."""
    from spacetime_crawler4py_spark.functions.robots import (
        parse_sitemap_directives,
        sitemap_urls_from_robots,
    )

    content = "Sitemap: https://x.example.com/site map.xml  # c\n"
    want = ["https://x.example.com/site map.xml"]
    assert parse_sitemap_directives(content) == want
    df = spark.createDataFrame([("x", content)], "host string, content string")
    assert [r.sitemap_url for r in sitemap_urls_from_robots(df).collect()] == want


def test_gzip_payload_decode_matches_plain(spark):
    """A gzipped sitemap body must parse to the exact entries its plain
    twin parses to; corrupt gzip decodes to no entries instead of
    failing the batch; plain binary passes through untouched."""
    import gzip

    from spacetime_crawler4py_spark.sources.sitemaps import (
        decode_sitemap_payloads,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://g.example.com/a?x=1&amp;y=2</loc>"
        "<lastmod>2024-02-01</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://g.example.com/b</loc></url>"
        "</urlset>"
    )
    rows = [
        ("gz.example.com", bytearray(gzip.compress(xml.encode()))),
        ("plain.example.com", bytearray(xml.encode())),
        ("bad.example.com", bytearray(b"\x1f\x8b\x08corrupt")),
    ]
    decoded = decode_sitemap_payloads(
        spark.createDataFrame(rows, "host string, payload binary")
    )
    got = {
        (r.host, r.loc, r.lastmod, r.priority_milli)
        for r in parse_sitemap_entries(decoded).collect()
    }
    want_entries = {
        ("https://g.example.com/a?x=1&y=2", "2024-02-01", 800),
        ("https://g.example.com/b", None, 500),
    }
    assert got == {
        (h, loc, lm, pm)
        for h in ("gz.example.com", "plain.example.com")
        for (loc, lm, pm) in want_entries
    }
    # differential: same loc set as xml.etree on the uncompressed text
    ns_free = ET.fromstring(xml)
    etree_locs = {u.find("loc").text for u in ns_free.findall("url")}
    assert {loc for (_h, loc, _lm, _pm) in got} == etree_locs
