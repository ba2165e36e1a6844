"""Golden end-to-end parity: reproduce the reference's PUBLISHED crawl
report (crawl_out/report.json — built by its bs4+lxml analyzer over the
8,521 actually-crawled pages) from the raw manifest + saved HTML via the
Spark analytics sources + analyzer extractor.

Status of parity (also reproducible via scripts/golden_report_check.py):
* unique_pages (8521), all 92 subdomain counts, and the longest page
  (https://cml.ics.uci.edu/category/aiml @ 24,057 words) match EXACTLY.
* top-50 words: 48 of 50 counts match EXACTLY; 'data' and 'project' are
  each -1 (2 tokens of ~6.7M). A ctypes-driven system-libxml2 oracle
  (parsing every page with the reference's own HTML engine) shows the
  SAME -1 on both words, i.e. the residue lives in the bs4 layer above
  libxml2 at report-generation time, not in this extractor. The big
  round-2 find via that oracle: HTML5's comment-end-bang ("--!>" closes
  a comment; html.parser requires "-->"), which one faculty page used —
  518 swallowed tokens, now normalized in the extractor. The assertion
  bounds drift at 2 counts per word so any extractor regression fails
  loudly.

Set SPARK_GRAFT_GOLDEN=0 to skip (the full corpus is 426 MB of HTML;
~2-8 min depending on cores).
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_GOLDEN", "1") == "0"
    or not os.path.exists(f"{REF}/crawl_out/report.json"),
    reason="golden corpus disabled or absent",
)


@pytest.fixture(scope="module")
def report(spark):
    from spacetime_crawler4py_spark.operators.analyze import (
        analyze_pages, golden_report,
    )
    from spacetime_crawler4py_spark.sources.analytics import (
        load_html_pages, read_manifest,
    )

    pairs = read_manifest(spark, f"{REF}/crawl_out/manifest.tsv")
    pages = load_html_pages(spark, pairs, REF)
    analyzed = analyze_pages(pages).persist()
    got = golden_report(pairs, analyzed)
    analyzed.unpersist()
    return got


@pytest.fixture(scope="module")
def want():
    with open(f"{REF}/crawl_out/report.json", encoding="utf-8") as f:
        return json.load(f)


def test_unique_pages_exact(report, want):
    assert report["unique_pages"] == want["unique_pages"] == 8521


def test_subdomains_exact(report, want):
    assert dict(map(tuple, report["subdomains"])) == dict(
        map(tuple, want["subdomains"])
    )
    assert len(report["subdomains"]) == 92


def test_longest_page_exact(report, want):
    assert report["longest_page"] == want["longest_page"]
    assert report["longest_page"]["word_count"] == 24057


def test_top_words_within_tolerance(report, want):
    got = dict(map(tuple, report["top_words"]))
    ref = dict(map(tuple, want["top_words"]))
    assert set(got) == set(ref), (
        set(got) ^ set(ref)
    )  # same 50 words
    for w, c in ref.items():
        assert abs(got[w] - c) <= 2, (w, got[w], c)
    exact = sum(1 for w, c in ref.items() if got[w] == c)
    assert exact >= 48, f"only {exact}/50 counts exact"


def test_pages_dir_scan_recovers_all_urls(spark):
    """The pages-dir source (URL-header recovery) finds every page the
    manifest lists — the reference's alternative input shape."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.sources.analytics import (
        read_manifest, scan_pages_dir,
    )

    manifest = read_manifest(spark, f"{REF}/crawl_out/manifest.tsv")
    scanned = scan_pages_dir(spark, f"{REF}/crawl_out/pages")
    m = {r.url for r in manifest.select("url").collect()}
    s = {r.url for r in scanned.select("url").collect()}
    assert s == m
    assert scanned.where(F.col("path").startswith("/")).count() == len(s)
