"""Report analytics vs a pure-Python golden computed with the reference
formulas (analyze_crawl.py:186-277) over the oracle crawl's saved docs."""

from __future__ import annotations

from collections import Counter, defaultdict
from urllib.parse import urlsplit

import pytest

from spacetime_crawler4py_spark.functions.tokenize import (
    NOISE_WORDS, STOPWORDS, report_tokens,
)
from spacetime_crawler4py_spark.operators.report import crawl_report
from spacetime_crawler4py_spark.oracle.pycrawler import OracleCrawler
from spacetime_crawler4py_spark.sources.webgen import generate_web

SPAN_DDL = (
    "doc_id string, domain string, round bigint, word_count int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _golden_report(documents: dict, k: int = 50) -> dict:
    """The reference analytics loop over span docs (text = text+link spans
    in order, the span model's visible text)."""
    unique = set(documents)
    counter = Counter()
    longest_url, longest_wc = None, -1
    sub_counts: dict[str, int] = defaultdict(int)
    for doc_id in unique:
        host = urlsplit(doc_id).hostname or ""
        if host.endswith(".uci.edu"):
            sub_counts[host] += 1
    for doc_id, spans in documents.items():
        text = " ".join(
            t for (kind, t, _) in spans if kind in ("text", "link") and t
        )
        tokens = report_tokens(text)
        if len(tokens) < 20:  # analyze_crawl.py:227-229
            continue
        if len(tokens) > longest_wc or (
            len(tokens) == longest_wc and doc_id < (longest_url or "")
        ):
            longest_wc, longest_url = len(tokens), doc_id
        counter.update(
            w for w in tokens if w not in STOPWORDS and w not in NOISE_WORDS
        )
    top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {
        "unique_pages": len(unique),
        "longest_page": {"url": longest_url, "word_count": longest_wc},
        "top_words": [[w, c] for w, c in top],
        "subdomains": sorted([[h, c] for h, c in sub_counts.items()]),
    }


@pytest.fixture(scope="module")
def oracle_docs():
    web = generate_web(n_pages=200, seed=42)
    return OracleCrawler(web).run().documents


def test_crawl_report_matches_golden(spark, oracle_docs):
    rows = [
        (
            doc_id,
            urlsplit(doc_id).netloc,
            0,
            0,
            [
                {"kind": k, "text": t, "media_ref": r, "offset": i}
                for i, (k, t, r) in enumerate(spans)
            ],
        )
        for doc_id, spans in oracle_docs.items()
    ]
    docs_df = spark.createDataFrame(rows, SPAN_DDL)
    got = crawl_report(docs_df)
    golden = _golden_report(oracle_docs)
    assert got["unique_pages"] == golden["unique_pages"]
    assert got["longest_page"] == golden["longest_page"]
    assert got["subdomains"] == golden["subdomains"]
    assert got["top_words"] == golden["top_words"]
