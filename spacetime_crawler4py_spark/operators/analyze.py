"""The reference's crawl-analysis report over raw saved HTML
(reference analyze_crawl.py:153-277) — the analytics entry point that
re-parses pages with the *analyzer-variant* extractor (strips hidden
elements and nav/footer/header chrome, analyze_crawl.py:65-80) rather
than reading the engine's span documents.

Pipeline: (url, payload) -> one Arrow stage extracting text + tokens ->
relational aggregations. The per-page parse is the only Python (it is the
reference's parser semantics, inherently imperative); everything after —
thin-page gate, stopword filter, top-k, histograms — is JVM-side."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.htmlparse import extract_analyzer_text
from ..functions.tokenize import NOISE_WORDS, STOPWORDS, report_tokens

__all__ = [
    "analyze_pages",
    "unique_pages_count",
    "subdomain_counts",
    "longest_page",
    "top_words",
    "golden_report",
]

_TOKENS_SCHEMA = "url string, word_count long, tokens array<string>"


def analyze_pages(pages: DataFrame) -> DataFrame:
    """(url, payload) -> (url, word_count, tokens): analyzer-variant text
    extraction + report tokenization in one Arrow batch stage."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, wcs, toks = [], [], []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                text = extract_analyzer_text(payload)
                tokens = report_tokens(text)
                urls.append(row.url)
                wcs.append(len(tokens))
                toks.append(tokens)
            yield pd.DataFrame({"url": urls, "word_count": wcs, "tokens": toks})

    n_parts = pages.sparkSession.sparkContext.defaultParallelism
    return (
        pages.select("url", "payload")
        .repartition(n_parts)
        .mapInPandas(stage, schema=_TOKENS_SCHEMA)
    )


def _defrag(url_col) -> F.Column:
    """Fragment strip (analyze_crawl.py:46-52): everything before '#'."""
    return F.substring_index(url_col, "#", 1)


def unique_pages_count(urls: DataFrame) -> DataFrame:
    """count(distinct defragmented url) (analyze_crawl.py:186-191)."""
    return urls.select(
        F.countDistinct(_defrag(F.col("url"))).cast("long").alias("unique_pages")
    )


def subdomain_counts(urls: DataFrame, suffix: str = ".uci.edu") -> DataFrame:
    """Per-host page counts over unique defragmented URLs
    (analyze_crawl.py:193-201), alphabetical. Host extraction uses
    urlsplit().hostname semantics (lowercased, port-stripped, tolerant of
    raw spaces in queries — Spark's parse_url rejects those URLs outright,
    the reference counts them)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def host_of(u: pd.Series) -> pd.Series:
        from urllib.parse import urlsplit

        def h(x):
            try:
                return urlsplit(x).hostname or ""
            except Exception:
                return ""

        return u.map(h)

    hosts = (
        urls.select(_defrag(F.col("url")).alias("u"))
        .distinct()
        .select(host_of(F.col("u")).alias("host"))
    )
    return (
        hosts.where(F.col("host").endswith(suffix))
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .orderBy("host")
    )


def longest_page(analyzed: DataFrame) -> DataFrame:
    """Max word_count over pages passing the >=20-token thin-page gate
    (analyze_crawl.py:227-235).

    Tie-break: url ascending — a DOCUMENTED determinism choice, not
    reference parity. The reference keeps the first page in manifest
    iteration order ('>' comparison); on a tie this can pick a different
    url. The golden corpus has a unique maximum, so the golden test is
    unaffected; if exact tie parity ever matters, carry the manifest row
    index as the tie-break key instead."""
    return (
        analyzed.where(F.col("word_count") >= 20)
        .orderBy(F.desc("word_count"), F.asc("url"))
        .select("url", "word_count")
        .limit(1)
    )


def top_words(analyzed: DataFrame, k: int = 50) -> DataFrame:
    """Top-k words after stopword+noise filtering over non-thin pages
    (analyze_crawl.py:237-244).

    Tie-break: count desc, then word ascending — a DOCUMENTED determinism
    choice. The reference's Counter.most_common keeps first-inserted order
    on equal counts, which depends on page iteration order; alphabetical
    is stable under any partitioning. Rank-k boundary ties can therefore
    admit a different word than the reference; equal-count sets are
    identical."""
    stop = sorted(STOPWORDS | NOISE_WORDS)
    return (
        analyzed.where(F.col("word_count") >= 20)
        .select(F.explode("tokens").alias("word"))
        .where(~F.col("word").isin(*stop))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(k)
    )


def golden_report(
    url_pairs: DataFrame, analyzed: DataFrame, k: int = 50
) -> dict:
    """The full report dict in the reference's report.json shape."""
    uniq = unique_pages_count(url_pairs).collect()[0].unique_pages
    subs = subdomain_counts(url_pairs).collect()
    lng = longest_page(analyzed).collect()
    top = top_words(analyzed, k).collect()
    return {
        "unique_pages": int(uniq),
        "longest_page": {
            "url": lng[0].url if lng else None,
            "word_count": int(lng[0].word_count) if lng else -1,
        },
        "top_words": [[r.word, int(r.cnt)] for r in top],
        "subdomains": [[r.host, int(r.cnt)] for r in subs],
    }
