"""The crawl analytics report (reference analyze_crawl.py:153-277) over the
engine's documents table (doc_id + span array), as four DataFrame queries
emitting exactly the reference's report.json shape.

Text is reconstructed from the span sequence (text + anchor spans in
offset order — the visible-text definition of the span model; the
reference re-parses saved HTML instead, analyze_crawl.py:216-225)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import NOISE_WORDS, STOPWORDS
from .textstats import report_tokens_col

__all__ = [
    "doc_text_col",
    "report_unique_pages",
    "report_longest_page",
    "report_top_words",
    "report_subdomains",
    "crawl_report",
]


def doc_text_col() -> F.Column:
    """Visible text from the span array: text/link span texts joined in
    offset order (media refs excluded from tokenization, SURVEY §7)."""
    visible = F.filter(
        F.col("spans"),
        lambda s: s["kind"].isin("text", "link") & s["text"].isNotNull(),
    )
    return F.array_join(F.transform(visible, lambda s: s["text"]), " ")


def _tokens_df(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", report_tokens_col(doc_text_col()).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))


def report_unique_pages(docs: DataFrame) -> DataFrame:
    # URL dedup ignoring fragments (analyze_crawl.py:186-191); doc_id is
    # already fragment-free
    return docs.select(
        F.countDistinct("doc_id").cast("long").alias("unique_pages")
    )


def report_longest_page(docs: DataFrame) -> DataFrame:
    """Longest page by token count with the >=20-token thin-page gate
    (analyze_crawl.py:227-235); deterministic doc_id tie-break."""
    t = _tokens_df(docs).where(F.col("n_tokens") >= 20)
    return (
        t.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .select(F.col("doc_id").alias("url"), F.col("n_tokens").alias("word_count"))
        .limit(1)
    )


def report_top_words(docs: DataFrame, k: int = 50) -> DataFrame:
    """Top-k words after stopword+noise filtering (analyze_crawl.py:237-244);
    thin pages excluded per the same gate. Deterministic (count desc, word
    asc) tie-break; Catalyst plans this as partial hash-agg + top-k."""
    t = _tokens_df(docs).where(F.col("n_tokens") >= 20)
    stop = STOPWORDS | NOISE_WORDS
    return (
        t.select(F.explode("tokens").alias("word"))
        .where(~F.col("word").isin(*sorted(stop)))
        .groupBy("word")
        .count()
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(k)
    )


def report_subdomains(docs: DataFrame, suffix: str = ".uci.edu") -> DataFrame:
    """Subdomain histogram over unique pages (analyze_crawl.py:193-201),
    alphabetical."""
    hosts = docs.select(
        F.lower(F.parse_url(F.col("doc_id"), F.lit("HOST"))).alias("host")
    )
    return (
        hosts.where(F.col("host").endswith(suffix))
        .groupBy("host")
        .count()
        .orderBy("host")
    )


def crawl_report(docs: DataFrame, k: int = 50) -> dict:
    """Collect the full report dict in the reference's report.json shape."""
    unique_pages = report_unique_pages(docs).collect()[0].unique_pages
    longest = report_longest_page(docs).collect()
    top = report_top_words(docs, k).collect()
    subs = report_subdomains(docs).collect()
    return {
        "unique_pages": int(unique_pages),
        "longest_page": {
            "url": longest[0].url if longest else None,
            "word_count": int(longest[0].word_count) if longest else -1,
        },
        "top_words": [[r.word, int(r["count"])] for r in top],
        "subdomains": [[r.host, int(r["count"])] for r in subs],
    }
