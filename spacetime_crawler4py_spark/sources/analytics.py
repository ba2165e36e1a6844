"""Analytics input sources — the four input shapes the reference's report
entry point accepts (reference analyze_crawl.py:89-151), as DataFrames:

* ``read_manifest``     — URL<TAB>local_html_path pairs (analyze_crawl.py:89-101)
* ``scan_pages_dir``    — recover (URL, path) from ``<!-- URL: ... -->``
                          headers in saved HTML (analyze_crawl.py:103-125)
* ``read_url_list``     — one URL per line (analyze_crawl.py:127-134)
* ``read_worker_logs``  — best-effort URL extraction from worker logs
                          (analyze_crawl.py:136-151)
* ``load_html_pages``   — join (url, path) pairs with file payloads via the
                          binaryFile source -> (url, payload)

All are plain DataFrame scans: the files distribute across executors, the
URL-recovery regex runs JVM-side, and nothing funnels through the driver.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_manifest",
    "scan_pages_dir",
    "read_url_list",
    "read_worker_logs",
    "load_html_pages",
]

# reference analyze_crawl.py:108 (case-insensitive URL hint comment)
_URL_HINT_RE = r"(?i)<!--\s*url\s*:\s*(.*?)\s*-->"

# reference analyze_crawl.py:137-140 (worker-log URL extraction)
_LOG_URL_RE = r"(?i)\b(?:Downloaded|Fetching|Fetched|Crawling|d)\s+(https?://[^\s,)\]]+)"


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """(url, path) pairs from a TSV/CSV manifest. Mirrors the reference's
    dialect sniff (tab if the head contains one, else comma) and its
    keep-if-both-nonempty rule."""
    with open(path, encoding="utf-8", errors="ignore") as f:
        sep = "\t" if "\t" in f.read(4096) else ","
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), sep)
    return (
        lines.select(
            F.trim(parts.getItem(0)).alias("url"),
            F.trim(parts.getItem(1)).alias("path"),
        )
        .where(
            F.col("url").isNotNull() & (F.col("url") != "")
            & F.col("path").isNotNull() & (F.col("path") != "")
        )
    )


def scan_pages_dir(spark: SparkSession, pages_dir: str) -> DataFrame:
    """(url, path) recovered from ``<!-- URL: ... -->`` in the head of each
    saved HTML file. The reference reads the first 8192 bytes; same here
    (a binary substring, so the scan never materializes full payloads)."""
    files = spark.read.format("binaryFile").load(
        os.path.join(pages_dir, "*")
    )
    # ISO-8859-1 decode is total (Spark 4's UTF-8 decode is strict, and the
    # 8KB cut can split a multibyte char) and byte-transparent, so the
    # JVM-side regex sees the exact bytes; the short matched URL is then
    # re-decoded as UTF-8 errors='ignore' — the reference's exact decode —
    # in a vectorized UDF (runs only on the ~100-byte matches, not payloads)
    head = F.decode(F.substring(F.col("content"), 1, 8192), "ISO-8859-1")

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def utf8_ignore(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: v.encode("ISO-8859-1", errors="ignore").decode(
                "utf-8", errors="ignore"
            )
        )

    return (
        files.where(
            F.lower(F.col("path")).endswith(".html")
            | F.lower(F.col("path")).endswith(".htm")
        )
        .select(
            F.regexp_extract(head, _URL_HINT_RE, 1).alias("_raw_url"),
            F.regexp_replace(F.col("path"), "^file:/+", "/").alias("path"),
        )
        .where(F.col("_raw_url") != "")
        .select(utf8_ignore(F.col("_raw_url")).alias("url"), "path")
    )


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    """One URL per line (blank lines dropped)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .where(F.col("url") != "")
    )


def read_worker_logs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """URLs scraped out of worker logs with the reference's best-effort
    pattern; missing files are skipped like the reference does."""
    existing = [p for p in paths if os.path.exists(p)]
    if not existing:
        return spark.createDataFrame([], "url string")
    lines = spark.read.text(existing)
    url = F.regexp_extract(F.col("value"), _LOG_URL_RE, 1)
    return lines.select(url.alias("url")).where(F.col("url") != "")


def load_html_pages(
    spark: SparkSession, pairs: DataFrame, base_dir: str
) -> DataFrame:
    """Join (url, path) pairs with file contents -> (url, payload).
    Relative manifest paths resolve against base_dir; the payload side is
    the distributed binaryFile source, joined on normalized absolute
    path."""
    abs_path = F.when(
        F.col("path").startswith("/"), F.col("path")
    ).otherwise(F.concat(F.lit(base_dir.rstrip("/") + "/"), F.col("path")))
    keyed = pairs.select("url", abs_path.alias("_abs"))
    # one listing of the distinct parent dirs keeps the source scan tight
    dirs = sorted(
        {os.path.dirname(r._abs) for r in keyed.select("_abs").distinct().collect()}
    )
    payloads = (
        spark.read.format("binaryFile")
        .load([os.path.join(d, "*") for d in dirs])
        .select(
            F.regexp_replace(F.col("path"), "^file:/+", "/").alias("_abs"),
            F.col("content").alias("payload"),
        )
    )
    return keyed.join(payloads, "_abs").select("url", "payload")
