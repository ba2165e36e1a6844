"""Sitemap ingestion — the seed-discovery source a production crawl runs
before (and alongside) link extraction: fetch ``/sitemap.xml`` payloads,
expand sitemap *indexes* into their child sitemaps, and turn ``urlset``
entries into frontier candidates carrying the publication metadata
(lastmod / changefreq / priority) that drives recrawl scheduling.

The reference crawler has no sitemap support (its frontier is seeded by
a static list, ref ``crawler/frontier.py``); this source is the
north-star completion of the crawl tier — real sites advertise most of
their long-tail URLs only here.

Parsing is JVM-side regex over the XML text (``regexp_extract_all`` on
``<loc>`` blocks, per-entry field extraction), not a DOM parse: sitemap
files are machine-generated, schema-fixed, and capped at 50k entries /
50 MB by the protocol, so tag-level extraction is both safe and the
only shape that runs as a scan-level projection at fleet scale — no
Python workers, no driver XML trees. Entity-decoding of the five XML
escapes and CDATA unwrapping are applied to ``loc`` (the protocol
requires URLs be entity-escaped).

Scale shape: one DataFrame of (host, payload) in, one explode out;
index expansion is a self-union driven by the ``kind`` column, not a
driver loop. Everything whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decode_sitemap_payloads",
    "parse_sitemap_entries",
    "expand_sitemap_index",
    "sitemap_frontier_candidates",
]


def decode_sitemap_payloads(
    payloads: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
) -> DataFrame:
    """Fetched-payload decode stage: binary bodies -> (host, xml) text for
    :func:`parse_sitemap_entries`. Gzipped sitemaps (``sitemap.xml.gz``)
    are ubiquitous in the wild — the protocol explicitly allows them and
    most large sites ship nothing else — so the decode sniffs the gzip
    magic (1f 8b) per row and decompresses before the UTF-8 decode; plain
    payloads pass through. Truncated/corrupt gzip bodies decode to NULL
    xml (dropped downstream by the loc != '' gate) instead of failing the
    batch. Runs as an Arrow-batched kernel (Spark has no SQL gunzip);
    zlib is C, so per-element cost is the decompression itself."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def gunzip_text(body):
        import gzip

        out = []
        for b in body:
            if b is None:
                out.append(None)
                continue
            raw = bytes(b)
            if len(raw) >= 2 and raw[0] == 0x1F and raw[1] == 0x8B:
                try:
                    raw = gzip.decompress(raw)
                except (OSError, EOFError):
                    out.append(None)
                    continue
            out.append(raw.decode("utf-8", "replace"))
        return pd.Series(out, dtype=object)

    return payloads.select(
        F.col(host_col).alias("host"),
        gunzip_text(F.col(payload_col)).alias("xml"),
    )

# one <url>...</url> or <sitemap>...</sitemap> block per entry
_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"
_LOC = r"(?s)<loc\b[^>]*>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod\b[^>]*>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq\b[^>]*>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority\b[^>]*>\s*(.*?)\s*</priority>"


def _xml_unescape(c: Column) -> Column:
    """XML text decoding: a CDATA section's content is LITERAL (wrapper
    stripped, nothing decoded — xml.etree agrees); plain text gets the
    five entity replacements, &amp; last so '&amp;lt;' decodes to
    '&lt;' not '<'."""
    is_cdata = c.rlike(r"(?s)^<!\[CDATA\[.*\]\]>$")
    literal = F.regexp_replace(c, r"(?s)^<!\[CDATA\[(.*)\]\]>$", r"$1")
    decoded = c
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")]:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.when(is_cdata, literal).otherwise(decoded)


def parse_sitemap_entries(
    payloads: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """Explode sitemap payloads into entries.

    Output: (host, kind, loc, lastmod, changefreq, priority_milli) —
    ``kind`` is 'url' for urlset entries and 'sitemap' for index
    entries; priority is floored integer milli (protocol default 0.5 →
    500 when the tag is absent)."""
    def entries(block_re: str, kind: str) -> DataFrame:
        block = F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(block_re), F.lit(1))
        ).alias("entry")
        e = payloads.select(F.col(host_col).alias("host"), block)
        loc = _xml_unescape(F.regexp_extract(F.col("entry"), _LOC, 1))
        pr = F.regexp_extract(F.col("entry"), _PRIORITY, 1)
        return e.select(
            "host",
            F.lit(kind).alias("kind"),
            loc.alias("loc"),
            F.nullif(
                F.regexp_extract(F.col("entry"), _LASTMOD, 1), F.lit("")
            ).alias("lastmod"),
            F.nullif(
                F.regexp_extract(F.col("entry"), _CHANGEFREQ, 1), F.lit("")
            ).alias("changefreq"),
            F.when(pr == "", F.lit(500))
            .otherwise(F.floor(pr.cast("double") * 1000))
            .cast("long")
            .alias("priority_milli"),
        ).where(F.col("loc") != "")

    return entries(_URL_BLOCK, "url").unionByName(
        entries(_SITEMAP_BLOCK, "sitemap")
    )


def expand_sitemap_index(
    entries: DataFrame, child_payloads: DataFrame,
    loc_col: str = "loc", xml_col: str = "xml",
) -> DataFrame:
    """One level of sitemap-index expansion: join 'sitemap' entries with
    their fetched child payloads (by loc) and parse those. The protocol
    forbids index-of-index nesting beyond what a fixed number of
    repeated calls covers; each call is one fetch round, matching how
    the crawl engine batches fetches per epoch."""
    children = entries.where(F.col("kind") == "sitemap").select(
        F.col(loc_col).alias("_loc"), "host"
    )
    # project the payload side down to (loc, xml) before joining: the
    # natural fetched-payload shape carries its own host column, which
    # would make the post-join 'host' reference ambiguous — the index
    # entry's host is the one we keep
    payloads = child_payloads.select(
        F.col(loc_col).alias("_loc"), F.col(xml_col)
    )
    fetched = children.join(payloads, "_loc").select("host", xml_col)
    return parse_sitemap_entries(fetched, "host", xml_col)


def sitemap_frontier_candidates(entries: DataFrame) -> DataFrame:
    """URL entries as frontier candidates, deduped per (host, loc) with
    the freshest lastmod and highest priority kept — map-side combinable
    aggregation, no window."""
    return (
        entries.where(F.col("kind") == "url")
        .groupBy("host", F.col("loc").alias("url"))
        .agg(
            F.max("lastmod").alias("lastmod"),
            F.max("priority_milli").alias("priority_milli"),
        )
    )
