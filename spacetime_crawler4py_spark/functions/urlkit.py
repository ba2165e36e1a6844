"""URL canonicalization kernel.

Reproduces, bit-for-bit, the URL identity rules of the reference crawler
(parity is required by BASELINE.json's north_rule; each function cites the
reference behavior it mirrors):

* ``defragment``   — strip only the #fragment        (reference scraper.py:16-23)
* ``normalize``    — drop trailing '/' runs           (reference utils/__init__.py:32-35)
* ``url_hash``     — sha256 over everything BUT the scheme, so http/https
                     variants of one URL collide in the seen set
                     (reference utils/__init__.py:25-30)
* ``politeness_host`` — full netloc, the politeness key (reference crawler/frontier.py:113)
* ``validity_host``   — lowercased hostname, trailing dots stripped
                     (reference scraper.py:285)

Each kernel is a plain-Python single-value function (unit-testable against
the reference directly) plus a vectorized pandas transform used from Arrow
UDFs / mapInPandas — no per-row Python UDFs in the hot path.
"""

from __future__ import annotations

from hashlib import sha256
from urllib.parse import urljoin, urlparse, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql.types import StringType
from pyspark.sql.pandas.functions import pandas_udf

__all__ = [
    "defragment",
    "normalize",
    "canonicalize",
    "url_hash",
    "politeness_host",
    "validity_host",
    "resolve",
    "defragment_series",
    "normalize_series",
    "canonicalize_series",
    "url_hash_series",
    "politeness_host_series",
    "udf_defragment",
    "udf_normalize",
    "udf_canonicalize",
    "udf_url_hash",
    "udf_politeness_host",
]


# ---------------------------------------------------------------------------
# scalar kernels
# ---------------------------------------------------------------------------

def defragment(url: str) -> str:
    """Strip only the fragment, keeping scheme/host/path/query intact.

    Mirrors reference scraper.py:16-23 (_norm_url_no_fragment), including
    the swallow-errors fallback to the raw input.
    """
    try:
        p = urlsplit(url)
        return urlunsplit((p.scheme, p.netloc, p.path, p.query, ""))
    except (ValueError, AttributeError):
        return url


def normalize(url: str) -> str:
    """Drop trailing slash(es). Mirrors reference utils/__init__.py:32-35:
    the reference guards with ``endswith('/')`` then calls ``rstrip('/')``,
    which removes *all* trailing slashes — reproduce exactly that."""
    if url.endswith("/"):
        return url.rstrip("/")
    return url


def canonicalize(url: str) -> str:
    """normalize∘defragment — the form stored in the frontier."""
    return normalize(defragment(url))


def url_hash(url: str) -> str:
    """The URL-seen identity: sha256 of "{netloc}/{path}/{params}/{query}/{fragment}".

    The scheme is deliberately omitted (reference utils/__init__.py:25-30),
    so http:// and https:// variants of the same URL share one hash and the
    first-enqueued string wins (reference crawler/frontier.py:93-95).
    """
    p = urlparse(url)
    key = f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}"
    return sha256(key.encode("utf-8")).hexdigest()


def politeness_host(url: str) -> str:
    """Full netloc — the per-domain rate-limit key (reference crawler/frontier.py:113).
    Note: the reference keys politeness by the *exact* netloc (subdomain
    included, port included, case preserved); preserved for ordering parity."""
    try:
        return urlparse(url).netloc
    except ValueError:
        return ""


def validity_host(url: str) -> str:
    """Lowercased hostname with trailing dots stripped — the host used by
    the is_valid allowlist (reference scraper.py:285)."""
    try:
        return (urlparse(url).hostname or "").rstrip(".").lower()
    except ValueError:
        return ""


def resolve(base: str, href: str) -> str:
    """Absolute-URL resolution for an anchor href (reference scraper.py:266)."""
    return urljoin(base, href)


# ---------------------------------------------------------------------------
# vectorized (pandas) transforms — used inside Arrow UDFs and mapInPandas
# ---------------------------------------------------------------------------

def defragment_series(urls: pd.Series) -> pd.Series:
    return urls.map(defragment, na_action="ignore")


def normalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(normalize, na_action="ignore")


def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize, na_action="ignore")


def url_hash_series(urls: pd.Series) -> pd.Series:
    return urls.map(url_hash, na_action="ignore")


def politeness_host_series(urls: pd.Series) -> pd.Series:
    return urls.map(politeness_host, na_action="ignore")


# ---------------------------------------------------------------------------
# Spark column UDFs (Arrow-batched)
# ---------------------------------------------------------------------------

udf_defragment = pandas_udf(defragment_series, returnType=StringType())
udf_normalize = pandas_udf(normalize_series, returnType=StringType())
udf_canonicalize = pandas_udf(canonicalize_series, returnType=StringType())
udf_url_hash = pandas_udf(url_hash_series, returnType=StringType())
udf_politeness_host = pandas_udf(politeness_host_series, returnType=StringType())
