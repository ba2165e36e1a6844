"""The crawl-scope URL filter (``is_valid``).

A from-scratch reimplementation of the reference's 20-rule, order-sensitive
URL filter (reference scraper.py:276-384). Rule-for-rule parity is verified
by differential tests (tests/test_validity.py) that import the reference
module itself as the oracle. The rules are deliberately kept in one
procedural kernel rather than translated to Catalyst expressions: the filter
is the crawl's *identity* function, exceptions must map to False
(reference scraper.py:381-384), and several rules (repeating path segments)
are inherently procedural. It runs vectorized via an Arrow pandas UDF —
regexes compile once per executor at import, each batch is a tight loop
over an Arrow column, no per-row Python UDF dispatch.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql.types import BooleanType
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["is_valid", "is_valid_series", "udf_is_valid", "ALLOWED_DOMAINS"]

# Scope allowlist: the four UCI domains (reference scraper.py:89-94).
ALLOWED_DOMAINS = (
    "ics.uci.edu",
    "cs.uci.edu",
    "informatics.uci.edu",
    "stat.uci.edu",
)

# Non-HTML file extensions rejected on the lowercased, trailing-slash-stripped
# path (reference scraper.py:61-69, checked at :294-296).
BLOCKED_EXTENSIONS = (
    ".css", ".js", ".bmp", ".gif", ".jpg", ".jpeg", ".ico", ".png", ".tif",
    ".tiff", ".psp", ".h5", ".java", ".seq", ".mid", ".mp2", ".mp3", ".mp4",
    ".wav", ".avi", ".mov", ".mpeg", ".ram", ".m4v", ".mkv", ".ogg", ".ogv",
    ".nb", ".pdf", ".ps", ".eps", ".tex", ".ppt", ".pptx", ".doc", ".docx",
    ".xls", ".xlsx", ".ppsx", ".bib", ".sdf", ".tsv", ".conf", ".names",
    ".data", ".dat", ".exe", ".bz2", ".tar", ".msi", ".bin", ".7z", ".psd",
    ".dmg", ".iso", ".mol", ".ismsmi", ".war", ".epub", ".dll", ".cnf",
    ".tgz", ".sha1", ".thmx", ".mso", ".arff", ".rtf", ".jar", ".csv",
    ".sql", ".target", ".fpkm", ".class", ".rm", ".smil", ".wmv", ".swf",
    ".wma", ".zip", ".rar", ".gz", ".ics", ".mpg", ".txt", ".apk", ".img",
    ".odp", ".ipynb", ".xml", ".sh", ".svg",
)

# Substring traps scanned over "path?query" (reference scraper.py:96-110,
# checked at :360-362).
TRAP_SUBSTRINGS = (
    "wp-json", "xmlrpc", "sitemap", "feed", "rss", "atom", "format=xml",
    "do=media", "tab=files", "media=", "image=", "file=", "attachment=",
    "format=pdf", "print=", "view=print", "preview=", "login", "register",
    "replytocom", "share=", "demo", "makefile", "readme",
)

# Precompiled patterns; names cite the reference rule they mirror.
_PAT_DATE_IN_PATH = re.compile(r"\d{4}[-/]\d{1,2}[-/]\d{1,2}")          # scraper.py:301
_PAT_YYYYMM_TAIL = re.compile(r"/20\d{2}-?(0[1-9]|1[0-2])/?$")          # scraper.py:304
_PAT_YYYY_SLASH_MM_TAIL = re.compile(r"/20\d{2}/(0[1-9]|1[0-2])/?$")    # scraper.py:304
_PAT_EVENTS_PAGINATION = re.compile(r"/events?/.*/page/\d+/?$")         # scraper.py:112
_PAT_TRIBE_DATE_QS = re.compile(r"(?:^|[?&])tribe-bar-date=\d{4}-\d{2}-\d{2}(?:&|$)")  # scraper.py:113
_PAT_EVENTDISPLAY_QS = re.compile(r"(?:^|[?&])eventDisplay=(?:upcoming|past|list|month|day)(?:&|$)")  # scraper.py:114
_PAT_MEDIA_FILE_PARAM = re.compile(                                     # scraper.py:116-119
    r"(?:^|[?&])(img|image|file|media|attachment|format)=[^&]+"
    r"\.(?:png|jpe?g|gif|svg|pdf|zip|rar|gz|mp4|mp3|avi|mov|pptx?|docx?|xlsx?|txt)",
    re.I,
)
_PAT_APACHE_AUTOINDEX = re.compile(                                     # scraper.py:121-123
    r"(?:^|[?&;])(?:c=(?:n|m|s|d)|o=(?:a|d)|f=\d+)(?:[;&]|$)", re.I
)
_PAT_ICAL_EXPORT = re.compile(r"(?:^|[?&;])(outlook-)?ical=\d+(?:[&;]|$)", re.I)  # scraper.py:125-127
_PAT_STATIC_CALENDAR = re.compile(r"/calendar(?:\.html?)?/?$")          # scraper.py:129
_PAT_STATIC_GALLERY = re.compile(r"/gallery(?:\.html?)?/?$")            # scraper.py:130
_PAT_WSCACCHI_BLOCK = re.compile(r"^/~wscacchi/(presentations|gamelab)(?:/|$)", re.I)  # scraper.py:132
_PAT_DATA_SEGMENT = re.compile(r"(?:^|/)data(?:/|$)", re.I)             # scraper.py:134
_PAT_DEEP_PATH_PAGINATION = re.compile(r"/(?:page|paged|pagenum|pagination)/\d{3,}/?$", re.I)  # scraper.py:136-138
_PAT_DEEP_QS_PAGINATION = re.compile(r"(^|[?&])(page|paged|pagenum|start|offset)=\d{3,}")  # scraper.py:365
_PAT_WICS_PHOTO_ID = re.compile(r"/\d{6,}(?:_[0-9a-f]{4,})+(?:_[a-z])?/?$")  # scraper.py:318
_PAT_WICS_IMG_SEG = re.compile(r"/(img|dsc|photo)[_-]?\d{3,}(/|$)")     # scraper.py:320
_PAT_WICS_DATED_SLUG = re.compile(r"/\d{2}(?:-\d{2}){1,2}-[a-z0-9-]+-\d{2,4}/?$")  # scraper.py:322


def _has_repeating_segments(segments: list[str]) -> bool:
    """Cycle detection over path segments, window 1..3, only for paths with
    >= 6 segments (reference scraper.py:368-373)."""
    n = len(segments)
    if n < 6:
        return False
    for width in range(1, min(4, n // 2 + 1)):
        reps = n // width
        if segments[:width] * reps == segments[: width * reps]:
            return True
    return False


def is_valid(url: str) -> bool:
    """Return True iff the crawler should fetch this URL.

    Order-sensitive composition of every rule in reference
    scraper.py:276-384; any exception yields False (:381-384).
    """
    try:
        parts = urlparse(url)
        if parts.scheme not in ("http", "https"):                       # :281-283
            return False

        host = (parts.hostname or "").rstrip(".").lower()               # :285
        in_scope = False
        for dom in ALLOWED_DOMAINS:                                     # :287-288
            if host == dom or host.endswith("." + dom):
                in_scope = True
                break
        if not in_scope:
            return False

        path = (parts.path or "").lower().rstrip("/")                   # :290
        query = (parts.query or "").lower()                             # :291
        path_and_query = f"{path}?{query}"                              # :292

        if path.endswith(BLOCKED_EXTENSIONS):                           # :294-296
            return False

        # Calendar / event listing traps                                # :298-308
        if "/events/" in path or "/event/" in path or "/calendar" in path:
            if (
                "/day/" in path
                or "/week/" in path
                or "/month/" in path
                or _PAT_DATE_IN_PATH.search(path)
            ):
                return False
            if _PAT_YYYYMM_TAIL.search(path) or _PAT_YYYY_SLASH_MM_TAIL.search(path):
                return False
            if (
                _PAT_EVENTS_PAGINATION.search(path)
                or _PAT_TRIBE_DATE_QS.search(query)
                or _PAT_EVENTDISPLAY_QS.search(query)
            ):
                return False

        if host == "www.ics.uci.edu" and path.startswith("/~eppstein/pix/"):  # :310-311
            return False

        if "doku.php" in path and (                                     # :313-315
            "do=" in query or "tab=" in query or "idx=" in query
        ):
            return False

        if host == "wics.ics.uci.edu":                                  # :317-323
            if _PAT_WICS_PHOTO_ID.search(path):
                return False
            if _PAT_WICS_IMG_SEG.search(path):
                return False
            if _PAT_WICS_DATED_SLUG.search(path):
                return False

        if _PAT_APACHE_AUTOINDEX.search(query):                         # :325-326
            return False
        if _PAT_MEDIA_FILE_PARAM.search(query):                         # :328-330
            return False
        if _PAT_ICAL_EXPORT.search(query):                              # :332-333
            return False
        if _PAT_STATIC_CALENDAR.search(path) or _PAT_STATIC_GALLERY.search(path):  # :335-336
            return False
        if host == "www.ics.uci.edu" and _PAT_WSCACCHI_BLOCK.search(path):  # :338-339
            return False
        if host == "mailman.ics.uci.edu":                               # :341-342
            return False
        if host == "instdav.ics.uci.edu":                               # :344-345
            return False
        if host == "mlphysics.ics.uci.edu" and _PAT_DATA_SEGMENT.search(path):  # :347-348
            return False

        if host == "grape.ics.uci.edu":                                 # :350-355
            grape_segs = [s for s in path.split("/") if s]
            if "asterix" in grape_segs or "timeline" in grape_segs:
                return False
            if "action=" in query or "format=" in query:
                return False

        if _PAT_DEEP_PATH_PAGINATION.search(path):                      # :357-358
            return False

        for trap in TRAP_SUBSTRINGS:                                    # :360-362
            if trap in path_and_query:
                return False

        if _PAT_DEEP_QS_PAGINATION.search(query):                       # :364-366
            return False

        segments = [s for s in path.split("/") if s]                    # :368-373
        if _has_repeating_segments(segments):
            return False

        if len(url) > 2048 or len(query) > 600 or len(segments) > 20:   # :375-377
            return False

        return True
    except Exception:                                                   # :381-384
        return False


def is_valid_series(urls: pd.Series) -> pd.Series:
    """Vectorized batch kernel; None/NaN map to False."""
    return urls.map(lambda u: is_valid(u) if isinstance(u, str) else False)


udf_is_valid = pandas_udf(is_valid_series, returnType=BooleanType())
