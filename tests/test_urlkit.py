"""Differential tests: URL kernel vs the reference implementation."""

from __future__ import annotations

from spacetime_crawler4py_spark.functions import urlkit

from urlcorpus import ADVERSARIAL_URLS


def test_defragment_matches_reference(reference):
    for u in ADVERSARIAL_URLS:
        assert urlkit.defragment(u) == reference.scraper._norm_url_no_fragment(u), u


def test_normalize_matches_reference(reference):
    extra = ["http://x/", "http://x//", "http://x", "a/", ""]
    for u in ADVERSARIAL_URLS + extra:
        assert urlkit.normalize(u) == reference.utils.normalize(u), u


def test_url_hash_matches_reference(reference):
    for u in ADVERSARIAL_URLS:
        try:
            expected = reference.utils.get_urlhash(u)
        except ValueError:
            continue  # reference raises on unparseable URLs before hashing
        assert urlkit.url_hash(u) == expected, u


def test_scheme_folding_identity():
    # http/https variants collide (reference utils/__init__.py:25-30)
    assert urlkit.url_hash("http://www.ics.uci.edu/a") == urlkit.url_hash(
        "https://www.ics.uci.edu/a"
    )
    assert urlkit.url_hash("https://www.ics.uci.edu/a") != urlkit.url_hash(
        "https://www.ics.uci.edu/b"
    )


def test_politeness_host_is_full_netloc():
    assert urlkit.politeness_host("https://sub.ics.uci.edu:8080/x") == "sub.ics.uci.edu:8080"
    assert urlkit.politeness_host("https://WWW.ics.uci.edu/x") == "WWW.ics.uci.edu"


def test_vectorized_matches_scalar():
    import pandas as pd

    s = pd.Series(ADVERSARIAL_URLS)
    assert list(urlkit.canonicalize_series(s)) == [
        urlkit.canonicalize(u) for u in ADVERSARIAL_URLS
    ]
    hashable = [u for u in ADVERSARIAL_URLS]
    out = urlkit.url_hash_series(pd.Series(hashable))
    assert list(out) == [urlkit.url_hash(u) for u in hashable]
