"""Differential tests: is_valid vs the reference filter (scraper.py:276-384)."""

from __future__ import annotations

import random

from spacetime_crawler4py_spark.functions.validity import is_valid, is_valid_series

from urlcorpus import ADVERSARIAL_URLS


def test_is_valid_matches_reference_on_corpus(reference):
    mismatches = [
        (u, is_valid(u), reference.scraper.is_valid(u))
        for u in ADVERSARIAL_URLS
        if is_valid(u) != reference.scraper.is_valid(u)
    ]
    assert not mismatches, mismatches


def test_is_valid_matches_reference_randomized(reference):
    """Seeded fuzz over recombined URL pieces — broad branch coverage."""
    rng = random.Random(42)
    schemes = ["http", "https", "ftp"]
    hosts = [
        "www.ics.uci.edu", "ics.uci.edu", "cs.uci.edu", "www.cs.uci.edu",
        "informatics.uci.edu", "stat.uci.edu", "wics.ics.uci.edu",
        "grape.ics.uci.edu", "mailman.ics.uci.edu", "mlphysics.ics.uci.edu",
        "instdav.ics.uci.edu", "swiki.ics.uci.edu", "example.com",
        "evil-ics.uci.edu.attacker.net",
    ]
    path_bits = [
        "", "/", "/a", "/events/day/2020-01-01", "/events/x/page/4/",
        "/file.pdf", "/file.html", "/~eppstein/pix/a", "/~wscacchi/gamelab",
        "/doku.php", "/calendar", "/gallery", "/page/250/", "/data/x",
        "/asterix/y", "/a/b/a/b/a/b", "/" + "/".join(["s"] * 21),
        "/img_999/", "/wp-json", "/feedme", "/readme-notes", "/x" * 40,
    ]
    queries = [
        "", "?page=1000", "?page=9", "?C=N;O=A", "?file=a.pdf", "?ical=3",
        "?do=media", "?tribe-bar-date=2020-01-02", "?eventDisplay=list",
        "?action=edit", "?share=x", "?q=" + "z" * 700, "?replytocom=1",
    ]
    urls = []
    for _ in range(4000):
        urls.append(
            rng.choice(schemes)
            + "://"
            + rng.choice(hosts)
            + rng.choice(path_bits)
            + rng.choice(queries)
        )
    mismatches = [
        (u, is_valid(u), reference.scraper.is_valid(u))
        for u in urls
        if is_valid(u) != reference.scraper.is_valid(u)
    ]
    assert not mismatches, mismatches[:10]


def test_vectorized_matches_scalar():
    import pandas as pd

    s = pd.Series(ADVERSARIAL_URLS + [None])
    out = list(is_valid_series(s))
    assert out[:-1] == [is_valid(u) for u in ADVERSARIAL_URLS]
    assert out[-1] is False or out[-1] == False  # noqa: E712 - None maps to False
