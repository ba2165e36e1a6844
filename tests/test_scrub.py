"""PII scrub (operators/scrub.py): hand cases, Python-re differential
(same pattern strings, third engine), idempotence."""

from __future__ import annotations

import re

from spacetime_crawler4py_spark.operators.scrub import PII_PATTERNS, scrub_pii

CASES = [
    (0, "reach me at jane.doe+spam@sub.example.co.uk or on 555-123-4567."),
    (1, "server 192.168.0.1 and 10.0.0.255, backup at 8.8.8.8"),
    (2, "no pii here, just words and numbers 12345 and 1.5 ratios"),
    (3, "mixed: bob@x.io, 555.867.5309, 127.0.0.1 (all three)"),
    (4, "edge: a@b.co end-of-string 999.999.999.999"),
    (5, ""),
    (6, "not-an-email @@ not@tld phone 12-345-6789 ip 1.2.3"),
]


def _py_scrub(text: str) -> tuple[str, list[int]]:
    counts = [len(re.findall(pat, text)) for _n, pat, _r in PII_PATTERNS]
    out = text
    for _n, pat, repl in PII_PATTERNS:
        out = re.sub(pat, repl, out)
    return out, counts


def test_scrub_matches_python_re(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r.id: r for r in scrub_pii(df, "doc_id", "text").collect()}
    for doc_id, text in CASES:
        want_text, (n_email, n_phone, n_ipv4) = _py_scrub(text)
        r = got[doc_id]
        assert r.scrubbed == want_text, (doc_id, r.scrubbed, want_text)
        assert (r.n_email, r.n_phone, r.n_ipv4) == (n_email, n_phone, n_ipv4)
        assert r.scrubbed_len == len(want_text)


def test_scrub_specific_semantics(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r.id: r for r in scrub_pii(df, "doc_id", "text").collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1
    assert "<EMAIL>" in got[0].scrubbed and "<PHONE>" in got[0].scrubbed
    assert "jane" not in got[0].scrubbed
    assert got[1].n_ipv4 == 3 and got[1].scrubbed.count("<IP>") == 3
    assert got[2].scrubbed == CASES[2][1]  # untouched
    assert got[3].n_email == got[3].n_phone == 1 and got[3].n_ipv4 == 1
    # conservative over-redaction: an out-of-range dotted quad still scrubs
    assert got[4].n_ipv4 == 1
    # 2-3-4 digit grouping is not a phone; 3-group dots are not an IPv4
    assert got[6].n_phone == 0 and got[6].n_ipv4 == 0 and got[6].n_email == 0


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    once = scrub_pii(df, "doc_id", "text")
    twice = scrub_pii(
        once.select("id", "scrubbed"), "id", "scrubbed"
    ).collect()
    for r in twice:
        assert r.n_email == r.n_phone == r.n_ipv4 == 0
