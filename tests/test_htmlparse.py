"""Parser tests: span round-trip vs the generator model, stats/flags,
outlink gates, and XML sniffing vs reference semantics."""

from __future__ import annotations

from spacetime_crawler4py_spark.functions.htmlparse import (
    looks_like_xml,
    parse_page,
)
from spacetime_crawler4py_spark.sources.webgen import (
    generate_web,
    render_html,
)


def test_span_roundtrip_on_generated_web():
    """parse(render(spans)) == spans for every normal page (FIXTURES.md §2:
    the fixture owns spans, HTML is derived; divergence is an engine bug)."""
    web = generate_web(n_pages=200, seed=42)
    checked = 0
    for url, spec in web.pages.items():
        if spec.kind != "normal" or spec.status != 200:
            continue
        parsed = parse_page(spec.payload, base_url=spec.final_url or spec.url)
        got = [(s.kind, s.text, s.media_ref) for s in parsed.spans]
        expected = [
            (k, t, r) for (k, t, r) in spec.spans
        ]
        assert got == expected, (url, got[:4], expected[:4])
        assert [s.offset for s in parsed.spans] == list(range(len(parsed.spans)))
        checked += 1
    assert checked > 100


def test_outlink_junk_gates():
    spans = [
        ("text", "hello world content here", None),
        ("link", "ok", "https://www.ics.uci.edu/a"),
        ("link", "dup", "https://www.ics.uci.edu/a"),  # first occurrence wins
        ("link", "frag", "https://www.ics.uci.edu/b#sec"),
    ]
    payload = render_html(
        spans,
        junk_hrefs=[
            "javascript:void(0)", "mailto:x@y", "#top", "tel:1", "data:x",
            "/br[ack]et", "",
        ],
    )
    page = parse_page(payload, base_url="https://www.ics.uci.edu/base")
    assert page.outlinks == [
        "https://www.ics.uci.edu/a",
        "https://www.ics.uci.edu/b",  # defragmented
    ]
    # junk anchors still count toward a_count only when href present & non-None
    assert page.a_count >= 3


def test_relative_href_resolution():
    spans = [("link", "rel", "https://www.ics.uci.edu/sub/dir")]
    payload = render_html(spans, relative_href_base="https://www.ics.uci.edu")
    page = parse_page(payload, base_url="https://www.ics.uci.edu/base/page")
    assert page.outlinks == ["https://www.ics.uci.edu/sub/dir"]


def test_soft404_and_login_flags():
    p404 = parse_page(
        render_html([("text", "short", None)], title="404 Not Found", soft404=True),
        base_url="https://x.ics.uci.edu/",
    )
    assert p404.soft404 is True

    plogin = parse_page(
        render_html([("text", "body", None)], login=True),
        base_url="https://x.ics.uci.edu/",
    )
    assert plogin.login_wall is True

    pok = parse_page(
        render_html([("text", "regular content words", None)], title="Fine"),
        base_url="https://x.ics.uci.edu/",
    )
    assert pok.soft404 is False and pok.login_wall is False


def test_link_farm_heuristic():
    # a_count > 120 and word_count < 80 -> soft404 (reference scraper.py:182-183)
    # NB word_count includes anchor text, so a true link farm has empty anchors
    spans = [("link", "", f"https://www.ics.uci.edu/p{i}") for i in range(130)]
    page = parse_page(render_html(spans), base_url="https://www.ics.uci.edu/")
    assert page.soft404 is True


def test_word_count_includes_anchor_text():
    spans = [
        ("text", "alpha beta", None),
        ("link", "gamma delta", "https://www.ics.uci.edu/x"),
    ]
    page = parse_page(render_html(spans), base_url="https://www.ics.uci.edu/")
    # get_text includes anchor text AND title text (scraper.py:145-147):
    # "Page" + "alpha beta" + "gamma delta" = 5 words
    assert page.word_count == 5


def test_script_style_decomposed():
    page = parse_page(
        render_html([("text", "visible", None)]),
        base_url="https://www.ics.uci.edu/",
    )
    assert "IGNORED" not in page.page_text
    assert "visible" in page.page_text


def test_xml_sniff_matches_reference_rule():
    assert looks_like_xml(b'<?xml version="1.0"?><rss/>')
    assert looks_like_xml(b"  \n<rss><channel/></rss>")
    assert looks_like_xml(b"<feed xmlns=...>")
    assert looks_like_xml(b"<html><urlset></html>")
    assert not looks_like_xml(b"<html><body>hi</body></html>")


def test_comment_end_bang_closes_comment():
    """HTML5 comment-end-bang: '<!-- ... --!>' terminates the comment, so
    content after it must stay visible (the real-crawl 518-token case)."""
    page = parse_page(
        b"<html><body><p>before</p><!-- hidden --!><p>after words</p>"
        b"</body></html>",
        base_url="https://www.ics.uci.edu/",
    )
    assert "after words" in page.page_text
    assert "hidden" not in page.page_text


def test_literal_end_bang_outside_comment_preserved():
    """The normalization is comment-scoped: a literal '--!>' in visible
    text must survive into the stored span text unchanged (ADVICE r2)."""
    page = parse_page(
        b"<html><body><p>op is --!&gt; here</p>"
        b"<p>raw --!> token</p></body></html>",
        base_url="https://www.ics.uci.edu/",
    )
    assert "--!>" in page.page_text
    assert "-->" not in page.page_text


def test_end_bang_after_closed_comment_is_text():
    """A '--!>' appearing after a properly closed comment is outside any
    comment and must not be rewritten."""
    page = parse_page(
        b"<html><body><!-- a --> tail --!> text</body></html>",
        base_url="https://www.ics.uci.edu/",
    )
    assert "--!>" in page.page_text
