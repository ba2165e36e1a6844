"""HTML → interleaved span-sequence parser (stdlib ``html.parser``).

Produces the ``input_hint`` document shape: an ordered array of
``(kind, text, media_ref, offset)`` spans — ``text`` spans are the visible
text segments after dropping script/style/noscript/svg subtrees (reference
scraper.py:225-226), ``link`` spans sit at anchor positions carrying the
absolute defragmented href (reference scraper.py:255-273), ``media`` spans
carry img/audio/video/source/embed refs (kept in documents, excluded from
tokenization — the reference drops media by URL extension instead,
scraper.py:61-69).

Also computes, in the same single pass, everything the reference's
per-page pipeline derives from the parse tree:

* page stats: word_count / a_count / title_norm  (reference scraper.py:144-151)
* soft-404 detection                             (reference scraper.py:164-185)
* login-wall detection                           (reference scraper.py:153-162)
* visible text for near-dup fingerprints         (reference scraper.py:241)
* ordered, first-occurrence-deduped outlinks     (reference scraper.py:255-273)

The container has no bs4, so this parser stands in for BeautifulSoup.
The synthetic-web fixture renders HTML *from* spans, so
``parse(render(spans)) == spans`` holds by construction and any divergence
is an engine bug (FIXTURES.md §2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

__all__ = [
    "Span",
    "ParsedPage",
    "parse_page",
    "looks_like_xml",
    "extract_analyzer_text",
    "GATE_OK",
]

# Subtrees removed before text extraction (reference scraper.py:225-226).
_SKIP_SUBTREES = {"script", "style", "noscript", "svg"}

# Media-bearing tags captured as 'media' spans.
_MEDIA_TAGS = {"img", "video", "audio", "source", "embed"}

# Error-page title/heading patterns (reference scraper.py:71-87).
_ERROR_PATTERNS = [
    re.compile(p)
    for p in (
        r"\b404\b",
        r"\bpage\s+not\s+found\b",
        r"\boops\b|\bwhoops\b",
        r"\bnot\s+found\b",
        r"\bdoesn?t?\s+exist\b",
        r"\bwe\s+are\s+having\s+trouble\s+locating\s+your\s+page\b",
        r"\bnothing\s+found\b",
        r"\bcontent\s+you\s+requested\s+could\s+not\s+be\s+found\b",
        r"\bforbidden\b",
        r"\berror\b",
        r"\brequested\s+url\s+was\s+not\s+found\b",
        r"\bthat\s+page\s+can\s*t\s+be\s+found\b",
        r"\bwe\s+can\s*t\s+seem\s+to\s+find\b",
    )
]

# CSS hooks for hard error pages (reference scraper.py:166).
_ERROR_CLASS_TOKENS = {"error-404", "page-404", "not-found", "page-not-found"}
_ERROR_ID_TOKENS = {"error404"}
_ERROR_BODY_CLASSES = {"error404"}

# Login-wall form action keywords (reference scraper.py:159).
_LOGIN_ACTION_WORDS = (
    "login", "signin", "sign-in", "webauth", "shibboleth", "cas", "saml", "oauth"
)

# Junk href prefixes/characters (reference scraper.py:261-264).
_JUNK_HREF_PREFIXES = ("javascript:", "mailto:", "tel:", "data:", "#")
_JUNK_HREF_CHARS = ("[", "]", "{", "}", "|", "\\")

_NON_ALNUM_RUN = re.compile(r"[^a-z0-9]+")


def _norm_alnum(text: str) -> str:
    """lowercase + collapse non-alphanumerics to single spaces + strip
    (the normalization used for word_count/title/heading matching,
    reference scraper.py:146,150,172)."""
    return _NON_ALNUM_RUN.sub(" ", (text or "").lower()).strip()


@dataclass
class Span:
    kind: str  # 'text' | 'link' | 'media'
    text: str | None
    media_ref: str | None
    offset: int


@dataclass
class ParsedPage:
    spans: list[Span] = field(default_factory=list)
    page_text: str = ""
    word_count: int = 0
    a_count: int = 0
    title_norm: str = ""
    soft404: bool = False
    login_wall: bool = False
    outlinks: list[str] = field(default_factory=list)


class _SpanHTMLParser(HTMLParser):
    """Single-pass tree-less extraction. Tracks a skip-depth for removed
    subtrees and an open-anchor state for link spans."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.spans: list[tuple[str, str | None, str | None]] = []
        self.text_chunks: list[str] = []  # visible text in document order
        self.anchor_href: str | None = None
        self.anchor_text: list[str] = []
        self.a_count = 0
        self.title_parts: list[str] = []
        self.in_title = False
        self.heading_parts: list[str] = []
        self.in_heading = False
        self.headings: list[str] = []
        self.meta_robots_flag = False
        self.login_flag = False
        self.css_error_flag = False

    # -- helpers ----------------------------------------------------------
    def _attr(self, attrs: list[tuple[str, str | None]], name: str) -> str | None:
        for k, v in attrs:
            if k == name:
                return v
        return None

    def _check_error_hooks(self, tag: str, attrs) -> None:
        classes = (self._attr(attrs, "class") or "").lower().split()
        elem_id = (self._attr(attrs, "id") or "").lower()
        if any(c in _ERROR_CLASS_TOKENS for c in classes):
            self.css_error_flag = True
        if elem_id in _ERROR_ID_TOKENS:
            self.css_error_flag = True
        if tag == "body" and any(c in _ERROR_BODY_CLASSES for c in classes):
            self.css_error_flag = True

    def _flush_anchor(self) -> None:
        if self.anchor_href is not None:
            text = " ".join(self.anchor_text).strip()
            self.spans.append(("link", text, self.anchor_href, None))
            self.anchor_href = None
            self.anchor_text = []

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self.skip_depth > 0:
            if tag in _SKIP_SUBTREES:
                self.skip_depth += 1
            return
        if tag in _SKIP_SUBTREES:
            self.skip_depth += 1
            return
        self._check_error_hooks(tag, attrs)
        if tag == "a":
            href = self._attr(attrs, "href")
            if href is not None:
                self.a_count += 1
                self._flush_anchor()
                self.anchor_href = href
        elif tag in _MEDIA_TAGS:
            src = self._attr(attrs, "src")
            if src:
                self.spans.append(("media", None, src, None))
        elif tag == "title":
            self.in_title = True
        elif tag in ("h1", "h2"):
            self.in_heading = True
            self.heading_parts = []
        elif tag == "meta":
            if (self._attr(attrs, "name") or "").lower() == "robots":
                content = (self._attr(attrs, "content") or "").lower()
                if "noindex" in content or "nofollow" in content:
                    self.meta_robots_flag = True
        elif tag == "form":
            action = (self._attr(attrs, "action") or "").lower()
            if any(w in action for w in _LOGIN_ACTION_WORDS):
                self.login_flag = True
        elif tag == "input":
            if (self._attr(attrs, "type") or "").lower() == "password":
                self.login_flag = True

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self.skip_depth > 0:
            return
        self._check_error_hooks(tag, attrs)
        if tag in _MEDIA_TAGS:
            src = self._attr(attrs, "src")
            if src:
                self.spans.append(("media", None, src, None))
        elif tag == "meta":
            if (self._attr(attrs, "name") or "").lower() == "robots":
                content = (self._attr(attrs, "content") or "").lower()
                if "noindex" in content or "nofollow" in content:
                    self.meta_robots_flag = True
        elif tag == "input":
            if (self._attr(attrs, "type") or "").lower() == "password":
                self.login_flag = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREES:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if self.skip_depth > 0:
            return
        if tag == "a":
            self._flush_anchor()
        elif tag == "title":
            self.in_title = False
        elif tag in ("h1", "h2"):
            if self.in_heading:
                self.headings.append(" ".join(self.heading_parts).strip())
            self.in_heading = False

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0:
            return
        stripped = data.strip()
        if not stripped:
            return
        self.text_chunks.append(stripped)
        if self.in_title:
            # title text is part of BS4's get_text (word_count parity,
            # reference scraper.py:145-147) but is head metadata, not a
            # body span
            self.title_parts.append(stripped)
            return
        if self.in_heading:
            self.heading_parts.append(stripped)
        if self.anchor_href is not None:
            self.anchor_text.append(stripped)
        else:
            self.spans.append(("text", stripped, None, None))

    def close(self) -> None:  # flush a dangling unclosed <a>
        super().close()
        self._flush_anchor()


# ---------------------------------------------------------------------------
# analyzer-variant text extraction (reference analyze_crawl.py:65-80)
# ---------------------------------------------------------------------------
# The *report* pipeline strips more than the scraper variant: besides
# script/style/noscript/svg it removes [hidden], [aria-hidden="true"],
# [style*="display:none"], [style*="visibility:hidden"] elements and all
# nav/footer/header subtrees before tokenizing. The reference does this
# with BeautifulSoup(lxml); this stand-in keeps an explicit element stack
# (with lxml-ish implied end tags) so subtree removal survives unclosed
# tags the way a tree builder's recovery does.

_ANALYZER_REMOVE_TAGS = {"script", "style", "noscript", "svg",
                         "nav", "footer", "header"}

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# When tag T opens, it implicitly closes the current element while that
# element is in _CLOSES[T] — a transposition of libxml2's htmlStartClose
# table (HTMLparser.c), because the reference's extractor is
# BeautifulSoup(lxml) and matching its recovery on unclosed tags is what
# keeps subtree removal (and therefore word counts) bit-compatible.
# Notably HTML5 sectioning tags (section/article/nav/header/footer/main)
# close NOTHING here: libxml2 predates them and nests them inside an open
# <p>, which matters when that <p> is hidden.
_H16 = {"h1", "h2", "h3", "h4", "h5", "h6"}
_CLOSES = {
    "form": {"form", "p", "hr", "dl", "ul", "ol", "menu", "dir",
             "address", "pre", "listing", "xmp", "head"} | _H16,
    "head": {"p"},
    "title": {"p"},
    "body": {"head", "style", "link", "meta", "script", "title", "p"},
    "frameset": {"head", "style", "link", "meta", "script", "title", "p"},
    "li": {"p", "dl", "address", "pre", "listing", "xmp", "head", "li"} | _H16,
    "hr": {"p", "head"},
    "h1": {"p", "head"}, "h2": {"p", "head"}, "h3": {"p", "head"},
    "h4": {"p", "head"}, "h5": {"p", "head"}, "h6": {"p", "head"},
    "dir": {"p", "head"},
    "address": {"p", "head", "ul"},
    "pre": {"p", "head", "ul"},
    "listing": {"p", "head"},
    "xmp": {"p", "head"},
    "blockquote": {"p", "head"},
    "dl": {"p", "dt", "menu", "dir", "address", "pre", "listing", "xmp",
           "head"},
    "dt": {"p", "menu", "dir", "address", "pre", "listing", "xmp", "head",
           "dd"},
    "dd": {"p", "menu", "dir", "address", "pre", "listing", "xmp", "head",
           "dt"},
    "ul": {"p", "head", "ol", "menu", "dir", "address", "pre", "listing",
           "xmp"},
    "ol": {"p", "head", "ul"},
    "menu": {"p", "head", "ul"},
    "p": {"p", "head"} | _H16,
    "div": {"p", "head"},
    "center": {"font", "b", "i", "p", "head"},
    "a": {"a", "head"},
    "caption": {"p"},
    "colgroup": {"caption", "button", "datalist", "textarea", "p"},
    "col": {"caption", "col", "colgroup", "p"},
    "table": {"p", "head", "pre", "listing", "xmp", "a"} | _H16,
    "th": {"th", "td", "p", "span", "font", "a", "b", "i", "u"},
    "td": {"th", "td", "p", "span", "font", "a", "b", "i", "u"},
    "tr": {"th", "td", "tr", "caption", "col", "colgroup", "p", "span",
           "font", "a", "b", "i", "u"},
    "thead": {"caption", "col", "colgroup"},
    "tfoot": {"th", "td", "tr", "caption", "col", "colgroup", "thead",
              "tbody", "p", "span", "font", "a", "b", "i", "u"},
    "tbody": {"th", "td", "tr", "caption", "col", "colgroup", "thead",
              "tfoot", "tbody", "p", "span", "font", "a", "b", "i", "u"},
    "optgroup": {"option"},
    "option": {"option"},
    "fieldset": {"legend", "p", "head", "pre", "listing", "xmp", "a"} | _H16,
}


class _AnalyzerTextParser(HTMLParser):
    # The reference report was built with bs4 on a bundled libxml2 that
    # follows HTML5 in treating <noframes> as a RAWTEXT element: its
    # content stays one literal text node ("<body>…" inclusive), it is
    # not parsed into elements.  That single behavior decides whether the
    # one frameset page in the golden corpus (~raccoon: 9 title tokens +
    # noframes fallback) clears the analyzer's >=20-token gate — parsed
    # as elements it counts 19 and is skipped; as rawtext it counts 21
    # and contributes exactly one 'data' and one 'project', the final
    # +-1 residue of the round-2 golden report. stdlib html.parser only
    # rawtexts script/style by default; extend it.
    CDATA_CONTENT_ELEMENTS = ("script", "style", "noframes")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[tuple[str, bool]] = []  # (tag, removed-subtree)
        self.removed_depth = 0
        self.chunks: list[str] = []

    @staticmethod
    def _is_hidden(attrs) -> bool:
        for k, v in attrs:
            if k == "hidden":
                return True
            if k == "aria-hidden" and v == "true":
                return True
            if k == "style" and v and (
                "display:none" in v or "visibility:hidden" in v
            ):
                return True
        return False

    def _push(self, tag: str, attrs) -> None:
        closes = _CLOSES.get(tag, ())
        while self.stack and self.stack[-1][0] in closes:
            self._pop_one()
        removed = tag in _ANALYZER_REMOVE_TAGS or self._is_hidden(attrs)
        if tag in _VOID_TAGS:
            return  # void elements carry no subtree (and no text)
        self.stack.append((tag, removed))
        if removed:
            self.removed_depth += 1

    def _pop_one(self) -> None:
        _, removed = self.stack.pop()
        if removed:
            self.removed_depth -= 1

    def handle_starttag(self, tag: str, attrs) -> None:
        self._push(tag, attrs)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # lxml treats a self-closed non-void ("<div/>") as an open tag
        self._push(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                while len(self.stack) > i:
                    self._pop_one()
                return
        # stray end tag with no matching open: ignored (tree-builder style)

    def handle_data(self, data: str) -> None:
        if self.removed_depth:
            return
        s = data.strip()
        if s:
            self.chunks.append(s)


_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]+)""", re.I
)


def _decode_html(payload: bytes) -> str:
    """Decode like UnicodeDammit's main path: BOM, else declared
    <meta charset>, else UTF-8 with replacement."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace")
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        try:
            return payload.decode(m.group(1).decode("ascii"), errors="replace")
        except (LookupError, UnicodeDecodeError):
            pass
    return payload.decode("utf-8", errors="replace")


def extract_analyzer_text(payload: bytes) -> str:
    """Visible text per the reference report pipeline
    (analyze_crawl.py:65-80): strip script/style/noscript/svg, hidden
    elements, and nav/footer/header subtrees, then join text nodes with
    single spaces (bs4 ``get_text(" ", strip=True)`` semantics)."""
    parser = _AnalyzerTextParser()
    try:
        parser.feed(_fix_comment_end_bang(_decode_html(payload)))
        parser.close()
    except Exception:
        return ""
    return " ".join(parser.chunks)


def looks_like_xml(payload: bytes) -> bool:
    """XML/feed/sitemap sniff over the first 512 bytes
    (reference scraper.py:212-216)."""
    head = (payload[:512] or b"").lstrip().lower()
    return (
        head.startswith(b"<?xml")
        or head.startswith(b"<rss")
        or head.startswith(b"<feed")
        or b"<urlset" in head
        or b"<sitemapindex" in head
    )


# HTML5 comment-end-bang: "--!>" closes a comment (libxml2 — the
# reference's bs4 backend — agrees). html.parser's comment scanner only
# matches "-->", so "<!-- ... --!>" would swallow everything up to the
# next "-->" — found in the wild on real crawl pages (a hand-edited
# faculty homepage cost 518 visible tokens). Rewrite ONLY terminators of
# an actually-open comment (no earlier "-->" between), so a literal
# "--!>" in visible text survives into span documents unchanged.
#
# Implemented as a single linear scan, NOT a regex: the equivalent
# tempered pattern r"(<!--(?:(?!-->).)*?)--!>" backtracks quadratically
# (measured 0.25s at 8KB, 4s at 32KB on '<!--'*k + '-->' + '--!>'),
# and this runs on untrusted crawl content — an adversarial page must
# not pin an executor core.


def _fix_comment_end_bang(html: str) -> str:
    if "--!>" not in html:  # hot path: the token is rare
        return html
    parts: list[str] = []
    i = 0
    while True:
        start = html.find("<!--", i)
        if start == -1:
            parts.append(html[i:])
            break
        close = html.find("-->", start + 4)
        bang = html.find("--!>", start + 4)
        if bang != -1 and (close == -1 or bang < close):
            # this comment is closed by '--!>': rewrite that terminator
            parts.append(html[i:bang])
            parts.append("-->")
            i = bang + 4
        elif close != -1:
            # normally closed comment: copy through, scan on
            parts.append(html[i:close + 3])
            i = close + 3
        else:
            # unterminated comment: nothing left to rewrite
            parts.append(html[i:])
            break
    return "".join(parts)


GATE_OK = "ok"


def parse_page(payload: bytes, base_url: str) -> ParsedPage:
    """Parse one HTML payload into spans + stats + quality flags + outlinks.

    Mirrors the per-page pipeline of reference scraper.py:219-274 (parse →
    strip subtrees → stats → soft404/login flags → link extraction with
    junk gates, absolutization, defragmentation, ordered first-occurrence
    dedup). Content gates (status/ctype/empty/XML) are the engine's job.
    """
    parser = _SpanHTMLParser()
    try:
        parser.feed(
            _fix_comment_end_bang(payload.decode("utf-8", errors="replace"))
        )
        parser.close()
    except Exception:
        return ParsedPage()  # unparseable -> no links (scraper.py:219-222)

    page = ParsedPage()
    page.page_text = " ".join(parser.text_chunks)
    page.word_count = len(_norm_alnum(page.page_text).split())
    page.a_count = parser.a_count
    page.title_norm = _norm_alnum(" ".join(parser.title_parts))

    # soft-404 (reference scraper.py:164-185)
    soft404 = parser.css_error_flag or parser.meta_robots_flag
    if not soft404 and any(p.search(page.title_norm) for p in _ERROR_PATTERNS):
        soft404 = True
    if not soft404:
        for heading in parser.headings:
            if any(p.search(_norm_alnum(heading)) for p in _ERROR_PATTERNS):
                soft404 = True
                break
    if not soft404 and page.a_count > 120 and page.word_count < 80:
        soft404 = True
    page.soft404 = soft404
    page.login_wall = parser.login_flag

    # spans with resolved refs + offsets; outlinks with reference gates
    seen_links: set[str] = set()
    offset = 0
    for kind, text, ref, _ in parser.spans:
        if kind == "link":
            href = (ref or "").strip()
            if not href or href.startswith(_JUNK_HREF_PREFIXES):
                continue  # scraper.py:261-262
            if any(c in href for c in _JUNK_HREF_CHARS):
                continue  # scraper.py:263-264
            try:
                absolute = urljoin(base_url, href)
            except Exception:
                continue  # scraper.py:265-267
            absolute, _frag = urldefrag(absolute)
            if not absolute:
                continue
            page.spans.append(Span("link", text, absolute, offset))
            offset += 1
            if absolute not in seen_links:  # scraper.py:270-272
                seen_links.add(absolute)
                page.outlinks.append(absolute)
        elif kind == "media":
            try:
                absolute = urljoin(base_url, (ref or "").strip())
            except Exception:
                absolute = ref or ""
            page.spans.append(Span("media", None, absolute, offset))
            offset += 1
        else:
            page.spans.append(Span("text", text, None, offset))
            offset += 1
    return page
