"""Deterministic synthetic-web generator (FIXTURES.md §2).

Replaces the reference's remote cache server (reference
utils/download.py:7-21) with a closed, seeded link graph: the fetch stage
becomes an equi-join against this table in tests. HTML payloads are
*rendered from the span model*, so the engine's parse must invert the
render exactly; span-sequence equality is checked against the generator's
own spans.

Coverage (each item cites the reference branch it exercises):
* skewed host distribution (~25% of pages on www.ics.uci.edu, mirroring
  crawl_out/report.json)
* trap links rejected by is_valid (scraper.py:276-384): calendars, deep
  pagination, media params, out-of-scope hosts, blocked extensions
* junk hrefs (scraper.py:261-264): javascript:/mailto:/#, bracketed
* non-HTML content types (scraper.py:203-206), XML feeds served as
  text/html (scraper.py:212-216), empty bodies (scraper.py:208-210),
  non-200 statuses (scraper.py:200-201)
* soft-404 pages (scraper.py:164-185) and login walls (scraper.py:153-162)
* exact-duplicate payloads under two URLs (utils/similarity.py:57-66) and
  near-duplicate pairs around tau=0.90 (utils/similarity.py:87-92)
* http/https twins (scheme-folded identity, utils/__init__.py:25-30) and
  trailing-slash variants (utils/__init__.py:32-35)
* redirects: final_url != url (scraper.py:242 uses resp.url)
"""

from __future__ import annotations

import html as html_mod
import random
from dataclasses import dataclass, field

__all__ = ["PageSpec", "SyntheticWeb", "generate_web", "render_html"]

VOCAB = (
    "spark frontier crawler politeness domain queue shuffle partition bloom "
    "filter epoch snapshot lineage metric token window rank merge parquet "
    "schema column arrow pandas vectorized batch join aggregate research "
    "faculty student course project algorithm data index graph node edge"
).split()

HOSTS_IN_SCOPE = [
    ("www.ics.uci.edu", 25),   # skew: heaviest host
    ("www.cs.uci.edu", 12),
    ("www.informatics.uci.edu", 10),
    ("www.stat.uci.edu", 8),
    ("cml.ics.uci.edu", 10),
    ("wics.ics.uci.edu", 6),
    ("ngs.ics.uci.edu", 6),
    ("cradl.ics.uci.edu", 5),
    ("emj.ics.uci.edu", 4),
    ("transformativeplay.ics.uci.edu", 4),
    ("sli.ics.uci.edu", 4),
    ("isg.ics.uci.edu", 3),
    ("luci.ics.uci.edu", 3),
]

TRAP_LINKS = [
    "https://www.ics.uci.edu/events/day/2024-01-15",
    "https://www.ics.uci.edu/events/seminar/page/12/",
    "https://www.ics.uci.edu/blog/page/345/",
    "https://www.ics.uci.edu/list?page=9999",
    "https://www.ics.uci.edu/dir/?C=N;O=A",
    "https://www.ics.uci.edu/page?file=deck.pdf",
    "https://www.ics.uci.edu/about/calendar",
    "https://www.ics.uci.edu/~eppstein/pix/photo1",
    "https://mailman.ics.uci.edu/listinfo/announce",
    "https://www.ics.uci.edu/wp-json/wp/v2/posts",
    "https://www.ics.uci.edu/paper.pdf",
    "https://www.ics.uci.edu/archive.zip",
    "https://example.com/outside",
    "https://en.wikipedia.org/wiki/Web_crawler",
    "https://www.ics.uci.edu/a/b/a/b/a/b",
    "https://swiki.ics.uci.edu/doku.php?do=media",
]

JUNK_HREFS = [
    "javascript:void(0)",
    "mailto:chair@ics.uci.edu",
    "tel:+19498246891",
    "#section-2",
    "data:text/plain;base64,aGk=",
    "/bad[bracket]path",
    "",
]


@dataclass
class PageSpec:
    """One served URL. ``spans`` is the authoritative document model;
    ``payload`` is rendered from it."""

    url: str
    status: int = 200
    final_url: str | None = None
    content_type: str = "text/html; charset=utf-8"
    payload: bytes | None = None
    # authoritative span model: list of (kind, text, media_ref) pre-offset
    spans: list[tuple[str, str | None, str | None]] = field(default_factory=list)
    kind: str = "normal"  # normal|soft404|login|xml|binary|empty|error

    @property
    def domain(self) -> str:
        from urllib.parse import urlparse

        return urlparse(self.url).netloc


def render_html(
    spans: list[tuple[str, str | None, str | None]],
    title: str = "Page",
    *,
    soft404: bool = False,
    login: bool = False,
    relative_href_base: str | None = None,
    junk_hrefs: list[str] | None = None,
) -> bytes:
    """Render a span model to HTML such that parse_page inverts it exactly.

    Each text span becomes one <p> (one data chunk), each link span one
    <a href>, each media span one <img src>. Optional soft-404 / login
    features and junk anchors are appended *after* the span content so the
    expected span sequence is unchanged... junk links carry no valid href
    and produce no spans; login forms/password inputs produce no spans.
    """
    parts = [
        "<!DOCTYPE html><html><head><title>",
        html_mod.escape(title),
        "</title><script>var x = 'IGNORED SCRIPT TEXT';</script>",
        "<style>.c{color:red}</style></head><body>",
    ]
    if soft404:
        parts.append("<h1>404 Page Not Found</h1>")
    for kind, text, ref in spans:
        if kind == "text":
            parts.append(f"<p>{html_mod.escape(text or '')}</p>")
        elif kind == "link":
            href = ref or ""
            if relative_href_base and href.startswith(relative_href_base):
                href = href[len(relative_href_base) :] or "/"
            parts.append(
                f'<a href="{html_mod.escape(href, quote=True)}">'
                f"{html_mod.escape(text or '')}</a>"
            )
        elif kind == "media":
            parts.append(f'<img src="{html_mod.escape(ref or "", quote=True)}"/>')
    for junk in junk_hrefs or []:
        parts.append(f'<a href="{html_mod.escape(junk, quote=True)}">junk</a>')
    if login:
        parts.append(
            '<form action="/account/login"><input type="password" name="p"/></form>'
        )
    parts.append("<noscript>NOSCRIPT IGNORED</noscript></body></html>")
    return "".join(parts).encode("utf-8")


def _text_blob(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


class SyntheticWeb:
    def __init__(self, pages: dict[str, PageSpec], seeds: list[str]):
        self.pages = pages
        self.seeds = seeds

    def lookup(self, url: str) -> PageSpec | None:
        return self.pages.get(url)

    def to_rows(self) -> list[tuple]:
        """Rows for the synthetic_web table:
        (url, status, final_url, content_type, payload, domain)."""
        return [
            (p.url, p.status, p.final_url or p.url, p.content_type, p.payload, p.domain)
            for p in self.pages.values()
        ]

    def expected_spans(self, url: str):
        p = self.pages.get(url)
        return list(p.spans) if p else None


def generate_web(n_pages: int = 200, seed: int = 42) -> SyntheticWeb:
    """Build the closed graph. Deterministic for a given (n_pages, seed)."""
    rng = random.Random(seed)

    host_pool: list[str] = []
    for host, weight in HOSTS_IN_SCOPE:
        host_pool.extend([host] * weight)

    urls: list[str] = []
    for i in range(n_pages):
        host = host_pool[rng.randrange(len(host_pool))]
        depth = rng.choice([1, 1, 1, 2, 2, 3])
        segs = "/".join(f"{rng.choice(['p', 'r', 'n'])}{rng.randrange(10_000)}" for _ in range(depth))
        urls.append(f"https://{host}/{segs}/page{i}")

    pages: dict[str, PageSpec] = {}

    def linkset(i: int) -> list[str]:
        links: list[str] = []
        # forward edges guarantee reachability of every page from page 0..3
        fanout = rng.randrange(2, 7)
        for _ in range(fanout):
            hi = min(n_pages - 1, i + rng.randrange(1, 12))
            if hi != i:
                links.append(urls[hi])
        if rng.random() < 0.5 and i > 0:
            links.append(urls[rng.randrange(i)])  # back edge
        if rng.random() < 0.35:
            links.append(rng.choice(TRAP_LINKS))
        if rng.random() < 0.2:
            links.append(urls[i])  # self link (dropped by seen-dedup)
        return links

    for i, url in enumerate(urls):
        spec = PageSpec(url=url)
        roll = rng.random()
        junk = [rng.choice(JUNK_HREFS)] if rng.random() < 0.4 else []
        rel_base = None
        if rng.random() < 0.3:
            rel_base = f"https://{spec.domain}"  # exercise urljoin resolution

        if roll < 0.04:  # soft-404 page: fetched, rejected, no links followed
            spec.kind = "soft404"
            spec.spans = []
            spec.payload = render_html(
                [("text", _text_blob(rng, 30), None)], title="404 Not Found", soft404=True
            )
        elif roll < 0.07:  # login wall
            spec.kind = "login"
            spec.spans = []
            spec.payload = render_html(
                [("text", _text_blob(rng, 25), None)], title="Portal", login=True
            )
        elif roll < 0.09:  # XML feed served as text/html
            spec.kind = "xml"
            spec.spans = []
            spec.payload = b'<?xml version="1.0"?><rss><channel></channel></rss>'
        elif roll < 0.11:  # binary content type
            spec.kind = "binary"
            spec.content_type = "application/pdf"
            spec.spans = []
            spec.payload = b"%PDF-1.4 fake"
        elif roll < 0.12:  # empty body
            spec.kind = "empty"
            spec.spans = []
            spec.payload = b""
        elif roll < 0.14:  # hard error
            spec.kind = "error"
            spec.status = rng.choice([404, 500, 603])
            spec.spans = []
            spec.payload = None
        else:
            model: list[tuple[str, str | None, str | None]] = []
            for _ in range(rng.randrange(2, 6)):
                model.append(("text", _text_blob(rng, rng.randrange(8, 60)), None))
            for li, link in enumerate(linkset(i)):
                model.append(("link", f"anchor {li}", link))
            if rng.random() < 0.3:
                model.append(
                    ("media", None, f"https://{spec.domain}/media/img{i}.png")
                )
            spec.spans = model
            spec.payload = render_html(
                model,
                title=f"Synthetic page {i}",
                relative_href_base=rel_base,
                junk_hrefs=junk,
            )
        pages[url] = spec

    # anchors for the hand-built scenarios must be normal pages so that
    # appending links + re-rendering keeps their kind intact
    normal_idx = [i for i, u in enumerate(urls) if pages[u].kind == "normal"]

    def attach_links(anchor_i: int, new_links: list[tuple[str, str]]) -> None:
        spec = pages[urls[anchor_i]]
        spec.spans.extend(("link", text, target) for text, target in new_links)
        spec.payload = render_html(spec.spans, title=f"Synthetic page {anchor_i}")

    # exact-duplicate pair: same payload bytes under a second URL
    if len(normal_idx) >= 12:
        src = pages[urls[normal_idx[5]]]
        dup_url = f"https://{src.domain}/dup-page"
        pages[dup_url] = PageSpec(
            url=dup_url, payload=src.payload, spans=list(src.spans), kind=src.kind
        )
        attach_links(normal_idx[4], [("dup link", dup_url)])

    # near-duplicate pair: identical text (jaccard 1.0 >= 0.90), different links
    if len(normal_idx) >= 12:
        base_text = _text_blob(rng, 400)
        u_a = "https://www.ics.uci.edu/neardup/a"
        u_b = "https://www.cs.uci.edu/neardup/b"
        for u, other_i in ((u_a, normal_idx[6]), (u_b, normal_idx[7])):
            model = [("text", base_text, None), ("link", "next", urls[other_i])]
            pages[u] = PageSpec(url=u, spans=model, payload=render_html(model, title="ND"))
        attach_links(normal_idx[8], [("nd a", u_a), ("nd b", u_b)])

    # http/https twin: same body served under both schemes; both linked
    if len(normal_idx) >= 12:
        twin_https = "https://www.ics.uci.edu/twin/page"
        twin_http = "http://www.ics.uci.edu/twin/page"
        model = [("text", _text_blob(rng, 50), None)]
        pages[twin_https] = PageSpec(
            url=twin_https, spans=model, payload=render_html(model, title="Twin")
        )
        pages[twin_http] = PageSpec(
            url=twin_http, spans=model, payload=render_html(model, title="Twin")
        )
        attach_links(normal_idx[9], [("twin s", twin_https), ("twin p", twin_http)])

    # trailing-slash variant + redirect
    if len(normal_idx) >= 12:
        tgt = "https://www.stat.uci.edu/slash/page"
        model = [("text", _text_blob(rng, 30), None)]
        pages[tgt] = PageSpec(url=tgt, spans=model, payload=render_html(model, title="S"))
        attach_links(normal_idx[10], [("slash", tgt + "/"), ("noslash", tgt)])
        # redirect page: fetching /redir/page serves another normal page
        redir = "https://www.ics.uci.edu/redir/page"
        target_spec = pages[urls[normal_idx[11]]]
        pages[redir] = PageSpec(
            url=redir,
            final_url=target_spec.url,
            spans=list(target_spec.spans),
            payload=target_spec.payload,
            content_type=target_spec.content_type,
            status=200,
        )
        attach_links(normal_idx[3], [("redir", redir)])

    # seed with normal pages (mirrors the 4 reference seeds, config.ini:10)
    seed_idx = normal_idx[:4] if len(normal_idx) >= 4 else list(range(min(4, n_pages)))
    seeds = [urls[i] for i in seed_idx]
    return SyntheticWeb(pages=pages, seeds=seeds)
