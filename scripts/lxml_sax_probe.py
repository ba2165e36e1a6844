"""SAX-level differential: emulate what bs4 sees when it parses with the
lxml builder — libxml2's SAX callbacks driving a bs4-style tree — and
diff against libxml2's own tree (scripts/lxml_oracle_probe.py).

Findings from the round-3 hunt for the golden report's last +-1 tokens
('data'/'project' each -1 vs the published report):
* libxml2 flushes characters() in bounded runs, so a naive "one string
  per callback" emulation splits words ("uni versity"); real bs4
  ACCUMULATES consecutive data events into one NavigableString
  (BeautifulSoup.current_data), so SAX-vs-tree is structurally
  equivalent for get_text purposes.  Entity/char-ref splits merge the
  same way.  Encoding choice (sniffed vs declared vs utf-8) was also
  ruled out by a raw-vs-decoded corpus diff.
* The actual residue was HTML5 rawtext semantics for <noframes> (the
  reference's bundled libxml2 is newer than this system's): see
  functions/htmlparse.py (_AnalyzerTextParser.CDATA_CONTENT_ELEMENTS)
  and tests/test_golden_report.py.

Kept as the harness for future SAX-vs-tree questions.

Usage: python scripts/lxml_sax_probe.py [start [end]]
"""
import collections
import ctypes
import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.lxml_oracle_probe import extract_lxml, lib  # noqa: E402
from spacetime_crawler4py_spark.functions.htmlparse import _decode_html  # noqa: E402
from spacetime_crawler4py_spark.functions.tokenize import report_tokens  # noqa: E402

CB2 = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p,
                       ctypes.POINTER(ctypes.c_char_p))
CB1 = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p)
CBCH = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_char),
                        ctypes.c_int)
CB0 = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


class SAXHandler(ctypes.Structure):
    _fields_ = [
        ("internalSubset", ctypes.c_void_p),
        ("isStandalone", ctypes.c_void_p),
        ("hasInternalSubset", ctypes.c_void_p),
        ("hasExternalSubset", ctypes.c_void_p),
        ("resolveEntity", ctypes.c_void_p),
        ("getEntity", ctypes.c_void_p),
        ("entityDecl", ctypes.c_void_p),
        ("notationDecl", ctypes.c_void_p),
        ("attributeDecl", ctypes.c_void_p),
        ("elementDecl", ctypes.c_void_p),
        ("unparsedEntityDecl", ctypes.c_void_p),
        ("setDocumentLocator", ctypes.c_void_p),
        ("startDocument", ctypes.c_void_p),
        ("endDocument", ctypes.c_void_p),
        ("startElement", ctypes.c_void_p),
        ("endElement", ctypes.c_void_p),
        ("reference", ctypes.c_void_p),
        ("characters", ctypes.c_void_p),
        ("ignorableWhitespace", ctypes.c_void_p),
        ("processingInstruction", ctypes.c_void_p),
        ("comment", ctypes.c_void_p),
        ("warning", ctypes.c_void_p),
        ("error", ctypes.c_void_p),
        ("fatalError", ctypes.c_void_p),
        ("getParameterEntity", ctypes.c_void_p),
        ("cdataBlock", ctypes.c_void_p),
        ("externalSubset", ctypes.c_void_p),
        ("initialized", ctypes.c_uint),
        ("_private", ctypes.c_void_p),
        ("startElementNs", ctypes.c_void_p),
        ("endElementNs", ctypes.c_void_p),
        ("serror", ctypes.c_void_p),
    ]


lib.htmlSAXParseDoc.restype = ctypes.c_void_p
lib.htmlSAXParseDoc.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                ctypes.POINTER(SAXHandler), ctypes.c_void_p]

RECOVER, NOERROR, NOWARNING, NONET = 1, 32, 64, 2048
OPTS = RECOVER | NOERROR | NOWARNING | NONET
ENC_UTF8 = 1
CHUNK = 512  # bs4 LXMLTreeBuilder CHUNK_SIZE

REMOVE = {"script", "style", "noscript", "svg"}
CHROME = {"nav", "footer", "header"}


class Node:
    __slots__ = ("tag", "attrs", "kids", "parent")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.kids = []
        self.parent = parent


class Builder:
    """bs4-style tree from SAX events: strings stay SEPARATE nodes."""

    def __init__(self):
        self.root = Node(None, {}, None)
        self.cur = self.root

    def start(self, tag, attrs):
        n = Node(tag, attrs, self.cur)
        self.cur.kids.append(n)
        self.cur = n

    def end(self, tag):
        # libxml2 emits balanced events; still guard like bs4's _popToTag
        p = self.cur
        while p is not None and p.tag is not None:
            if p.tag == tag:
                self.cur = p.parent
                return
            p = p.parent

    def chars(self, s):
        # bs4 accumulates consecutive data events into one string
        # (BeautifulSoup.current_data / endData)
        if self.cur.kids and isinstance(self.cur.kids[-1], str):
            self.cur.kids[-1] += s
        else:
            self.cur.kids.append(s)


_B = [None]  # current builder


@CB2
def _on_start(ctx, name, atts):
    tag = name.decode("utf-8", "replace").lower()
    attrs = {}
    if atts:
        i = 0
        while atts[i]:
            k = atts[i].decode("utf-8", "replace").lower()
            v = atts[i + 1]
            attrs.setdefault(k, v.decode("utf-8", "replace")
                             if v is not None else "")
            i += 2
    _B[0].start(tag, attrs)


@CB1
def _on_end(ctx, name):
    _B[0].end(name.decode("utf-8", "replace").lower())


@CBCH
def _on_chars(ctx, ch, n):
    _B[0].chars(ctypes.string_at(ch, n).decode("utf-8", "replace"))


HANDLER = SAXHandler()
HANDLER.startElement = ctypes.cast(_on_start, ctypes.c_void_p)
HANDLER.endElement = ctypes.cast(_on_end, ctypes.c_void_p)
HANDLER.characters = ctypes.cast(_on_chars, ctypes.c_void_p)
HANDLER.cdataBlock = ctypes.cast(_on_chars, ctypes.c_void_p)
HANDLER.initialized = 1


def _is_hidden(attrs):
    if "hidden" in attrs:
        return True
    if attrs.get("aria-hidden") == "true":
        return True
    style = attrs.get("style", "")
    return "display:none" in style or "visibility:hidden" in style


def extract_sax(payload: bytes) -> str:
    text = _decode_html(payload)  # same chars the pull oracle sees
    buf = text.replace("\x00", "�").encode("utf-8")
    _B[0] = Builder()
    # Whole-buffer SAX parse: same input/encoding layer as htmlReadMemory
    # (the push path's chunk converter adds artifacts bs4 never sees), so
    # only the SAX-vs-tree structural question remains.
    doc = lib.htmlSAXParseDoc(buf, b"UTF-8", ctypes.byref(HANDLER), None)
    if doc:
        lib.xmlFreeDoc(doc)
    root = _B[0].root
    _B[0] = None
    return " ".join(_walk(root))


def _walk(root):
    out = []

    def rec(n):
        for k in n.kids:
            if isinstance(k, str):
                s = k.strip()
                if s:
                    out.append(s)
            else:
                if (k.tag in REMOVE or k.tag in CHROME
                        or _is_hidden(k.attrs)):
                    continue
                rec(k)

    rec(root)
    return out


def main():
    want = json.load(open("/root/reference/crawl_out/report.json"))
    TOP50 = {w for w, c in want["top_words"]}
    pairs = []
    for line in open("/root/reference/crawl_out/manifest.tsv"):
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 2:
            pairs.append((parts[0], parts[1]))
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(pairs)
    total = collections.Counter()
    diff_pages = 0
    for url, path in pairs[lo:hi]:
        data = open("/root/reference/" + path, "rb").read()
        t_sax = report_tokens(extract_sax(data))
        t_pull = report_tokens(extract_lxml(data))
        if t_sax != t_pull:
            c_s = (collections.Counter(w for w in t_sax if w in TOP50)
                   if len(t_sax) >= 20 else collections.Counter())
            c_p = (collections.Counter(w for w in t_pull if w in TOP50)
                   if len(t_pull) >= 20 else collections.Counter())
            if c_s != c_p:
                diff_pages += 1
                d = collections.Counter(c_s)
                d.subtract(c_p)
                delta = {k: v for k, v in d.items() if v}
                total.update(delta)
                if diff_pages <= 25:
                    print("DIFF", url, path, delta)
    print("pages with top50-affecting sax-vs-pull diffs:", diff_pages)
    print("sum delta (sax - pull):", dict(total))


if __name__ == "__main__":
    main()
