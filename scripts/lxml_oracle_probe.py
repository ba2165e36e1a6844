"""Differential oracle: drive the SYSTEM libxml2 (the reference extractor's
actual HTML engine — bs4 used the lxml parser) via ctypes, replicate the
analyzer-variant extraction on the real parse tree, and diff per-page
tokens against the repo's stdlib extractor over the full 8,521-page crawl.

This is how round 2 localized the golden-report divergence to a single
page using HTML5's "--!>" comment close (which html.parser doesn't
recognize), and how the remaining ±1-token residue on 2 of 50 top words
was attributed to the bs4 layer (raw libxml2 shows the same ±1).

Usage: python scripts/lxml_oracle_probe.py   (~4 min, pure driver-side)"""
import ctypes, collections, sys, json
sys.path.insert(0, "/root/repo")
from spacetime_crawler4py_spark.functions.htmlparse import extract_analyzer_text, _decode_html
from spacetime_crawler4py_spark.functions.tokenize import report_tokens, STOPWORDS, NOISE_WORDS

lib = ctypes.CDLL("libxml2.so.2")
lib.htmlReadMemory.restype = ctypes.c_void_p
lib.htmlReadMemory.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
lib.xmlDocGetRootElement.restype = ctypes.c_void_p
lib.xmlDocGetRootElement.argtypes = [ctypes.c_void_p]
lib.xmlNodeGetContent.restype = ctypes.c_void_p   # xmlChar* we must free
lib.xmlNodeGetContent.argtypes = [ctypes.c_void_p]
lib.xmlGetProp.restype = ctypes.c_void_p
lib.xmlGetProp.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
lib.xmlHasProp.restype = ctypes.c_void_p
lib.xmlHasProp.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
lib.xmlFreeDoc.argtypes = [ctypes.c_void_p]
_xmlFreeAddr = ctypes.c_void_p.in_dll(lib, "xmlFree")
xmlFree = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(_xmlFreeAddr.value)

class XmlNode(ctypes.Structure):
    _fields_ = [
        ("_private", ctypes.c_void_p),
        ("type", ctypes.c_int),
        ("name", ctypes.c_char_p),
        ("children", ctypes.c_void_p),
        ("last", ctypes.c_void_p),
        ("parent", ctypes.c_void_p),
        ("next", ctypes.c_void_p),
        ("prev", ctypes.c_void_p),
        ("doc", ctypes.c_void_p),
        ("ns", ctypes.c_void_p),
        ("content", ctypes.c_void_p),
        ("properties", ctypes.c_void_p),
    ]

RECOVER, NOERROR, NOWARNING, NONET = 1, 32, 64, 2048
OPTS = RECOVER | NOERROR | NOWARNING | NONET
ELEM, TEXT, CDATA, COMMENT = 1, 3, 4, 8
REMOVE = {b"script", b"style", b"noscript", b"svg", b"nav", b"footer", b"header"}

def node(ptr):
    return ctypes.cast(ptr, ctypes.POINTER(XmlNode)).contents

def get_prop(ptr, name):
    raw = lib.xmlGetProp(ptr, name)
    if not raw:
        return None
    try:
        return ctypes.cast(raw, ctypes.c_char_p).value.decode("utf-8", "replace")
    finally:
        xmlFree(raw)

def is_hidden(ptr):
    if lib.xmlHasProp(ptr, b"hidden"):
        return True
    if get_prop(ptr, b"aria-hidden") == "true":
        return True
    style = get_prop(ptr, b"style")
    if style and ("display:none" in style or "visibility:hidden" in style):
        return True
    return False

def extract_lxml(payload: bytes) -> str:
    text = _decode_html(payload)  # same chars both extractors see
    buf = text.encode("utf-8")
    doc = lib.htmlReadMemory(buf, len(buf), b"doc", b"UTF-8", OPTS)
    if not doc:
        return ""
    chunks = []
    root = lib.xmlDocGetRootElement(doc)
    stack = [root] if root else []
    while stack:
        ptr = stack.pop()
        while ptr:
            n = node(ptr)
            nxt = n.next
            if n.type == ELEM:
                name = (n.name or b"").lower()
                if name not in REMOVE and not is_hidden(ptr) and n.children:
                    if nxt:
                        stack.append(nxt)
                    ptr = n.children
                    continue
            elif n.type in (TEXT, CDATA):
                raw = lib.xmlNodeGetContent(ptr)
                if raw:
                    try:
                        s = ctypes.cast(raw, ctypes.c_char_p).value.decode("utf-8", "replace").strip()
                    finally:
                        xmlFree(raw)
                    if s:
                        chunks.append(s)
            ptr = nxt
    lib.xmlFreeDoc(doc)
    return " ".join(chunks)

def main():
    want = json.load(open("/root/reference/crawl_out/report.json"))
    TOP50 = {w for w, c in want["top_words"]}
    pairs = []
    for line in open("/root/reference/crawl_out/manifest.tsv"):
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 2:
            pairs.append((parts[0], parts[1]))
    total_delta = collections.Counter()
    diff_pages = 0
    agg = collections.Counter()
    longest = (-1, None)
    for url, path in pairs:
        data = open("/root/reference/" + path, "rb").read()
        t_lx = report_tokens(extract_lxml(data))
        t_my = report_tokens(extract_analyzer_text(data))
        # aggregate lxml-based report as we go
        if len(t_lx) >= 20:
            agg.update(w for w in t_lx if w not in STOPWORDS and w not in NOISE_WORDS)
            if len(t_lx) > longest[0]:
                longest = (len(t_lx), url)
        if t_lx != t_my:
            c_lx = collections.Counter(w for w in t_lx if w in TOP50) if len(t_lx) >= 20 else collections.Counter()
            c_my = collections.Counter(w for w in t_my if w in TOP50) if len(t_my) >= 20 else collections.Counter()
            if c_lx != c_my:
                diff_pages += 1
                d = collections.Counter(c_lx)
                d.subtract(c_my)
                total_delta.update({k: v for k, v in d.items() if v})
                if diff_pages <= 15:
                    print("DIFF", url, {k: v for k, v in d.items() if v})
    print("pages with top50-affecting diffs:", diff_pages)
    print("sum delta (lxml - mine):", dict(total_delta))
    # compare lxml aggregate vs published report
    wt = dict(map(tuple, want["top_words"]))
    mism = {w: (agg.get(w), wt[w]) for w in wt if agg.get(w) != wt[w]}
    print("lxml-oracle vs published top50 mismatches:", len(mism))
    for w, (g, r) in sorted(mism.items())[:20]:
        print("  ", w, "lxml:", g, "published:", r)
    print("lxml longest:", longest, "published:", want["longest_page"])

if __name__ == "__main__":
    main()
