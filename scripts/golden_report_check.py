"""Compare the Spark analyzer pipeline against the reference's published
crawl report (/root/reference/crawl_out/report.json, built by bs4+lxml over
the 8,521 actually-crawled pages). Prints a field-by-field diff."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

REF = "/root/reference"


def main() -> int:
    from spacetime_crawler4py_spark.operators.analyze import (
        analyze_pages, golden_report,
    )
    from spacetime_crawler4py_spark.session import get_spark
    from spacetime_crawler4py_spark.sources.analytics import (
        load_html_pages, read_manifest,
    )

    with open(f"{REF}/crawl_out/report.json", encoding="utf-8") as f:
        want = json.load(f)

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = read_manifest(spark, f"{REF}/crawl_out/manifest.tsv")
    pages = load_html_pages(spark, pairs, REF)
    analyzed = analyze_pages(pages).persist()
    got = golden_report(pairs, analyzed)

    ok = True
    if got["unique_pages"] != want["unique_pages"]:
        ok = False
        print(f"unique_pages: got {got['unique_pages']} want {want['unique_pages']}")
    else:
        print(f"unique_pages OK ({got['unique_pages']})")

    ws, gs = dict(map(tuple, want["subdomains"])), dict(map(tuple, got["subdomains"]))
    if ws != gs:
        ok = False
        for k in sorted(set(ws) | set(gs)):
            if ws.get(k) != gs.get(k):
                print(f"subdomain {k}: got {gs.get(k)} want {ws.get(k)}")
    else:
        print(f"subdomains OK ({len(gs)} hosts)")

    if (got["longest_page"]["url"] != want["longest_page"]["url"]
            or got["longest_page"]["word_count"] != want["longest_page"]["word_count"]):
        ok = False
        print(f"longest: got {got['longest_page']} want {want['longest_page']}")
    else:
        print(f"longest OK ({got['longest_page']['word_count']})")

    wt, gt = dict(map(tuple, want["top_words"])), dict(map(tuple, got["top_words"]))
    diffs = [
        (k, gt.get(k), wt.get(k))
        for k in sorted(set(wt) | set(gt))
        if wt.get(k) != gt.get(k)
    ]
    if diffs:
        ok = False
        print(f"top_words: {len(diffs)} mismatches")
        for k, g, w in diffs[:60]:
            d = (g - w) if (g is not None and w is not None) else None
            print(f"  {k}: got {g} want {w}" + (f" (delta {d:+d})" if d is not None else ""))
    else:
        print("top_words OK (50 exact)")

    analyzed.unpersist()
    spark.stop()
    print("GOLDEN " + ("MATCH" if ok else "MISMATCH"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
