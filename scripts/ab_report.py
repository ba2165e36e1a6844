"""Render BENCH/AB_RAW.jsonl (bench_ab_scaling.py output) into the
interleaved-A/B section of BENCH/BASELINE.md.

The section replaces any previous '## Round-3 vs HEAD interleaved A/B'
block; everything else in the file is preserved.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(REPO, "BENCH", "AB_RAW.jsonl")
MD = os.path.join(REPO, "BENCH", "BASELINE.md")
HEADING = "## Round-3 vs HEAD interleaved A/B"


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    rows = [json.loads(l) for l in open(RAW, encoding="utf-8")]
    crawl = [r for r in rows if r["phase"] == "crawl"]
    queries = [r for r in rows if r["phase"] == "queries"]

    lines = [HEADING, ""]
    lines.append(
        "Round 4's scaling efficiency fell 0.93 -> 0.81 and local[8] best\n"
        "fell 16%; busy-jiffy evidence said host CPI inflation, but the\n"
        "epoch loop changed in round 4, so round-5 ask #1 was this\n"
        "same-session interleaved A/B: the round-3 tree (6be1ee4) and HEAD\n"
        "run back-to-back per rep (order alternating) under identical env,\n"
        "input, and taskset pinning (scripts/bench_ab_scaling.py; raw reps\n"
        "in BENCH/AB_RAW.jsonl)."
    )
    lines.append("")
    lines.append("| level | rep | r3 URLs/s @ busy kjiffies | HEAD URLs/s @ busy kjiffies |")
    lines.append("|---|---|---|---|")
    for cpus in (8, 2):
        reps = sorted({r["rep"] for r in crawl if r["cpus"] == cpus})
        for i in reps:
            cell = {}
            for v in ("r3", "head"):
                m = [r for r in crawl
                     if r["cpus"] == cpus and r["rep"] == i
                     and r["variant"] == v]
                cell[v] = (
                    f"{m[0]['urls_per_s']:,} @ "
                    f"{round((m[0]['busy_jiffies_inner'] or 0) / 1000)}k"
                    if m else "—"
                )
            lines.append(
                f"| local[{cpus}] | {i} | {cell['r3']} | {cell['head']} |"
            )
    lines.append("")
    for cpus in (8, 2):
        a = [r["urls_per_s"] for r in crawl
             if r["cpus"] == cpus and r["variant"] == "r3"]
        b = [r["urls_per_s"] for r in crawl
             if r["cpus"] == cpus and r["variant"] == "head"]
        if a and b:
            lines.append(
                f"- local[{cpus}]: r3 best {max(a):,.1f} / median "
                f"{_median(a):,.1f} vs HEAD best {max(b):,.1f} / median "
                f"{_median(b):,.1f} -> HEAD/r3 best ratio "
                f"**{max(b) / max(a):.3f}**, median ratio "
                f"{_median(b) / _median(a):.3f}"
            )
    # north-rule two-level scaling evidence, per variant: efficiency =
    # (URLs/s @ local[8]) / (4 x URLs/s @ local[2]) from the SAME
    # interleaved session, so both levels saw the same host weather.
    for v, label in (("head", "HEAD"), ("r3", "r3")):
        lo = [r["urls_per_s"] for r in crawl
              if r["cpus"] == 2 and r["variant"] == v]
        hi = [r["urls_per_s"] for r in crawl
              if r["cpus"] == 8 and r["variant"] == v]
        if lo and hi:
            lines.append(
                f"- {label} scaling 2->8 cores (4x): best-pair efficiency "
                f"**{max(hi) / (4 * max(lo)):.3f}** "
                f"({max(lo):,} -> {max(hi):,} URLs/s), median-pair "
                f"{_median(hi) / (4 * _median(lo)):.3f}"
            )
    if queries:
        names = sorted(queries[0]["times"])
        lines.append("")
        lines.append(
            "Shared-query drift (sf0.1, local[32], best-of-reps seconds):"
        )
        lines.append("")
        lines.append("| query | r3 | HEAD | HEAD/r3 |")
        lines.append("|---|---|---|---|")
        for n in names:
            a = min(r["times"][n] for r in queries if r["variant"] == "r3")
            b = min(r["times"][n] for r in queries if r["variant"] == "head")
            lines.append(f"| {n} | {a:.2f}s | {b:.2f}s | {b / a:.2f} |")
        ta = min(r["total_s"] for r in queries if r["variant"] == "r3")
        tb = min(r["total_s"] for r in queries if r["variant"] == "head")
        lines.append(f"| **total** | {ta:.2f}s | {tb:.2f}s | {tb / ta:.2f} |")
    lines.append("")

    with open(MD, encoding="utf-8") as f:
        doc = f.read()
    if HEADING in doc:
        start = doc.index(HEADING)
        rest = doc[start:]
        nxt = rest.find("\n## ", 1)
        end = start + (nxt + 1 if nxt != -1 else len(rest))
        doc = doc[:start] + doc[end:]
    if not doc.endswith("\n"):
        doc += "\n"
    doc += "\n".join(lines) + "\n"
    with open(MD, "w", encoding="utf-8") as f:
        f.write(doc)
    print(f"[ab_report] wrote section ({len(crawl)} crawl reps, "
          f"{len(queries)} query reps) to {MD}")


if __name__ == "__main__":
    main()
