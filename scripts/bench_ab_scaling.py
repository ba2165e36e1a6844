"""Interleaved A/B: round-3 commit vs HEAD on the pinned scaling bench.

Round 4's scaling efficiency fell 0.93 -> 0.81 and local[8] best fell 16%;
the busy-jiffy evidence pointed at host CPI inflation, but the epoch loop
changed in round 4 (seen backfill, tiered compaction, bloom fill checks),
so the verdict asked for a same-session interleaved A/B to attribute the
delta to the host or to a named commit.

Design: the round-3 tree (6be1ee4) is checked out as a git worktree at
.ab_r3; each rep runs BOTH variants back-to-back (order alternating per
rep) under identical env + taskset pinning, so hypervisor weather hits
both variants equally in expectation. Raw runs append to
BENCH/AB_RAW.jsonl as they finish (partial progress survives a kill);
the final summary table goes to BENCH/AB_R3_HEAD.md.

Phases:
  1. crawl @ local[8]  (AB_HIGH_REPS interleaved pairs) - the level that
     dropped 16% in round 4
  2. crawl @ local[2]  (AB_LOW_REPS pairs) - for the efficiency ratio
  3. shared-query drift (AB_QUERY_REPS pairs, 6 queries both trees share,
     sf0.1, local[32]) - round 4's +10% suite drift check
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_TREE = os.path.join(REPO, ".ab_r3")
TREES = {"r3": R3_TREE, "head": REPO}
RAW = os.path.join(REPO, "BENCH", "AB_RAW.jsonl")

HIGH_REPS = int(os.environ.get("AB_HIGH_REPS", "3"))
LOW_REPS = int(os.environ.get("AB_LOW_REPS", "2"))
QUERY_REPS = int(os.environ.get("AB_QUERY_REPS", "2"))
URLS = int(os.environ.get("SCALING_URLS", "4000000"))
DOMAINS = int(os.environ.get("SCALING_DOMAINS", "1500"))
TOKENS = int(os.environ.get("SCALING_TOKENS", "768"))

# shared between the two trees (all green in r03 and r04)
DRIFT_QUERIES = [
    "quality_scores", "top_words", "minhash_lsh_pairs",
    "simhash_pairs", "pagerank", "curation_full",
]

_QPROBE = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import __spark_entry__ as entry
from spacetime_crawler4py_spark.session import get_spark
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = json.loads(os.environ["AB_QUERIES"])
spark = get_spark(app_name="abq", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
qs["top_words"](spark, sf).count()
qs["url_seen_hash"](spark, sf).count()
out = {}
for n in names:
    t0 = time.monotonic()
    qs[n](spark, sf).count()
    out[n] = round(time.monotonic() - t0, 3)
print(json.dumps(out))
spark.stop()
"""


def _cpu_stat() -> list[int]:
    with open("/proc/stat", encoding="ascii") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _record(row: dict) -> None:
    os.makedirs(os.path.dirname(RAW), exist_ok=True)
    with open(RAW, "a", encoding="utf-8") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[ab] {row}", file=sys.stderr)


def run_crawl(variant: str, cpus: int, rep: int) -> dict:
    env = dict(
        os.environ,
        BENCH_SKIP_QUERIES="1",
        BENCH_CRAWL_REPS="1",
        BENCH_CRAWL_URLS=str(URLS),
        BENCH_CRAWL_DOMAINS=str(DOMAINS),
        BENCH_CRAWL_TOKENS=str(TOKENS),
        BENCH_CRAWL_EPOCHS="1",
        SPARK_GRAFT_CPUS=str(cpus),
    )
    s0 = _cpu_stat()
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, os.path.join(TREES[variant], "bench.py")],
        env=env, capture_output=True, text=True, check=True,
        cwd=TREES[variant],
    )
    s1 = _cpu_stat()
    d = [b - a for a, b in zip(s0, s1)]
    crawl = json.loads(out.stdout.strip().splitlines()[-1])["crawl"]
    row = {
        "phase": "crawl", "variant": variant, "cpus": cpus, "rep": rep,
        "urls_per_s": crawl["urls_per_s"], "wall_s": crawl["wall_s"],
        "busy_jiffies_outer": d[0] + d[2], "steal_jiffies_outer": d[7],
        "busy_jiffies_inner": crawl.get("busy_jiffies"),
        "steal_jiffies_inner": crawl.get("steal_jiffies"),
        "t": round(time.monotonic(), 1),
    }
    _record(row)
    return row


def run_queries(variant: str, rep: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32",
               AB_QUERIES=json.dumps(DRIFT_QUERIES))
    s0 = _cpu_stat()
    out = subprocess.run(
        [sys.executable, "-c", _QPROBE],
        env=env, capture_output=True, text=True, check=True,
        cwd=TREES[variant],
    )
    s1 = _cpu_stat()
    d = [b - a for a, b in zip(s0, s1)]
    times = json.loads(out.stdout.strip().splitlines()[-1])
    row = {
        "phase": "queries", "variant": variant, "rep": rep,
        "times": times, "total_s": round(sum(times.values()), 3),
        "busy_jiffies_outer": d[0] + d[2], "steal_jiffies_outer": d[7],
        "t": round(time.monotonic(), 1),
    }
    _record(row)
    return row


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    if not os.path.isdir(R3_TREE):
        subprocess.run(["git", "worktree", "add", R3_TREE, "6be1ee4"],
                       cwd=REPO, check=True)
    rows: list[dict] = []
    for cpus, reps in ((8, HIGH_REPS), (2, LOW_REPS)):
        for i in range(reps):
            order = ("r3", "head") if i % 2 == 0 else ("head", "r3")
            for v in order:
                rows.append(run_crawl(v, cpus, i))
    for i in range(QUERY_REPS):
        order = ("r3", "head") if i % 2 == 0 else ("head", "r3")
        for v in order:
            rows.append(run_queries(v, i))

    # summarize
    summary: dict = {}
    for cpus in (8, 2):
        for v in TREES:
            rs = [r for r in rows
                  if r["phase"] == "crawl" and r["variant"] == v
                  and r["cpus"] == cpus]
            if rs:
                xs = [r["urls_per_s"] for r in rs]
                summary[f"crawl_{v}_local{cpus}"] = {
                    "best": max(xs), "median": _median(xs), "all": xs,
                }
    for v in TREES:
        rs = [r for r in rows
              if r["phase"] == "queries" and r["variant"] == v]
        if rs:
            summary[f"queries_{v}"] = {
                "best_total": min(r["total_s"] for r in rs),
                "per_query_best": {
                    q: min(r["times"][q] for r in rs)
                    for q in DRIFT_QUERIES
                },
            }
    for cpus in (8, 2):
        a = summary.get(f"crawl_r3_local{cpus}")
        b = summary.get(f"crawl_head_local{cpus}")
        if a and b:
            summary[f"head_over_r3_local{cpus}_best"] = round(
                b["best"] / a["best"], 3)
            summary[f"head_over_r3_local{cpus}_median"] = round(
                b["median"] / a["median"], 3)
    print(json.dumps(summary, indent=2))
    with open(os.path.join(REPO, "BENCH", "AB_SUMMARY.json"), "w",
              encoding="utf-8") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
