"""Scaling-efficiency evidence for the north_rule criterion.

A real N→4N-executor comparison needs a cluster; in this sandbox the same
job + identical input runs at two parallelism levels (local[8] vs
local[32], per BASELINE.json guidance) and we report URLs/s at both plus
efficiency = (T32_throughput / T8_throughput) / 4.

Each measurement runs in a fresh subprocess (own JVM) so the sessions
can't share state. Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

URLS = int(os.environ.get("SCALING_URLS", "1000000"))
DOMAINS = int(os.environ.get("SCALING_DOMAINS", "1500"))
TOKENS = int(os.environ.get("SCALING_TOKENS", "128"))
EPOCHS = int(os.environ.get("SCALING_EPOCHS", "2"))


def run_at(cpus: int) -> dict:
    env = dict(
        os.environ,
        BENCH_SKIP_QUERIES="1",
        BENCH_CRAWL_URLS=str(URLS),
        BENCH_CRAWL_DOMAINS=str(DOMAINS),
        BENCH_CRAWL_TOKENS=str(TOKENS),
        BENCH_CRAWL_EPOCHS=str(EPOCHS),
        SPARK_GRAFT_CPUS=str(cpus),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["crawl"]


def main() -> None:
    low, high = 8, 32
    r_low = run_at(low)
    print(f"[scaling] local[{low}]: {r_low}", file=sys.stderr)
    r_high = run_at(high)
    print(f"[scaling] local[{high}]: {r_high}", file=sys.stderr)
    ratio = r_high["urls_per_s"] / r_low["urls_per_s"]
    efficiency = ratio / (high / low)
    summary = {
        "low_cpus": low,
        "high_cpus": high,
        "low_urls_per_s": r_low["urls_per_s"],
        "high_urls_per_s": r_high["urls_per_s"],
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(efficiency, 3),
        "input": {
            "frontier_size": URLS, "domains": DOMAINS,
            "tokens_per_domain_per_epoch": TOKENS, "epochs": EPOCHS,
            "seed_fraction": 0.5,
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w", encoding="utf-8") as f:
        f.write(
            "# BENCH/BASELINE — measured crawl throughput + scaling\n\n"
            "North-rule metric: frontier dequeue + fetch + parse + merge\n"
            "throughput (URLs/s) on a synthetic skewed frontier (hot domain\n"
            "~25%, half the graph discovered during the run). Same job +\n"
            "identical input at two parallelism levels stands in for the\n"
            "N->4N executor comparison (no real cluster in this sandbox).\n\n"
            "| config | value |\n|---|---|\n"
            f"| frontier size | {URLS:,} URLs ({DOMAINS} domains, "
            f"seed 50%, relaxed ordering, bloom on, neardup off) |\n"
            f"| politeness budget | {TOKENS} URLs/domain/epoch, "
            f"{EPOCHS} epochs |\n"
            f"| URLs crawled per run | {r_low['urls']:,} |\n"
            f"| throughput @ local[{low}] | **{r_low['urls_per_s']:,} URLs/s** "
            f"({r_low['wall_s']}s) |\n"
            f"| throughput @ local[{high}] | **{r_high['urls_per_s']:,} URLs/s** "
            f"({r_high['wall_s']}s) |\n"
            f"| speedup {low}->{high} cores (4x) | {ratio:.2f}x |\n"
            f"| **scaling efficiency** | **{efficiency:.2f}** "
            "(target >= 0.8) |\n\n"
            "Reference single-node ceiling for comparison: 2-8 URLs/s "
            "(4 threads x 0.5s/domain politeness, BASELINE.md).\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
