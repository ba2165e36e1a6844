"""Append extra interleaved local[8] crawl pairs to BENCH/AB_RAW.jsonl.

The scripted A/B (bench_ab_scaling.py) runs 3 local[8] pairs; when its
HEAD reps happen to catch steal storms the best-of-3 ratio is dominated
by host weather. This runner adds more pairs (order alternating,
identical env/pinning) so the distribution — not one lucky rep —
decides. Run AFTER bench_ab_scaling.py finishes, then re-render with
scripts/ab_report.py.

Usage: python scripts/ab_extra_pairs.py [n_pairs] [start_rep]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_ab_scaling import run_crawl  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for i in range(start, start + n_pairs):
        order = ("r3", "head") if i % 2 == 0 else ("head", "r3")
        for v in order:
            run_crawl(v, 8, i)


if __name__ == "__main__":
    main()
