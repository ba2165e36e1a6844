#!/usr/bin/env python
"""A/B the indexed dequeue's parquet row-group pruning at bench scale.

The dequeue's per-domain predicate joins the watermark dim and cannot be
pushed to the scan; the derived literal bound ``max(served) + tokens``
can (plans/dequeue.py). This script builds the same synthetic skewed
frontier the headline bench uses, writes it seq-sorted (as the engine
does), and times the dequeue with and without the bound at a mid-crawl
watermark, reporting wall clock, rows scanned-vs-selected, and the
footer-prunable share of row groups/bytes. Appends (replaces) the
"## Indexed-dequeue parquet pruning" section of BENCH/BASELINE.md.

Env: BENCH_PRUNE_URLS (default 4_000_000), BENCH_PRUNE_CPUS (default 8),
BENCH_PRUNE_REPS (default 3).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_URLS = int(os.environ.get("BENCH_PRUNE_URLS", "4000000"))
CPUS = int(os.environ.get("BENCH_PRUNE_CPUS", "8"))
REPS = int(os.environ.get("BENCH_PRUNE_REPS", "3"))
DOMAINS = 1500
TOKENS = 768
SERVED = 768  # one headline epoch already served everywhere


def main() -> None:
    from pyspark.sql import functions as F

    import pyarrow.parquet as pq

    from spacetime_crawler4py_spark.plans.dequeue import politeness_heads_indexed
    from spacetime_crawler4py_spark.session import get_spark
    from spacetime_crawler4py_spark.sources.store import SnapshotStore
    from spacetime_crawler4py_spark.sources.synthfrontier import (
        synthetic_crawl_inputs,
    )

    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="prunebench-")
    store = SnapshotStore(spark, tmp)
    frontier_df, _web = synthetic_crawl_inputs(
        spark, N_URLS, n_domains=DOMAINS, seed_fraction=1.0
    )
    store.append("frontier", frontier_df, sort_by=["seq"])

    domains = [r.domain for r in store.read("frontier")
               .select("domain").distinct().collect()]
    wm = spark.createDataFrame(
        [(d, SERVED) for d in domains], "domain string, served bigint"
    )
    bound = SERVED + TOKENS

    # footer statistics: how much of the table the bound can skip
    groups_total = groups_prunable = 0
    bytes_total = bytes_prunable = 0
    for path in glob.glob(os.path.join(tmp, "frontier", "*", "*.parquet")):
        meta = pq.ParquetFile(path).metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}["seq"]
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            groups_total += 1
            bytes_total += rg.total_byte_size
            # a chunk without footer stats is simply unprunable, not an
            # error (writer configs can disable statistics)
            st = rg.column(idx).statistics
            if st is not None and st.has_min_max and st.min > bound:
                groups_prunable += 1
                bytes_prunable += rg.total_byte_size

    def run(bounded: bool) -> tuple[float, int]:
        best = float("inf")
        n = -1
        for _ in range(REPS):
            t0 = time.monotonic()
            dq = politeness_heads_indexed(
                store.read("frontier"), wm, TOKENS,
                max_seq_bound=bound if bounded else None,
            )
            n = dq.count()
            best = min(best, time.monotonic() - t0)
        return best, n

    t_unbounded, n_unbounded = run(False)
    t_bounded, n_bounded = run(True)
    assert n_bounded == n_unbounded, (n_bounded, n_unbounded)

    summary = {
        "frontier_urls": N_URLS,
        "domains": DOMAINS,
        "served_per_domain": SERVED,
        "tokens": TOKENS,
        "dequeued_rows": n_bounded,
        "dequeue_s_unbounded": round(t_unbounded, 2),
        "dequeue_s_bounded": round(t_bounded, 2),
        "speedup": round(t_unbounded / t_bounded, 2),
        "row_groups_prunable": f"{groups_prunable}/{groups_total}",
        "bytes_prunable_pct": round(100 * bytes_prunable / bytes_total, 1),
    }

    section = (
        "## Indexed-dequeue parquet pruning (round 3)\n\n"
        "The dequeue's per-domain watermark predicate cannot reach the\n"
        "scan, but its implied literal bound max(served)+tokens can —\n"
        "and frontier deltas/bases are written seq-sorted, so footer\n"
        "min/max stats on seq are tight. Measured on the headline bench\n"
        f"input ({N_URLS:,} URLs, {DOMAINS} domains, served={SERVED},\n"
        f"tokens={TOKENS}, local[{CPUS}], best of {REPS}):\n\n"
        "| metric | value |\n|---|---|\n"
        f"| dequeue (scan filter WITHOUT bound) | {t_unbounded:.2f}s |\n"
        f"| dequeue (scan filter WITH bound) | **{t_bounded:.2f}s** "
        f"({t_unbounded / t_bounded:.2f}x) |\n"
        f"| rows selected (identical both ways) | {n_bounded:,} |\n"
        f"| row groups footer-prunable | {groups_prunable}/{groups_total} |\n"
        f"| bytes footer-prunable | "
        f"{100 * bytes_prunable / bytes_total:.1f}% |\n\n"
        "At 10^10 frontier rows the unpruned scan grows with the table\n"
        "while the pruned scan grows only with the dequeue window — the\n"
        "bound turns the per-epoch dequeue from O(frontier) read volume\n"
        "to O(active window).\n"
    )

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, encoding="utf-8") as f:
        text = f.read()
    pat = re.compile(
        r"## Indexed-dequeue parquet pruning.*?(?=\n## |\Z)", re.DOTALL
    )
    if pat.search(text):
        text = pat.sub(section, text)
    else:
        text = text.rstrip() + "\n\n" + section
    with open(md, "w", encoding="utf-8") as f:
        f.write(text)

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
