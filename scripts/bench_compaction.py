"""Epoch wall-time flatness under tiered compaction (round-4 evidence).

Round 3 left fingerprints/documents/fetch_log uncompacted, so each
epoch re-read O(epochs) delta dirs and a long crawl degraded
monotonically. Round 4's SnapshotStore.compact_tail bounds read fan-in
at O(log epochs). This script runs a long multi-epoch crawl twice —
compaction OFF vs compact_every=4 — over the same synthetic frontier
and prints the per-epoch wall times plus the per-table manifest fan-in
at the end, then rewrites BENCH/COMPACTION.md.

Flatness is judged on the LAST-third vs FIRST-third mean epoch time
(steal storms make single epochs noisy; thirds average it out).

Env knobs: COMPBENCH_URLS (default 2000000), COMPBENCH_DOMAINS (1500),
COMPBENCH_TOKENS (16), COMPBENCH_EPOCHS (20), SPARK_GRAFT_CPUS (32).
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from spacetime_crawler4py_spark.session import get_spark  # noqa: E402
from spacetime_crawler4py_spark.sources.store import SnapshotStore  # noqa: E402
from spacetime_crawler4py_spark.sources.synthfrontier import (  # noqa: E402
    make_synthetic_fetcher,
    synthetic_crawl_inputs,
)
from spacetime_crawler4py_spark.streaming.epochs import (  # noqa: E402
    CrawlEngine,
    EngineConfig,
)

TABLES = ("frontier", "seen", "completions", "fingerprints", "documents",
          "fetch_log")


def run(spark, n_urls, n_domains, tokens, epochs, compact_every):
    frontier, _ = synthetic_crawl_inputs(
        spark, n_urls, n_domains, seed_fraction=0.5
    )
    tmp = tempfile.mkdtemp(prefix=f"compbench-{compact_every}-")
    try:
        store = SnapshotStore(spark, tmp)
        store.append("frontier", frontier, sort_by=["seq"])
        eng = CrawlEngine(
            spark, store, None,
            EngineConfig(
                ordering="relaxed", rounds_per_epoch=tokens,
                # neardup OFF: the LSH band join's right side grows with
                # the corpus itself (every epoch re-scores against all
                # prior fingerprints) — linear work growth by algorithmic
                # necessity that no compaction policy can or should hide.
                # With it off, the only per-epoch growth is table-read
                # cost (seen probe, prior-docs anti-join): exactly the
                # fan-in overhead compact_tail exists to bound. The
                # fingerprints fan-in bound itself is unit-tested in
                # tests/test_round4_core.py with neardup=lsh.
                neardup="off",
                use_bloom=True, collect_metrics=False,
                compact_every=compact_every, dedup_doc_ids=False,
            ),
            fetcher=make_synthetic_fetcher(n_urls, n_domains),
        )
        eng.run(max_rounds=1)  # warmup epoch (unmeasured JVM/Arrow startup)
        eng.run(max_rounds=epochs)
        walls = [
            float(r.wall_s)
            for r in store.read("metrics").orderBy("round").collect()
        ][1:]  # drop the warmup epoch
        fanin = {
            t: len(store._load_manifest(t)["paths"])
            for t in TABLES if store.exists(t)
        }
        return walls, fanin
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_urls = int(os.environ.get("COMPBENCH_URLS", "2000000"))
    n_domains = int(os.environ.get("COMPBENCH_DOMAINS", "1500"))
    tokens = int(os.environ.get("COMPBENCH_TOKENS", "16"))
    epochs = int(os.environ.get("COMPBENCH_EPOCHS", "20"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="compbench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, ce in (("off", 0), ("every4", 4)):
        walls, fanin = run(spark, n_urls, n_domains, tokens, epochs, ce)
        third = max(1, len(walls) // 3)
        first = sum(walls[:third]) / third
        last = sum(walls[-third:]) / third
        results[label] = dict(walls=walls, fanin=fanin, first=first,
                              last=last, ratio=last / first)
        print(f"[{label}] epochs={len(walls)} first-third={first:.2f}s "
              f"last-third={last:.2f}s ratio={results[label]['ratio']:.2f} "
              f"fanin={fanin}", file=sys.stderr)

    lines = [
        "# Epoch wall-time flatness under tiered compaction",
        "",
        f"Setup: {n_urls} synthetic URLs / {n_domains} domains / "
        f"{tokens} tokens/domain/epoch, {epochs} measured epochs after one "
        f"warmup, neardup=off (so per-epoch offered load is constant and "
        "the only growth is table-read fan-in — the LSH band join grows "
        "with corpus size by algorithmic necessity, which compaction "
        f"cannot hide), local[{cpus}]. The frontier is sized so it never "
        "drains (draining made late epochs cheaper and confounded the "
        "first version of this bench). Same frontier for both runs; "
        "`python scripts/bench_compaction.py` regenerates this file.",
        "",
        "| run | first-third mean | last-third mean | last/first | "
        "manifest fan-in at end |",
        "|---|---|---|---|---|",
    ]
    for label in ("off", "every4"):
        r = results[label]
        fan = ", ".join(f"{t}={n}" for t, n in sorted(r["fanin"].items()))
        lines.append(
            f"| compaction {label} | {r['first']:.2f}s | {r['last']:.2f}s "
            f"| {r['ratio']:.2f} | {fan} |"
        )
    lines += [
        "",
        "Per-epoch wall seconds:",
        "",
        f"* off:    {' '.join(f'{w:.2f}' for w in results['off']['walls'])}",
        f"* every4: {' '.join(f'{w:.2f}' for w in results['every4']['walls'])}",
        "",
        "Reading: with compaction off, fingerprints/documents/fetch_log "
        "manifests grow one path per epoch (each delta dir holding up to one "
        "part file per core) and each epoch re-reads the whole fan; "
        "with compact_every=4 the tiered tail merge "
        "(SnapshotStore.compact_tail) keeps fan-in O(log epochs) and the "
        "last-third/first-third ratio near 1. Single epochs are noisy on "
        "this VM (hypervisor steal) — judge the thirds, not points.",
    ]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/COMPACTION.md", "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
