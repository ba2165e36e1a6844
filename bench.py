"""Benchmark harness.

Runs (a) the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and (b) the north-rule crawl throughput benchmark —
frontier dequeue + fetch + parse + merge over a synthetic skewed frontier —
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores (default 32)
  BENCH_CRAWL_URLS     synthetic frontier size (default 1000000)
  BENCH_CRAWL_EPOCHS   epochs to run (default 2, after 1 warmup)
  BENCH_CRAWL_TOKENS   politeness tokens per domain per epoch (default 128)
  BENCH_CRAWL_DOMAINS  domain count (default 1500)
  BENCH_CRAWL_REPS     independent crawl reps; headline = best (default 2)
  BENCH_SKIP_QUERIES   "1" -> crawl benchmark only

The crawl headline is best-of-BENCH_CRAWL_REPS with every rep reported:
this VM suffers hypervisor steal storms that swing identical runs up to
2x (BENCH/BASELINE.md documents the calibration), so a single-shot
number confounds engine changes with host weather. Each rep is fully
isolated (fresh frontier, fresh store) and carries its /proc/stat steal
and busy jiffy deltas so a depressed rep is attributable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

import __spark_entry__ as entry
from spacetime_crawler4py_spark.session import get_spark
from spacetime_crawler4py_spark.sources.store import SnapshotStore
from spacetime_crawler4py_spark.sources.synthfrontier import (
    make_synthetic_fetcher,
    synthetic_crawl_inputs,
)
from spacetime_crawler4py_spark.streaming.epochs import CrawlEngine, EngineConfig

# headline queries (subset of the contract suite that is meaningful at sf0.1)
BENCH_QUERIES = [
    "top_words",
    "longest_doc",
    "quality_scores",
    "langid",
    "fingerprints",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dedup_components",
    "repetition_scores",
    "curation_pipeline",
    "dup_spans",
    "dup_span_removal",
    "dup_span_removal_v2",
    "paragraph_dedup",
    "unigram_logprob",
    "bigram_logprob",
    "langid_ngram",
    "quality_model",
    "inverted_index",
    "phrase_search",
    "value_percentiles",
    "collocations",
    "curation_full",
    "curation_quality_gate",
    "stratified_sample",
    "length_deciles",
    "decontamination",
    "source_quota",
    "pagerank",
    "anchor_text",
    "bm25_search",
    "embedding_quantize",
    "sequence_packing",
    "doc_chunks",
    "pii_scrub",
    "temperature_mix",
    "sitemap_ingest",
    "recrawl_schedule",
    "corpus_build",
    "embedding_topk",
    "embedding_near_dups",
    "ann_lsh",
    "ann_ivf",
    "ann_ivf_trained",
    "semdedup",
    "seen_anti_join",
    "first_seen",
    "token_bucket_dequeue",
    "crawl_budget",
    "revenue_rollup",
    "asof_latest_order",
    "range_window_rollup",
    "url_seen_hash",
    "is_valid_filter",
    "robots_gate",
    "near_dup_flags",
    "subdomain_histogram",
    "event_windows",
    "sessionize",
    "media_metadata",
    "frame_sample",
    "decode_features",
    # Structured Streaming contract runs (file source -> availableNow ->
    # sink): these time the streaming path itself — micro-batch planning,
    # state store, watermark commit — not just the stateless plan
    "streaming_event_windows",
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_trending_words",
]


def time_queries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    qs = entry.queries()
    # one unmeasured warmup (same policy as the crawl's warm epoch): the
    # first job of a session pays JVM codegen, parquet footer reads, and
    # Arrow Python-worker pool startup — measured ~5.5s charged to
    # whatever query runs first. Warm one JVM-native and one Arrow-UDF
    # plan so the timed loop measures steady-state per-query cost.
    qs["top_words"](spark, sf_dir).count()
    qs["url_seen_hash"](spark, sf_dir).count()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
        print(f"[bench] {name}: {out[name]:.2f}s ({n} rows)", file=sys.stderr)
    return out


def _cpu_jiffies() -> tuple[int, int]:
    """(busy, steal) jiffies from the aggregate /proc/stat cpu line.
    Only the first 8 fields count: guest/guest_nice (fields 9-10) are
    already folded into user/nice by the kernel, so summing them would
    double-count guest time and overstate busy on a virtualized host —
    the exact busy-vs-steal comparison these numbers exist for."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(v) for v in parts[1:9]]
    idle = vals[3] + vals[4]  # idle + iowait
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals) - idle, steal


def crawl_throughput(
    spark: SparkSession,
    n_urls: int,
    n_domains: int,
    tokens: int,
    epochs: int,
) -> dict:
    """The north-rule metric: URLs/s through dequeue+fetch+parse+merge."""
    # seed half the graph: crawling discovers the rest via outlinks, so the
    # measured epochs carry real dedup + anti-join + merge volume
    frontier, _web = synthetic_crawl_inputs(
        spark, n_urls, n_domains, seed_fraction=0.5
    )
    tmp = tempfile.mkdtemp(prefix="crawlbench-")
    try:
        store = SnapshotStore(spark, tmp)
        # materialize the frontier before the clock starts (seq-sorted so
        # the indexed dequeue's scan bound prunes row groups, as the
        # engine's own appends do)
        store.append("frontier", frontier, sort_by=["seq"])
        engine = CrawlEngine(
            spark, store, None,
            EngineConfig(
                ordering="relaxed", rounds_per_epoch=tokens, neardup="off",
                use_bloom=True, collect_metrics=False, compact_every=4,
                dedup_doc_ids=False,  # synthetic fetcher never redirects
            ),
            fetcher=make_synthetic_fetcher(n_urls, n_domains),
        )
        # one unmeasured epoch warms JVM codegen + the Python worker pool so
        # the clocked epochs measure steady-state throughput (the quantity
        # that matters at 10^10 scale), not session startup
        engine.run(max_rounds=1)
        warm = store.read("completions").count()
        busy0, steal0 = _cpu_jiffies()
        t0 = time.monotonic()
        engine.run(max_rounds=epochs)
        wall = time.monotonic() - t0
        busy1, steal1 = _cpu_jiffies()
        pops = store.read("completions").count() - warm
        return {
            "urls": int(pops),
            "wall_s": round(wall, 2),
            "urls_per_s": round(pops / wall, 1),
            "epochs": epochs,
            "tokens_per_domain_per_epoch": tokens,
            "frontier_size": n_urls,
            "domains": n_domains,
            "busy_jiffies": busy1 - busy0,
            "steal_jiffies": steal1 - steal0,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def crawl_best_of(spark: SparkSession, reps: int, **kw) -> dict:
    """Best-of-N independent crawl reps (fresh frontier + store per rep).
    Returns the fastest rep with all reps attached under "reps" — best-of
    is the documented policy for this steal-stormy VM; the per-rep jiffy
    deltas let a reader verify a slow rep was host weather, not the
    engine."""
    runs = [crawl_throughput(spark, **kw) for _ in range(max(1, reps))]
    best = max(runs, key=lambda r: r["urls_per_s"])
    return {
        **best,
        "reps": [
            {k: r[k] for k in ("urls_per_s", "wall_s", "busy_jiffies",
                               "steal_jiffies")}
            for r in runs
        ],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    t_total = time.monotonic()

    qtimes: dict[str, float] = {}
    if os.environ.get("BENCH_SKIP_QUERIES") != "1":
        qtimes = time_queries(spark, sf_dir)

    crawl = crawl_best_of(
        spark,
        reps=int(os.environ.get("BENCH_CRAWL_REPS", "2")),
        n_urls=int(os.environ.get("BENCH_CRAWL_URLS", "1000000")),
        n_domains=int(os.environ.get("BENCH_CRAWL_DOMAINS", "1500")),
        tokens=int(os.environ.get("BENCH_CRAWL_TOKENS", "128")),
        epochs=int(os.environ.get("BENCH_CRAWL_EPOCHS", "2")),
    )
    qtimes["crawl_epochs"] = crawl["wall_s"]

    total = round(time.monotonic() - t_total, 2)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "frontier dequeue+fetch+merge throughput (URLs/s) "
                "+ headline query suite",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf),
                "crawl": crawl,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
