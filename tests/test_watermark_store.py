"""watermark_dim="store": the per-domain (served, enqueued) dim lives
only in the watermarks table, advanced by distributed merges — the
10^7+-domain path where O(domains) driver dicts would not fit. Contract:
identical crawl results to driver mode, the same crash-window repair
(done as a join instead of a collect), and zero growth of driver-held
per-domain state even at 10^5 domains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.sources.store import SnapshotStore
from spacetime_crawler4py_spark.sources.webgen import generate_web
from spacetime_crawler4py_spark.streaming.epochs import CrawlEngine, EngineConfig

WEB_SCHEMA = (
    "url string, status int, final_url string, content_type string, "
    "payload binary, domain string"
)


@pytest.fixture(scope="module")
def web():
    return generate_web(n_pages=40, seed=7)


@pytest.fixture(scope="module")
def web_df(spark, web):
    return spark.createDataFrame(web.to_rows(), WEB_SCHEMA)


def _sets(store):
    return (
        {d.doc_id for d in store.read("documents").collect()},
        {r.url_hash for r in store.read("seen").collect()},
    )


def test_store_mode_matches_driver_mode(spark, web, web_df, tmp_path):
    results = {}
    for mode in ("driver", "store"):
        store = SnapshotStore(spark, str(tmp_path / mode))
        eng = CrawlEngine(
            spark, store, web_df,
            EngineConfig(ordering="relaxed", neardup="off",
                         rounds_per_epoch=2, watermark_dim=mode),
        )
        eng.seed(web.seeds)
        eng.run()
        results[mode] = _sets(store)
        if mode == "store":
            # the whole point: no per-domain driver state, ever
            assert eng._watermarks == {} and eng._next_seq == {}
            wm = {
                r.domain: (r.served, r.enqueued)
                for r in store.read("watermarks").collect()
            }
            fmax = {
                r.domain: r.m
                for r in store.read("frontier")
                .groupBy("domain").agg(F.max("seq").alias("m")).collect()
            }
            for dom, m in fmax.items():
                assert wm[dom][1] == m, (dom, wm[dom], m)
    assert results["driver"] == results["store"]


def test_store_mode_resume(spark, web, web_df, tmp_path):
    cfg = dict(ordering="relaxed", neardup="off", rounds_per_epoch=2,
               watermark_dim="store")
    store_a = SnapshotStore(spark, str(tmp_path / "sa"))
    eng_a = CrawlEngine(spark, store_a, web_df, EngineConfig(**cfg))
    eng_a.seed(web.seeds)
    eng_a.run()

    store_b = SnapshotStore(spark, str(tmp_path / "sb"))
    eng_b1 = CrawlEngine(spark, store_b, web_df, EngineConfig(**cfg))
    eng_b1.seed(web.seeds)
    eng_b1.run(max_rounds=2)
    del eng_b1
    eng_b2 = CrawlEngine(spark, store_b, web_df, EngineConfig(**cfg))
    assert eng_b2._watermarks == {} and eng_b2._next_seq == {}
    eng_b2.run()
    assert _sets(store_a) == _sets(store_b)


def test_store_mode_crash_window_repair(spark, web, web_df, tmp_path):
    """Same stale-snapshot crash window as the driver-mode test, repaired
    by the distributed resume merge instead of a driver collect."""
    import shutil

    cfg = dict(ordering="relaxed", neardup="off", rounds_per_epoch=2,
               watermark_dim="store")
    store = SnapshotStore(spark, str(tmp_path / "crash"))
    eng = CrawlEngine(spark, store, web_df, EngineConfig(**cfg))
    eng.seed(web.seeds)
    eng.run(max_rounds=1)
    v_stale = store.current_version("watermarks")
    eng.run(max_rounds=1)
    del eng
    shutil.copyfile(
        store._manifest_path("watermarks", v_stale),
        store._manifest_path("watermarks"),
    )

    eng2 = CrawlEngine(spark, store, web_df, EngineConfig(**cfg))
    # the resume merge must have lifted enqueued to the frontier's reality
    wm = {r.domain: int(r.enqueued) for r in store.read("watermarks").collect()}
    fmax = {
        r.domain: int(r.m)
        for r in store.read("frontier")
        .groupBy("domain").agg(F.max("seq").alias("m")).collect()
    }
    for dom, m in fmax.items():
        assert wm.get(dom, 0) >= m, (dom, m, wm.get(dom))
    eng2.run()
    dup_slots = (
        store.read("frontier").groupBy("domain", "seq").count()
        .where("count > 1").count()
    )
    assert dup_slots == 0


def test_store_mode_100k_domains_no_driver_state(spark, tmp_path):
    """10^5 domains, externally seeded (as a cluster deployment would):
    one epoch serves every domain once, the watermark dim materializes as
    a 10^5-row table, and the driver's per-domain dicts stay EMPTY."""
    n = 100_000
    page = b"<html><body>" + b"word " * 25 + b"</body></html>"

    frontier = spark.range(n).select(
        F.concat(F.lit("h"), F.col("id")).alias("url_hash"),
        F.concat(
            F.lit("https://d"), F.col("id"), F.lit(".uci.edu/p")
        ).alias("url"),
        F.concat(F.lit("d"), F.col("id"), F.lit(".uci.edu")).alias("domain"),
        (F.col("id") % 8).cast("int").alias("salt"),
        F.lit(None).cast("string").alias("parent"),
        F.lit(-1).cast("bigint").alias("rk_round"),
        F.lit("").alias("rk_pop"),
        F.lit(0).cast("int").alias("rk_pos"),
        F.lit(-1).cast("bigint").alias("epoch_added"),
        F.lit(1).cast("bigint").alias("seq"),
    )
    store = SnapshotStore(spark, str(tmp_path / "big"))
    store.append("frontier", frontier, sort_by=["seq"])

    def fetcher(url):
        return (200, "text/html", page, url)

    eng = CrawlEngine(
        spark, store, None,
        EngineConfig(ordering="relaxed", neardup="off", use_bloom=False,
                     collect_metrics=False, watermark_dim="store"),
        fetcher=fetcher,
    )
    assert eng._watermarks == {} and eng._next_seq == {}
    eng.run(max_rounds=1)
    assert eng._watermarks == {} and eng._next_seq == {}
    wm = store.read("watermarks")
    assert wm.count() == n
    assert wm.where("served = 1").count() == n
    assert store.read("completions").count() == n
