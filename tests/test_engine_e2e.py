"""Golden end-to-end crawl: the Spark engine must reproduce the oracle's
URL-seen set, per-domain crawl ordering, global pop order, saved-document
set, and span sequences (north_rule parity targets)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

from spacetime_crawler4py_spark.oracle.pycrawler import OracleCrawler
from spacetime_crawler4py_spark.sources.store import SnapshotStore
from spacetime_crawler4py_spark.sources.webgen import generate_web
from spacetime_crawler4py_spark.streaming.epochs import CrawlEngine, EngineConfig

WEB_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("final_url", StringType()),
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("domain", StringType()),
    ]
)

N_PAGES = 60  # small graph -> a full exact-mode crawl stays fast


@pytest.fixture(scope="module")
def web():
    return generate_web(n_pages=N_PAGES, seed=42)


@pytest.fixture(scope="module")
def oracle_result(web):
    return OracleCrawler(web).run()


@pytest.fixture(scope="module")
def web_df(spark, web):
    return spark.createDataFrame(web.to_rows(), WEB_SCHEMA)


def _run_engine(spark, web, web_df, tmpdir, **cfg_kwargs):
    store = SnapshotStore(spark, str(tmpdir))
    engine = CrawlEngine(
        spark, store, web_df, EngineConfig(**cfg_kwargs)
    )
    engine.seed(web.seeds)
    engine.run()
    return store, engine


@pytest.fixture(scope="module")
def exact_run(spark, web, web_df, tmp_path_factory):
    return _run_engine(
        spark, web, web_df, tmp_path_factory.mktemp("exact"),
        ordering="exact", neardup="exact",
    )


def test_url_seen_set_matches_oracle(exact_run, oracle_result):
    store, _ = exact_run
    engine_seen = {
        r.url_hash: r.url for r in store.read("frontier").collect()
    }
    assert engine_seen == oracle_result.seen


def test_global_pop_order_matches_oracle(exact_run, oracle_result):
    store, _ = exact_run
    log = store.read("fetch_log").orderBy("round", "url").collect()
    # reconstruct engine pop order from completions round + fetch_log order?
    # fetch_log is appended per round in pop order but parquet does not
    # guarantee row order -> use the fingerprints ord key for ok pages and
    # compare per-domain order below; here compare the *set* per round.
    oracle_rounds = {}
    for idx, t, domain, url in oracle_result.crawl_order:
        oracle_rounds.setdefault(round(t / 0.5), set()).add(url)
    engine_rounds = {}
    comp = store.read("completions").collect()
    frontier = {r.url_hash: r.url for r in store.read("frontier").collect()}
    for r in comp:
        engine_rounds.setdefault(r.round, set()).add(frontier[r.url_hash])
    assert engine_rounds == {int(k): v for k, v in oracle_rounds.items()}


def test_per_domain_order_matches_oracle(exact_run, oracle_result):
    store, _ = exact_run
    # per-domain dequeue order == FIFO discovery order == rk sort
    frontier = store.read("frontier").collect()
    per_domain: dict[str, list[str]] = {}
    for r in sorted(frontier, key=lambda r: (r.rk_round, r.rk_pop, r.rk_pos)):
        per_domain.setdefault(r.domain, []).append(r.url)
    oracle_pd = oracle_result.per_domain_order()
    # engine frontier contains every seen URL; oracle crawl_order contains
    # only dequeued ones — every pending URL was dequeued at fixpoint
    assert per_domain == oracle_pd


def test_saved_documents_match_oracle(exact_run, oracle_result):
    store, _ = exact_run
    docs = store.read("documents").collect()
    assert {d.doc_id for d in docs} == set(oracle_result.documents)


def test_span_sequences_match_oracle(exact_run, oracle_result):
    store, _ = exact_run
    docs = {d.doc_id: d.spans for d in store.read("documents").collect()}
    for doc_id, expected in oracle_result.documents.items():
        got = [(s.kind, s.text, s.media_ref) for s in docs[doc_id]]
        assert got == expected, doc_id
        offsets = [s.offset for s in docs[doc_id]]
        assert offsets == list(range(len(offsets))), doc_id


def test_relaxed_mode_matches_seen_set(
    spark, web, web_df, oracle_result, tmp_path_factory
):
    """Relaxed (scale) ordering defers mid-round joiners one epoch but must
    still converge to the identical URL-seen set and saved docs."""
    store, _ = _run_engine(
        spark, web, web_df, tmp_path_factory.mktemp("relaxed"),
        ordering="relaxed", neardup="lsh", rounds_per_epoch=4, use_bloom=True,
    )
    engine_seen = {r.url_hash: r.url for r in store.read("frontier").collect()}
    assert set(engine_seen) == set(oracle_result.seen)
    # first-seen URL strings can differ only for scheme-folded twins
    diffs = {
        h: (u, oracle_result.seen[h])
        for h, u in engine_seen.items()
        if u != oracle_result.seen[h]
    }
    for h, (ours, theirs) in diffs.items():
        assert ours.split("://", 1)[1] == theirs.split("://", 1)[1], diffs
    docs = {d.doc_id for d in store.read("documents").collect()}
    # relaxed ordering may pick the *other* member of a near-dup class to
    # save (epoch-boundary order deviation); anything outside near-dup
    # classes must match exactly
    oracle_docs = set(oracle_result.documents)
    near_dup_class = {d for pair in oracle_result.near_dup_skips for d in pair}
    assert docs.symmetric_difference(oracle_docs) <= near_dup_class
    assert len(docs) == len(oracle_docs)


def test_politeness_budget_property(exact_run):
    """No domain is served more than once per round (>= 0.5 s/domain)."""
    store, _ = exact_run
    comp = store.read("completions").collect()
    frontier = {r.url_hash: r.domain for r in store.read("frontier").collect()}
    seen_pairs = set()
    for r in comp:
        key = (frontier[r.url_hash], r.round)
        assert key not in seen_pairs, key
        seen_pairs.add(key)


def test_monotone_seen_no_revisits(exact_run):
    store, _ = exact_run
    frontier = store.read("frontier").collect()
    hashes = [r.url_hash for r in frontier]
    assert len(hashes) == len(set(hashes))  # one insert per hash, ever
    comp = store.read("completions").collect()
    done = [r.url_hash for r in comp]
    assert len(done) == len(set(done))  # fetched at most once


def test_exact_mode_neardup_off_saves_documents(spark, web, web_df, tmp_path_factory):
    """neardup='off' in exact ordering must actually be off: with sketches
    disabled every doc's fingerprint set is empty and jaccard(∅,∅)=1, so
    an unguarded near-dup probe would flag every doc after the first and
    save exactly one document."""
    store, engine = _run_engine(
        spark, web, web_df, tmp_path_factory.mktemp("exact_off"),
        ordering="exact", neardup="off",
    )
    n_docs = store.read("documents").count()
    assert n_docs > 1
    # near-dup-off must save at least as many docs as the near-dup run
    store2, _ = _run_engine(
        spark, web, web_df, tmp_path_factory.mktemp("exact_nd"),
        ordering="exact", neardup="exact",
    )
    assert n_docs >= store2.read("documents").count()
