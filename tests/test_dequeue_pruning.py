"""Parquet row-group pruning under the indexed politeness dequeue.

The per-domain dequeue predicate (``served < seq <= served + tokens``)
involves the broadcast-joined watermark column and cannot reach the
parquet reader — but ``max(served) + tokens`` is a literal upper bound
implied by it, and the SnapshotStore writes frontier deltas/bases sorted
by ``seq``. Together: the bound pushes into the scan (PushedFilters) and
row groups holding only the deep tail of hot domains' queues are skipped
at the footer. These tests make the round-2 claim (plans/dequeue.py)
measurably true instead of aspirational."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.plans.dequeue import politeness_heads_indexed
from spacetime_crawler4py_spark.sources.store import SnapshotStore

N_ROWS = 120_000
HOT_DOMAIN = "hot.ics.uci.edu"
TOKENS = 64


@pytest.fixture(scope="module")
def frontier_store(spark, tmp_path_factory):
    """A skewed frontier (~2/3 of rows are one hot domain's deep queue)
    written seq-sorted with small parquet row groups so pruning is
    observable at test scale (real tables get multiple groups for free)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        # hot domain: seq 1..80k; 100 cold domains: seq 1..400 each
        hot = spark.range(1, 80_001).select(
            F.concat(F.lit("u"), F.col("id")).alias("url_hash"),
            F.concat(F.lit(f"https://{HOT_DOMAIN}/p"), F.col("id")).alias("url"),
            F.lit(HOT_DOMAIN).alias("domain"),
            (F.col("id") % 8).cast("int").alias("salt"),
            F.lit(None).cast("string").alias("parent"),
            (F.col("id") / 100).cast("bigint").alias("rk_round"),
            F.lit("").alias("rk_pop"),
            F.lit(0).alias("rk_pos").cast("int"),
            F.lit(0).cast("bigint").alias("epoch_added"),
            F.col("id").cast("bigint").alias("seq"),
        )
        cold = spark.range(0, N_ROWS - 80_000).select(
            F.concat(F.lit("c"), F.col("id")).alias("url_hash"),
            F.concat(
                F.lit("https://d"), (F.col("id") % 100),
                F.lit(".uci.edu/p"), F.col("id"),
            ).alias("url"),
            F.concat(F.lit("d"), (F.col("id") % 100), F.lit(".uci.edu")).alias(
                "domain"
            ),
            (F.col("id") % 8).cast("int").alias("salt"),
            F.lit(None).cast("string").alias("parent"),
            (F.col("id") / 100).cast("bigint").alias("rk_round"),
            F.lit("").alias("rk_pop"),
            F.lit(0).alias("rk_pos").cast("int"),
            F.lit(0).cast("bigint").alias("epoch_added"),
            (F.floor(F.col("id") / 100) + 1).cast("bigint").alias("seq"),
        )
        store = SnapshotStore(
            spark, str(tmp_path_factory.mktemp("prune") / "store")
        )
        store.append("frontier", hot.unionByName(cold), sort_by=["seq"])
        yield store
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)


def _row_group_stats(store: SnapshotStore):
    """(min_seq, max_seq) per row group across the frontier's files, in
    global sort order (part-file names sort in range-partition order)."""
    table_dir = os.path.join(store.base_dir, "frontier")
    stats = []
    for path in sorted(glob.glob(os.path.join(table_dir, "*", "*.parquet"))):
        meta = pq.ParquetFile(path).metadata
        idx = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }["seq"]
        for g in range(meta.num_row_groups):
            col = meta.row_group(g).column(idx)
            stats.append((col.statistics.min, col.statistics.max))
    return stats


def test_delta_is_seq_sorted_with_multiple_row_groups(frontier_store):
    stats = _row_group_stats(frontier_store)
    assert len(stats) >= 8, f"only {len(stats)} row groups — no pruning bite"
    # globally sorted write => non-decreasing, tight per-group seq ranges
    for (lo1, hi1), (lo2, _hi2) in zip(stats, stats[1:]):
        assert lo1 <= hi1 <= lo2 + 1


def test_bound_reaches_parquet_scan_as_pushed_filter(spark, frontier_store):
    wm = spark.createDataFrame(
        [(HOT_DOMAIN, 128)], "domain string, served bigint"
    )
    dq = politeness_heads_indexed(
        frontier_store.read("frontier"), wm, TOKENS, max_seq_bound=128 + TOKENS
    )
    plan = dq._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(seq,192)" in plan, plan


def test_pruning_skips_most_row_groups(frontier_store):
    """With max(served)=128 the scan bound is 192: every row group whose
    min seq exceeds it — the hot domain's deep tail, most of this table —
    must be footer-prunable."""
    stats = _row_group_stats(frontier_store)
    bound = 128 + TOKENS
    prunable = sum(1 for lo, _hi in stats if lo > bound)
    assert prunable / len(stats) > 0.5, (prunable, len(stats))


def test_bound_does_not_change_dequeue_semantics(spark, frontier_store):
    frontier = frontier_store.read("frontier")
    wm = spark.createDataFrame(
        [(HOT_DOMAIN, 128), ("d7.uci.edu", 3)], "domain string, served bigint"
    )
    bounded = politeness_heads_indexed(
        frontier, wm, TOKENS, max_seq_bound=128 + TOKENS
    )
    unbounded = politeness_heads_indexed(frontier, wm, TOKENS)
    key = lambda r: (r.domain, r.seq, r.slot)
    got = sorted(map(key, bounded.collect()))
    want = sorted(map(key, unbounded.collect()))
    assert got == want and got
    # the hot domain serves exactly its next TOKENS seqs after the watermark
    hot = [s for (d, s, _) in got if d == HOT_DOMAIN]
    assert hot == list(range(129, 129 + TOKENS))
