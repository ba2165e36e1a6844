"""Training-shard sink (sources/shards.py): layout-independent membership,
deterministic in-shard order, balance, and partition-pruned reads."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.sources.shards import (
    read_shard,
    shard_stats,
    write_training_shards,
)

N = 4000
N_SHARDS = 8


def _docs(spark, partitions):
    return (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        .repartition(partitions)
    )


def _shard_members(spark, path):
    rows = spark.read.parquet(path).select("shard", "doc_id").collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["shard"], set()).add(r["doc_id"])
    return out


def test_shard_membership_is_layout_independent(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(_docs(spark, 3), a, "doc_id", N_SHARDS)
    write_training_shards(
        _docs(spark, 17).orderBy(F.col("doc_id").desc()), b, "doc_id", N_SHARDS
    )
    assert _shard_members(spark, a) == _shard_members(spark, b)
    # every row lands in exactly one shard
    assert sum(len(v) for v in _shard_members(spark, a).values()) == N


def test_one_file_per_shard_sorted_within(spark, tmp_path):
    path = str(tmp_path / "s")
    write_training_shards(_docs(spark, 5), path, "doc_id", N_SHARDS)
    for shard in range(N_SHARDS):
        files = glob.glob(f"{path}/shard={shard}/*.parquet")
        assert len(files) == 1, f"shard {shard}: {files}"
        # file order == id order (read without Spark-side sort)
        import pyarrow.parquet as pq

        ids = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)


def test_shards_balanced_and_stats(spark, tmp_path):
    path = str(tmp_path / "s")
    write_training_shards(_docs(spark, 5), path, "doc_id", N_SHARDS)
    stats = {r["shard"]: r["n_rows"] for r in shard_stats(spark, path).collect()}
    assert set(stats) == set(range(N_SHARDS))
    mean = N / N_SHARDS
    assert max(stats.values()) <= 1.2 * mean  # xxhash64 uniformity

def test_read_shard_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "s")
    write_training_shards(_docs(spark, 5), path, "doc_id", N_SHARDS)
    df = read_shard(spark, path, 3)
    got = {r["doc_id"] for r in df.collect()}
    assert got == _shard_members(spark, path)[3]
    # the shard filter must reach the scan as a partition filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    partition_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in partition_filters
