"""Training-shard sink: the final write of a corpus build.

Trainers stream shards sequentially, so the on-disk contract matters more
than for analytical tables: (a) shard membership must be a pure function
of row identity — re-running the build on a different cluster layout must
produce byte-identical shard membership, or dataset versioning breaks;
(b) rows within a shard must be deterministically ordered, or two "equal"
builds shuffle sample order and training runs diverge; (c) shards must be
balanced, since the slowest shard gates every epoch of a data-parallel
loader.

This writer keys shard assignment off ``xxhash64(id)`` (layout-independent,
like operators/sampling.py keys sampling off md5), sorts within shards by
id, and writes one parquet file per shard under ``shard=N/`` directories —
a layout any parquet reader (Spark, DuckDB, Arrow dataset loaders)
partition-prunes natively. At 100 TB the write is one hash repartition of
the final kept rows; no global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["shard_col", "write_training_shards", "read_shard", "shard_stats"]


def shard_col(id_col, n_shards: int):
    """Deterministic shard id in [0, n_shards): pmod of the row-id hash.
    Pure function of the id — independent of partitioning and ordering."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    mode: str = "error",
) -> None:
    """Write df as n_shards hash shards, one parquet file per shard,
    sorted by id within each shard. Idempotent: the same input rows yield
    the same shard membership and in-shard order on any cluster."""
    out = df.withColumn("shard", shard_col(F.col(id_col), n_shards))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard's rows (partition-pruned scan — only that directory is
    read), in the written id order within each file."""
    return spark.read.parquet(path).where(F.col("shard") == shard)


def shard_stats(spark: SparkSession, path: str) -> DataFrame:
    """(shard, n_rows) balance readout — the slowest shard gates a
    data-parallel loader, so builds assert on max/mean here."""
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n_rows"))
    )
