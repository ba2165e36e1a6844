"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk``   — exact cosine top-k (the correctness baseline);
  JVM-native arithmetic (zip_with/aggregate), window-ranked top-k, which
  Catalyst executes as partial top-k per partition (TakeOrdered-style)
  rather than a full sort.
* ``lsh_bucketed_topk``  — the scale path: deterministic random-hyperplane
  signatures; candidates meet only within a bucket, turning the N×M cross
  join into an equi-join. Recall is tunable via n_planes/n_tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .dedup import cosine_sim_col

__all__ = ["brute_force_topk", "lsh_bucketed_topk"]


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """For each probe, the k nearest corpus vectors by cosine (excluding
    self-matches by id). Returns (probe_id, neighbor_id, cos_sim, rank)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        p.crossJoin(c)
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_sim_col(F.col("pv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def _plane_matrix(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)


def lsh_bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH ANN: sign-pattern bucket per table, equi-join
    probes to corpus on (table, bucket), exact cosine re-rank within the
    candidate set. Same output shape as brute_force_topk (rank within
    found candidates; recall < 1.0 by design)."""
    planes = _plane_matrix(dim, n_planes, n_tables, seed)

    @pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        out = []
        signs = np.einsum("tpd,bd->btp", planes, mat) > 0  # (batch, tables, planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = (signs * weights).sum(axis=2)  # (batch, tables)
        for row in codes:
            out.append([int(v) for v in row])
        return pd.Series(out)

    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}v"),
            )
            .withColumn("_bk", buckets_udf(F.col(f"{prefix}v")))
            .select(
                f"{prefix}_id", f"{prefix}v",
                F.posexplode("_bk").alias("table_idx", "bucket"),
            )
        )

    pb = with_buckets(probes, "probe")
    cb = with_buckets(corpus, "neighbor")
    cands = (
        pb.join(cb, ["table_idx", "bucket"])
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "probev", "neighbor_id", "neighborv")
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn(
            "cos_sim",
            F.round(cosine_sim_col(F.col("probev"), F.col("neighborv")), 4),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )
