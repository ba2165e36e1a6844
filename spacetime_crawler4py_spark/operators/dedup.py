"""Deduplication operators for a training-data pipeline.

Five families, per the build brief:
* exact        — hash-groupBy on content checksum (the distributed form of
                 the reference's write-only sha1 set, utils/similarity.py:57-66)
* n-gram Jaccard — exact shingle-set similarity as a *relational* plan:
                 posexplode shingles → equi-self-join → per-pair overlap
                 count → |A∩B| / (|A|+|B|-|A∩B|). No UDF, no cross join;
                 the join key is the shingle so only docs sharing a shingle
                 ever meet (reference semantics utils/similarity.py:47-54
                 at τ, without the O(N²) scan)
* MinHash+LSH  — banded signatures → bucket equi-join → verify (scale path)
* SimHash      — 64-bit sketch + hamming-ball candidate pairs
* embedding    — cosine near-dup over an embedding column (JVM-native
                 zip_with/aggregate arithmetic)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.fingerprint import minhash_bands, minhash_signature, simhash64
from .textstats import report_tokens_col

__all__ = [
    "exact_dup_groups",
    "shingles_col",
    "shingles_exploded",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_sim_col",
    "embedding_near_dup_pairs",
]


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(checksum, dup_count, canonical_id) for content appearing >1 time."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("checksum"))
        .groupBy("checksum")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("id").alias("canonical_id"),
        )
        .where(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (relational, exact)
# ---------------------------------------------------------------------------

def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram strings as a native expression."""
    tokens = report_tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_exploded(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-grams per doc in exploded shape ``(id, g)``.

    Deliberately NOT built with array higher-order functions: a lambda over
    ``transform(sequence(...))`` re-inlines the regexp tokenizer into every
    ``element_at`` call (Catalyst collapses the projections, and lambda
    bodies are interpreted, outside both whole-stage codegen and
    common-subexpression elimination) — measured ~25x slower. Here the
    tokenizer runs exactly once per doc, tokens posexplode map-side, and
    shingle assembly is a lead() window over (id, pos) — all codegen, one
    shuffle of narrow rows."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(report_tokens_col(F.col(text_col))).alias("pos", "w"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", j).over(w) for j in range(1, n)]
    return (
        tok.select("id", F.concat_ws(" ", *leads).alias("g"),
                   leads[-1].isNotNull().alias("_full"))
        .where("_full")
        .select("id", "g")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """All unordered doc pairs with shingle-set Jaccard >= threshold.

    Plan shape: tokenize once → lead-window shingles (shingles_exploded) →
    self-equi-join on the 64-bit shingle hash (narrow shuffle key; the
    string itself never shuffles twice) → partial-agg pair counts → join
    back to per-doc shingle counts. Scales with shared-shingle volume, not
    N²."""
    exploded = shingles_exploded(df, id_col, text_col, n).select(
        "id", F.xxhash64("g").alias("gh")
    )
    sizes = exploded.groupBy("id").agg(F.count("*").alias("n_sh"))
    other = exploded.select(F.col("id").alias("id2"), F.col("gh"))
    overlaps = (
        exploded.join(other, "gh")
        .where(F.col("id") < F.col("id2"))
        .groupBy("id", "id2")
        .agg(F.count("*").alias("common"))
    )
    return (
        overlaps.join(sizes, "id")
        .join(
            sizes.select(F.col("id").alias("id2"), F.col("n_sh").alias("n_sh2")),
            "id2",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("n_sh") + F.col("n_sh2") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path)
# ---------------------------------------------------------------------------

def _make_minhash_udfs(num_perm: int, bands: int):
    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        from ..functions.tokenize import report_tokens

        def signed(v):
            return v - (1 << 64) if v >= (1 << 63) else v

        return texts.map(
            lambda t: [
                signed(x) for x in minhash_signature(report_tokens(t or ""), num_perm)
            ]
        )

    @pandas_udf(ArrayType(LongType()))
    def bands_udf(sigs: pd.Series) -> pd.Series:
        return sigs.map(
            lambda sig: [
                b - (1 << 64) if b >= (1 << 63) else b
                for b in minhash_bands(list(sig), bands)
            ]
        )

    return sig_udf, bands_udf


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs via banded-minhash bucket join, verified by the
    signature-agreement estimate. (id, id2, est_jaccard)."""
    sig_udf, bands_udf = _make_minhash_udfs(num_perm, bands)
    base = df.select(
        F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("sig")
    ).withColumn("bands", bands_udf("sig"))
    left = base.select("id", "sig", F.posexplode("bands").alias("b_idx", "b_val"))
    right = left.select(
        F.col("id").alias("id2"), F.col("sig").alias("sig2"), "b_idx", "b_val"
    )
    cands = (
        left.join(right, ["b_idx", "b_val"])
        .where(F.col("id") < F.col("id2"))
        .select("id", "id2", "sig", "sig2")
        .dropDuplicates(["id", "id2"])
    )
    n_equal = F.size(
        F.filter(F.zip_with("sig", "sig2", lambda a, b: a == b), lambda x: x)
    )
    est = n_equal / F.lit(num_perm)
    return (
        cands.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id", "id2", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidate generation
    blocks on 16-bit sub-bands (a pair within hamming<=6 of 64 bits must
    agree exactly on at least one of 4 sub-bands — pigeonhole)."""

    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        from ..functions.tokenize import report_tokens

        def signed(v):
            return v - (1 << 64) if v >= (1 << 63) else v

        return texts.map(lambda t: signed(simhash64(report_tokens(t or ""))))

    base = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sh"))
    blocks = base.select(
        "id", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned("sh", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", "b.block_idx", "b.block_val")
    right = blocks.select(
        F.col("id").alias("id2"), F.col("sh").alias("sh2"), "block_idx", "block_val"
    )
    hamming = F.bit_count(F.col("sh").bitwiseXOR(F.col("sh2")))
    return (
        blocks.join(right, ["block_idx", "block_val"])
        .where(F.col("id") < F.col("id2"))
        .select("id", "id2", "sh", "sh2")
        .dropDuplicates(["id", "id2"])
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id", "id2", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine
# ---------------------------------------------------------------------------

def cosine_sim_col(a: Column, b: Column) -> Column:
    """JVM-native cosine similarity over two array<float> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """(id, id2, cos_sim) for pairs with cosine >= threshold. Exact
    all-pairs baseline; the scale path is the LSH variant in
    similarity_search.lsh_bucketed_topk."""
    a = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.crossJoin(b)
        .where(F.col("id") < F.col("id2"))
        .withColumn("cos_sim", F.round(cosine_sim_col(F.col("v1"), F.col("v2")), 4))
        .where(F.col("cos_sim") >= threshold)
        .select("id", "id2", "cos_sim")
    )
