"""Sequence packing — the corpus-build step that turns a deduplicated,
curated document stream into fixed-length training examples.

GPT-style "concat-and-chunk" packing: order documents deterministically,
lay their token streams end to end, and cut the concatenation into
sequences of exactly ``seq_len`` tokens. A document whose span crosses a
cut contributes pieces to consecutive sequences. The output is the
packing *manifest*: for every (document, sequence) incidence, where in
the document the piece starts, where in the sequence it lands, and how
long it is — everything a shard writer needs to emit token ids without
re-deriving global offsets.

Scale shape
-----------
The global running offset is the whole problem: a naive
``sum(n) OVER (ORDER BY id)`` is a single-partition window — one task
owns the entire corpus. Instead the offsets are computed in two levels,
the same pattern the crawl frontier uses for politeness ``seq``
assignment (streaming/epochs.py):

1. deterministic fixed-width id buckets (``bucket = id // bucket_width``)
   partition the window: per-bucket cumulative sums run in parallel,
   each task touching only its bucket;
2. per-bucket token totals (one row per bucket) get an exclusive
   prefix-sum on a frame that is O(#buckets) — thousands of rows for a
   100 TB corpus — and broadcast-join back.

No stage ever materializes a global ordering; determinism comes from the
id order itself, so the result is identical under any input
partitioning (property-tested).

Everything is integer arithmetic on token *counts* (the tokenizer is
upstream), so the operator is hash-exact checkable against a plain SQL
window oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_token_spans", "pack_manifest", "chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    window: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Overlapping fixed-window chunking — the long-document split a
    training pipeline applies BEFORE packing (packing concatenates,
    chunking subdivides; context-window pretraining and RAG indexing both
    consume this shape). Chunk i of a doc with n tokens covers token span
    [i*stride, min(i*stride + window, n)) with stride = window - overlap;
    the chunk count is 1 for n <= window else 1 + ceil((n - window) /
    stride), so the final chunk always reaches the document tail and every
    consecutive pair shares ``overlap`` tokens.

    Output: (doc_id, chunk_idx, start_tok, n_tok, chunk_md5) where
    chunk_md5 hashes the space-joined token slice — the oracle certifies
    the actual chunk CONTENT cross-engine (same trick as
    dup_span_removal's kept_md5), not just the offsets.

    Scale shape: pure scan-level integer arithmetic + one explode — no
    shuffle, no window, no Python; the chunk fan-out is the only row
    growth (~n/stride per doc), exactly the output's information
    content."""
    if overlap < 0 or overlap >= window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    # NULL token arrays are dropped, not chunked: F.size(NULL) is -1, so a
    # null-array doc would otherwise still emit one (chunk_idx=0, n_tok=0,
    # chunk_md5=NULL) row while a SQL oracle's range(NULL) emits none — a
    # latent cross-engine divergence. No tokens -> no chunks, both engines.
    df = df.filter(F.col(tokens_col).isNotNull())
    n = F.size(tokens_col).cast("long")
    n_chunks = (
        F.when(n <= window, F.lit(1).cast("long"))
        .otherwise(1 + F.floor((n - window + stride - 1) / stride))
        .cast("long")
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    n_tok = F.greatest(
        F.least(F.lit(window).cast("long"), F.col("_n") - start),
        F.lit(0).cast("long"),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).alias("_toks"),
            n.alias("_n"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
            .alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("start_tok"),
            n_tok.alias("n_tok"),
            F.md5(
                F.array_join(
                    F.slice(
                        "_toks",
                        (start + 1).cast("int"),
                        n_tok.cast("int"),
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


def pack_token_spans(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    bucket_width: int = 100_000,
) -> DataFrame:
    """Global token spans ``(id, n, tok_start, tok_end)`` for the
    id-ordered concatenation of all documents: ``tok_start`` is the
    exclusive running sum of token counts over ids below, ``tok_end =
    tok_start + n``. Zero-token docs are dropped (they occupy no span).

    Two-level cumulative sum — per-bucket windows + broadcast exclusive
    bucket offsets — so no global-ordering window appears in the plan
    (see module docstring). ``bucket_width`` is the id range per window
    partition; size it so one bucket's rows fit a task comfortably."""
    d = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(n_tokens_col).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
        .withColumn("bucket", F.floor(F.col("id") / bucket_width))
    )
    # ROWS frame, not the default RANGE: RANGE makes duplicate ids peers
    # (each would get a cumsum including both — overlapping spans plus a
    # hole, silently). With ROWS, duplicate ids still get disjoint
    # adjacent spans; the manifest is only fully deterministic for
    # unique ids (their relative order is arbitrary).
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("local_end", F.sum("n").over(w))
    totals = d.groupBy("bucket").agg(F.max("local_end").alias("bucket_total"))
    # O(#buckets) frame: the single-partition window here is deliberate
    # and bounded — thousands of rows, not the corpus
    wb = Window.orderBy("bucket")
    offsets = totals.withColumn(
        "bucket_off",
        F.coalesce(
            F.sum("bucket_total").over(wb) - F.col("bucket_total"), F.lit(0)
        ),
    ).select("bucket", "bucket_off")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("tok_end", F.col("bucket_off") + F.col("local_end"))
        .withColumn("tok_start", F.col("tok_end") - F.col("n"))
        .select("id", "n", "tok_start", "tok_end")
    )


def pack_manifest(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int = 2048,
    bucket_width: int = 100_000,
    drop_ragged_tail: bool = False,
) -> DataFrame:
    """The packing manifest: one row per (document, training sequence)
    incidence.

    Columns:
      id        document id
      seq_id    0-based training-sequence ordinal (each holds seq_len tokens)
      doc_off   offset of the piece inside the document's token stream
      seq_off   offset of the piece inside the sequence
      piece_len tokens contributed (sum over a doc's rows == its n;
                sum over a seq's rows == seq_len, except the final
                ragged sequence)

    ``drop_ragged_tail`` cuts the final partially-filled sequence (the
    usual training choice — a short tail example would need padding).
    """
    spans = pack_token_spans(df, id_col, n_tokens_col, bucket_width)
    if drop_ragged_tail:
        # two consumers below (explode + the max(tok_end) scalar):
        # materialize so the cumsum subtree doesn't run twice
        spans = spans.localCheckpoint(eager=False)
    first_seq = F.floor(F.col("tok_start") / seq_len)
    last_seq = F.floor((F.col("tok_end") - 1) / seq_len)
    exploded = spans.select(
        "id", "tok_start", "tok_end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    piece_start = F.greatest(F.col("tok_start"), F.col("seq_id") * seq_len)
    piece_end = F.least(F.col("tok_end"), (F.col("seq_id") + 1) * seq_len)
    out = exploded.select(
        "id",
        "seq_id",
        (piece_start - F.col("tok_start")).alias("doc_off"),
        (piece_start - F.col("seq_id") * seq_len).alias("seq_off"),
        (piece_end - piece_start).alias("piece_len"),
    )
    if drop_ragged_tail:
        n_full = spans.agg(F.max("tok_end").alias("t")).select(
            F.floor(F.col("t") / seq_len).alias("n_full")
        )
        out = out.join(F.broadcast(n_full)).where(
            F.col("seq_id") < F.col("n_full")
        ).drop("n_full")
    return out
