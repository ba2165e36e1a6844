"""Sequence packing (operators/packing.py): the two-level-cumsum token
spans must equal a naive global-window reference, conserve every token,
fill every non-final sequence exactly, and be invariant to input
partitioning."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from spacetime_crawler4py_spark.operators.packing import (
    pack_manifest,
    pack_token_spans,
)


def _synth(spark, n_docs=200, partitions=7):
    # ids with gaps, zipf-ish sizes incl. 0-token docs and docs longer
    # than a whole sequence
    rows = []
    for i in range(n_docs):
        doc_id = i * 3 + (i % 2)  # gaps, still strictly increasing
        n = 0 if i % 17 == 0 else (i * 37) % 900 + (5000 if i % 31 == 0 else 0)
        rows.append((doc_id, n))
    return spark.createDataFrame(rows, "doc_id long, n long").repartition(
        partitions
    )


def test_spans_match_naive_global_window(spark):
    d = _synth(spark)
    got = {
        (r.id, r.n, r.tok_start, r.tok_end)
        for r in pack_token_spans(d, "doc_id", "n", bucket_width=50).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        d.where(F.col("n") > 0)
        .withColumn("tok_end", F.sum("n").over(w))
        .withColumn("tok_start", F.col("tok_end") - F.col("n"))
    )
    want = {
        (r.doc_id, r.n, r.tok_start, r.tok_end) for r in naive.collect()
    }
    assert got == want and got


def test_manifest_conserves_tokens_and_fills_sequences(spark):
    d = _synth(spark)
    man = pack_manifest(d, "doc_id", "n", seq_len=512, bucket_width=50)
    rows = man.collect()
    # per-doc conservation: pieces sum to the doc's token count
    per_doc = {}
    for r in rows:
        per_doc[r.id] = per_doc.get(r.id, 0) + r.piece_len
    truth = {r.doc_id: r.n for r in d.where(F.col("n") > 0).collect()}
    assert per_doc == truth
    # per-sequence fill: every sequence except the last holds exactly
    # seq_len tokens, pieces tile [0, seq_len) without overlap
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append((r.seq_off, r.piece_len))
    last = max(by_seq)
    for sid, pieces in by_seq.items():
        pieces.sort()
        pos = 0
        for off, ln in pieces:
            assert off == pos and ln > 0, (sid, pieces)
            pos += ln
        if sid != last:
            assert pos == 512, (sid, pos)
    # doc_off sanity: pieces of one doc are contiguous from 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append((r.seq_id, r.doc_off, r.piece_len))
    for pieces in by_doc.values():
        pieces.sort()
        pos = 0
        for _, doff, ln in pieces:
            assert doff == pos
            pos += ln


def test_layout_independence(spark):
    base = _synth(spark, partitions=1)
    a = pack_manifest(base, "doc_id", "n", seq_len=512, bucket_width=50)
    b = pack_manifest(
        base.repartition(13, "n"), "doc_id", "n", seq_len=512, bucket_width=50
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ragged_tail_drop(spark):
    d = _synth(spark)
    full = pack_manifest(d, "doc_id", "n", seq_len=512, bucket_width=50)
    cut = pack_manifest(
        d, "doc_id", "n", seq_len=512, bucket_width=50, drop_ragged_tail=True
    )
    total = d.agg(F.sum(F.when(F.col("n") > 0, F.col("n")))).collect()[0][0]
    n_full = total // 512
    kept = {r.seq_id for r in cut.collect()}
    assert kept == set(range(n_full))
    # the dropped rows are exactly the final ragged sequence's pieces
    dropped = {r.seq_id for r in full.collect()} - kept
    assert dropped in (set(), {n_full})


def test_duplicate_ids_get_disjoint_spans(spark):
    """ROWS-frame cumsum: duplicated ids must yield adjacent DISJOINT
    spans (the default RANGE frame would make them peers — overlapping
    spans plus a hole)."""
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (2, 100), (3, 100)], "doc_id long, n long"
    )
    spans = sorted(
        (r.tok_start, r.tok_end)
        for r in pack_token_spans(df, "doc_id", "n", bucket_width=10).collect()
    )
    assert spans == [(0, 100), (100, 200), (200, 300), (300, 400)]


def test_chunk_documents_invariants(spark):
    """Coverage + overlap invariants for every doc length around the
    window/stride boundaries: chunks tile the doc (first starts at 0,
    last ends at n, consecutive chunks share exactly `overlap` tokens),
    and the md5 certifies the slice content."""
    import hashlib

    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.operators.packing import chunk_documents

    W, O = 8, 3  # stride 5
    rows = [(n, [f"t{n}w{j}" for j in range(n)]) for n in
            [0, 1, 7, 8, 9, 12, 13, 14, 40]]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = chunk_documents(df, "doc_id", "tokens", window=W, overlap=O)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    toks = dict(rows)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].start_tok == 0
        assert chunks[-1].start_tok + chunks[-1].n_tok == max(n, 0) or n == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == W - O  # stride
            assert a.start_tok + a.n_tok - b.start_tok == O or a.n_tok < W
        for c in chunks:
            body = " ".join(toks[n][c.start_tok:c.start_tok + c.n_tok])
            assert c.chunk_md5 == hashlib.md5(body.encode()).hexdigest()
        if n <= W:
            assert len(chunks) == 1 and chunks[0].n_tok == n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "tokens", window=8, overlap=8)
