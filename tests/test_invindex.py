"""Positional inverted index (operators/invindex.build_inverted_index):
hand-computed postings/dictionary on a tiny corpus, tokenizer parity with
the report path (reference analyze_crawl.py:82-87 semantics), and
partitioning-invariance of the emitted rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.invindex import (
    build_inverted_index,
    phrase_hits,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_postings_and_dictionary_exact(spark):
    docs = spark.createDataFrame(
        [
            # tokens: the cat sat on the mat
            (1, "The cat sat on the mat."),
            # tokens: the cat's cat  ->  possessive strip: the cat cat
            (2, "The cat's cat!"),
            (3, ""),  # zero-token doc: contributes no rows
        ],
        "doc_id long, text string",
    )
    postings, dictionary = build_inverted_index(docs, "doc_id", "text")

    assert _rows(postings) == {
        ("the", 1, 2, "0,4"),
        ("cat", 1, 1, "1"),
        ("sat", 1, 1, "2"),
        ("on", 1, 1, "3"),
        ("mat", 1, 1, "5"),
        ("the", 2, 1, "0"),
        ("cat", 2, 2, "1,2"),
    }
    assert _rows(dictionary) == {
        ("the", 2, 3),
        ("cat", 2, 3),
        ("sat", 1, 1),
        ("on", 1, 1),
        ("mat", 1, 1),
    }


def test_partitioning_invariance(spark):
    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma "),
            F.repeat(F.lit("delta "), (F.col("id") % 5).cast("int")),
        ).alias("text"),
    )
    one = build_inverted_index(docs.coalesce(1), "doc_id", "text")
    many = build_inverted_index(docs.repartition(13), "doc_id", "text")
    for a, b in zip(one, many):
        assert _rows(a) == _rows(b)


def test_phrase_hits_exact_and_overlapping(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat then the cat ran"),  # "the cat" at 0 and 4
            (2, "cat the cat"),                   # "the cat" at 1
            (3, "the dog"),                       # no hit
            (4, "aa aa aa"),                      # overlapping "aa aa": 0, 1
        ],
        "doc_id long, text string",
    )
    postings, _ = build_inverted_index(docs, "doc_id", "text")
    assert _rows(phrase_hits(postings, ["the", "cat"])) == {
        (1, 0), (1, 4), (2, 1),
    }
    assert _rows(phrase_hits(postings, ["aa", "aa"])) == {(4, 0), (4, 1)}
    # 3-term phrase and a single-term degenerate case
    assert _rows(phrase_hits(postings, ["the", "cat", "sat"])) == {(1, 0)}
    assert _rows(phrase_hits(postings, ["dog"])) == {(3, 1)}


def test_shared_token_stream_reuse(spark):
    from spacetime_crawler4py_spark.operators.textstats import tokens_exploded

    docs = spark.createDataFrame(
        [(7, "one two two three three three")], "doc_id long, text string"
    )
    via_text = build_inverted_index(docs, "doc_id", "text")
    via_tokens = build_inverted_index(
        docs, "doc_id", "text", tokens=tokens_exploded(docs, "doc_id", "text")
    )
    assert _rows(via_text[0]) == _rows(via_tokens[0])
    assert _rows(via_text[1]) == _rows(via_tokens[1])


def test_collocation_lift_hand_computed(spark):
    from spacetime_crawler4py_spark.operators.textstats import (
        collocation_lift,
    )

    docs = spark.createDataFrame(
        # bigrams: (aa,bb) x2, (bb,aa), (bb,cc) — and none across the
        # doc boundary ((cc,dd) must NOT appear)
        [(1, "aa bb aa bb cc"), (2, "dd ee")],
        "doc_id long, text string",
    )
    out = collocation_lift(docs, "doc_id", "text", min_pair=1, k=10)
    rows = [tuple(r) for r in out.collect()]
    # N = 5 bigrams; unigrams aa=2 bb=2 cc=1 dd=1 ee=1
    assert rows == [
        ("dd", "ee", 1, 1, 1, 5_000_000),
        ("aa", "bb", 2, 2, 2, 2_500_000),  # ties on lift break w1 asc
        ("bb", "cc", 1, 2, 1, 2_500_000),
        ("bb", "aa", 1, 2, 2, 1_250_000),
    ]


def test_phrase_hits_differential_vs_python_scan(spark):
    """phrase_hits over the real sf0.001 corpus vs a pure-Python
    brute-force scan using the tokenizer twin — every occurrence, no
    misses, no extras, for phrases of length 1..3."""
    from spacetime_crawler4py_spark.functions.qualityseeds import tokens_of

    sf = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(sf).select("doc_id", "text")
    postings, _ = build_inverted_index(docs, "doc_id", "text")
    postings = postings.localCheckpoint(eager=False)

    corpus = {r["doc_id"]: tokens_of(r["text"]) for r in docs.collect()}
    for phrase in (["row"], ["row", "column"], ["slow", "hash", "batch"]):
        expect = {
            (d, i)
            for d, toks in corpus.items()
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i : i + len(phrase)] == phrase
        }
        got = _rows(phrase_hits(postings, phrase))
        assert got == expect, f"phrase {phrase}: {len(got)} vs {len(expect)}"
