"""repetition_scores (operators/textstats.py) on hand-computed documents."""

from __future__ import annotations

from spacetime_crawler4py_spark.operators.textstats import repetition_scores


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["top_bigram_ppm"], r["dup_trigram_ppm"], r["repetitive"])
        for r in repetition_scores(df, "doc_id", "text").collect()
    }


def test_repetition_hand_cases(spark):
    got = _run(
        spark,
        [
            # "click here" x4: bigrams = [click here]x4 + [here click]x3
            # -> top 4/7; trigrams 6 slots, 2 distinct -> dup 4/6
            (1, "click here click here click here click here"),
            # all-distinct tokens: top bigram 1/4, no dup trigrams
            (2, "alpha beta gamma delta epsilon"),
            # single token: no bigrams/trigrams at all
            (3, "single"),
            # empty text
            (4, ""),
            # two tokens: one bigram (top = 1/1 = 100%), no trigrams
            (5, "aa bb"),
        ],
    )
    assert got[1] == (571428, 666666, True)
    assert got[2] == (250000, 0, True)  # 25% top bigram > 18% threshold
    assert got[3] == (0, 0, False)
    assert got[4] == (0, 0, False)
    assert got[5] == (1000000, 0, True)


def test_repetition_threshold_boundary(spark):
    # 6 distinct tokens -> 5 distinct bigrams: top = 1/5 = 200000 ppm > gate;
    # 12 distinct tokens -> 11 distinct bigrams: 90909 ppm < gate
    got = _run(
        spark,
        [
            (1, "aa bb cc dd ee ff"),  # 6 tokens
            (2, " ".join(f"w{c}" for c in "abcdefghijkl")),  # 12 tokens
        ],
    )
    assert got[1] == (200000, 0, True)
    assert got[2] == (90909, 0, False)


def test_shared_tokens_param_equals_internal_tokenize(spark):
    """The tokens= fast path (one shared tokens_exploded stream, the
    curation compositions' single-text-scan shape) must be result-identical
    to each operator tokenizing internally — including zero-token docs."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.operators.dedup import shingles_exploded
    from spacetime_crawler4py_spark.operators.textstats import (
        dup_span_stats,
        tokens_exploded,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "click here click here click here click here click here"),
            (4, ""),
            (5, "one"),
        ],
        "doc_id long, text string",
    )
    tok = tokens_exploded(docs, "doc_id", "text").localCheckpoint(eager=False)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(repetition_scores(docs, "doc_id", "text", tokens=tok)) == rows(
        repetition_scores(docs, "doc_id", "text")
    )
    assert rows(dup_span_stats(docs, "doc_id", "text", n=3, tokens=tok)) == rows(
        dup_span_stats(docs, "doc_id", "text", n=3)
    )
    assert rows(unigram_logprob(docs, "doc_id", "text", tokens=tok)) == rows(
        unigram_logprob(docs, "doc_id", "text")
    )
    assert rows(
        shingles_exploded(docs, "doc_id", "text", 3, tokens=tok)
    ) == rows(shingles_exploded(docs, "doc_id", "text", 3))
    n_tok = docs.join(
        tok.groupBy("doc_id").agg(F.count("*").alias("_nt")), "doc_id", "left"
    ).select("doc_id", F.coalesce("_nt", F.lit(0)).alias("n"))
    expect = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]{2,}"), 0)
        ).alias("n"),
    )
    assert rows(n_tok) == rows(expect)


def test_bigram_logprob_matches_local_model(spark):
    """Interpolated bigram LM: exact match against a plain-Python
    re-derivation of P(w2|w1) = 0.75*cb/c1 + 0.25*c2/T with per-bigram
    milli-nat flooring, and partitioning invariance of the integer sums."""
    import math
    from collections import Counter

    from spacetime_crawler4py_spark.operators.textstats import (
        bigram_logprob,
    )

    texts = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "dog"),                      # no bigram -> no output row
        (3, "mat mat mat the cat"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r.doc_id: r for r in
           bigram_logprob(df, "doc_id", "text").collect()}
    out2 = {r.doc_id: r for r in
            bigram_logprob(df.repartition(5), "doc_id", "text").collect()}
    assert {(k, v.n_bigrams, v.nll_milli_sum) for k, v in out.items()} == \
           {(k, v.n_bigrams, v.nll_milli_sum) for k, v in out2.items()}

    # local model over the same tokenization (>=2 lowercase letters)
    docs = {i: [w for w in t.split() if len(w) >= 2] for i, t in texts}
    uni = Counter(w for ws in docs.values() for w in ws)
    T = sum(uni.values())
    cb = Counter(
        (a, b) for ws in docs.values() for a, b in zip(ws, ws[1:])
    )
    assert 2 not in out
    for i, ws in docs.items():
        bigs = list(zip(ws, ws[1:]))
        if not bigs:
            continue
        exp = sum(
            math.floor(-math.log(
                0.75 * cb[(a, b)] / uni[a] + 0.25 * uni[b] / T
            ) * 1000)
            for a, b in bigs
        )
        assert out[i].n_bigrams == len(bigs)
        assert out[i].nll_milli_sum == exp, i
