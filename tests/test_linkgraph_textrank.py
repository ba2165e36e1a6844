"""Hand-computed cases for the link-graph + retrieval/LM-quality
operators (operators/linkgraph.py, operators/textstats.py additions).
The cross-engine hash vs DuckDB is the contract gate (check_oracle);
these pin the math itself on inputs small enough to verify by hand or
against a pure-Python twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.linkgraph import (
    derive_link_graph,
    pagerank,
)
from spacetime_crawler4py_spark.operators.textstats import (
    bm25_scores,
    dup_span_stats,
    unigram_logprob,
)

# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _pagerank_py(nodes, edges, iters=5, d=0.85):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {u: 1.0 / len(nodes) for u in nodes}
    for _ in range(iters):
        mass = {u: 0.0 for u in nodes}
        for s, t in edges:
            mass[t] += pr[s] / outdeg[s]
        pr = {u: (1.0 - d) / len(nodes) + d * mass[u] for u in nodes}
    return pr


def test_pagerank_matches_pure_python_twin(spark):
    nodes = list(range(7))
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (5, 2), (6, 0)]
    ndf = spark.createDataFrame([(u,) for u in nodes], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["doc_id"]: r["pr_ppm"]
        for r in pagerank(ndf, edf, iters=5).collect()
    }
    want = _pagerank_py(nodes, edges)
    for u in nodes:
        assert got[u] == math.floor(want[u] * 1_000_000), (u, got[u], want[u])


def test_pagerank_mass_conserved_on_derived_graph(spark):
    """derive_link_graph has no dangling nodes (out-degree >= 2
    everywhere), so total rank stays ~1.0 — the invariant that makes the
    ranking comparable across epochs."""
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    edges = derive_link_graph(docs)
    assert edges.groupBy("src").count().agg(F.min("count")).first()[0] >= 2
    total = pagerank(docs, edges, iters=5).agg(F.sum("pr_ppm")).first()[0]
    # each of 60 nodes can lose < 1 ppm to the floor
    assert 1_000_000 - 60 <= total <= 1_000_000


def test_pagerank_hub_ranks_highest(spark):
    """Hub-and-spokes: all of 1..5 link to 0, 0 links to each spoke. The
    hub must outrank every spoke at any iteration count (a two-node
    oscillator like 0<->1-only would NOT be rank-stable at finite iters —
    that case is covered by the exact pure-python twin test above)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, j) for j in range(1, 6)],
        "src long, dst long",
    )
    rows = pagerank(nodes, edges, iters=10).orderBy(F.desc("pr_ppm")).collect()
    assert rows[0]["doc_id"] == 0
    spokes = {r["pr_ppm"] for r in rows[1:]}
    assert len(spokes) == 1 and rows[0]["pr_ppm"] > spokes.pop()


def test_pagerank_bucketed_edges_join_is_shuffle_free_on_edges(spark):
    """The 100TB plan shape pagerank's docstring claims: bucket the edge
    table by src once, and every iteration's contribution join reads the
    bucketed scan WITHOUT an Exchange above it (only the small ranks dim
    shuffles). Broadcast + AQE are disabled so the assertion pins the
    bucketing, not a broadcast bail-out."""
    import uuid

    tbl = f"edges_bucketed_{uuid.uuid4().hex[:8]}"
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        derive_link_graph(docs).write.bucketBy(8, "src").sortBy(
            "src"
        ).mode("overwrite").saveAsTable(tbl)
        eb = spark.table(tbl)
        ranks = docs.select("doc_id", F.lit(0.002).alias("pr"))
        deg = eb.groupBy("src").agg(F.count("*").alias("outdeg"))
        contrib = (
            eb.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        plan = contrib._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines = plan.splitlines()
        scan_ids = [
            int(line.split("(")[1].split(")")[0])
            for line in lines
            if "Scan parquet" in line and tbl in line and line.startswith("(")
        ]
        assert len(scan_ids) == 2  # edges + deg both read the bucketed table
        # an Exchange directly consuming a bucketed scan would appear as
        # "Exchange ... (n)" whose child subtree contains the scan id; the
        # cheap robust check: total shuffle Exchanges == 2 (ranks dim +
        # final groupBy(dst)), i.e. NONE on either bucketed-scan branch
        n_shuffles = sum(
            1 for line in lines
            if line.lstrip().startswith("(") is False
            and "Exchange" in line and "BroadcastExchange" not in line
            and "Reused" not in line
        )
        assert "SortMergeJoin" in plan
        assert n_shuffles == 2, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


# ---------------------------------------------------------------------------
# bm25
# ---------------------------------------------------------------------------


def test_bm25_hand_case(spark):
    """3 docs, query {cat}: doc 1 mentions cat twice in 4 tokens, doc 2
    once in 8 tokens, doc 3 never. tf saturation + idf by hand."""
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat fish"),
            (2, "dog fish bird tree rock cat moon star"),
            (3, "dog fish bird tree"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in bm25_scores(docs, "doc_id", "text", ["cat"]).collect()
    }
    assert set(rows) == {1, 2}
    n, avgdl, k1, b = 3, 16 / 3, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    s1 = idf * (2 / (2 + k1 * (1 - b + b * 4 / avgdl)))
    s2 = idf * (1 / (1 + k1 * (1 - b + b * 8 / avgdl)))
    assert rows[1]["score_milli"] == math.floor(s1 * 1000)
    assert rows[2]["score_milli"] == math.floor(s2 * 1000)
    assert rows[1]["score_milli"] > rows[2]["score_milli"]


def test_bm25_rare_term_outweighs_common(spark):
    """A term appearing in 1 of 4 docs must contribute more than a term
    appearing in all 4 (idf ordering) at equal tf and doc length."""
    docs = spark.createDataFrame(
        [
            (1, "rare common aa bb"),
            (2, "common cc dd ee"),
            (3, "common ff gg hh"),
            (4, "common ii jj kk"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["score_milli"]
        for r in bm25_scores(docs, "doc_id", "text", ["rare", "common"]).collect()
    }
    assert rows[1] > rows[2] == rows[3] == rows[4]


# ---------------------------------------------------------------------------
# dup_spans
# ---------------------------------------------------------------------------


def test_dup_spans_hand_case(spark):
    """Docs 1 and 2 share an 8-token prefix; doc 3 is disjoint. Doc 1 has
    9 tokens -> 2 windows, 1 shared; doc 2 has 8 -> 1 window, shared."""
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " nine"),
            (2, shared),
            (3, "aa bb cc dd ee ff gg hh ii jj"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_windows"], r["dup_ppm"])
        for r in dup_span_stats(docs, "doc_id", "text", n=8).collect()
    }
    assert rows[1] == (2, 500_000)
    assert rows[2] == (1, 1_000_000)
    assert rows[3] == (3, 0)
    assert 4 not in rows  # < 8 tokens -> no windows -> no row


def test_dup_spans_within_doc_repeat_not_counted(spark):
    """The same 8-gram twice in ONE doc is repetition, not duplication —
    distinct-doc frequency stays 1, so dup_ppm must be 0."""
    eight = "aq bw ce dr et fy gu hi"
    docs = spark.createDataFrame(
        [(1, eight + " " + eight)], "doc_id long, text string"
    )
    r = dup_span_stats(docs, "doc_id", "text", n=8).first()
    assert r["n_windows"] == 9 and r["dup_ppm"] == 0


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_case(spark):
    """Corpus = {aa x3, bb x1}; doc 1 = 'aa aa aa', doc 2 = 'bb'.
    nll(doc1) = ln(4/3), nll(doc2) = ln(4/1)."""
    docs = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "bb")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["nll_milli"])
        for r in unigram_logprob(docs, "doc_id", "text").collect()
    }
    assert rows[1] == (3, math.floor(math.log(4 / 3) * 1000))
    assert rows[2] == (1, math.floor(math.log(4.0) * 1000))


def test_unigram_logprob_rare_text_scores_higher(spark):
    common = " ".join(["the common words repeat here"] * 4)
    docs = spark.createDataFrame(
        [(1, common), (2, "zyx wvu tsr qpo nml")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["nll_milli"]
        for r in unigram_logprob(docs, "doc_id", "text").collect()
    }
    assert rows[2] > rows[1]
