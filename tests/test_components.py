"""Connected-components (operators/components.py) vs a Python union-find
oracle, on hand graphs, seeded random graphs, and the REAL MinHash-LSH
pair output over the sf0.001 documents table."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.components import (
    connected_components,
    dedup_assignments,
)
from spacetime_crawler4py_spark.operators.dedup import minhash_lsh_verified_pairs

SF_DIR = "/root/testdata/sf0.001"


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of the component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        df = df.where(F.lit(False))
    got = connected_components(df)
    return {r["node"]: r["component_id"] for r in got.collect()}


@pytest.mark.parametrize(
    "edges",
    [
        [],
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4), (4, 5)],          # chain
        [(10, 1), (10, 2), (10, 3)],               # star, root not min
        [(1, 2), (3, 4), (5, 6), (2, 3)],          # merge two chains
        [(7, 7), (1, 2), (2, 1)],                  # self-loop + dup edge
        [(100, 5), (5, 100), (6, 100), (2, 6)],
    ],
)
def test_cc_small_graphs(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(nodes, edges)
    want = {n: c for n, c in want.items() if any(a != b for a, b in edges if n in (a, b))}
    got = _spark_cc(spark, edges)
    # isolated nodes (only self-loops) are absent from the edge output
    assert {n: c for n, c in got.items()} == want


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        want = _union_find(nodes, edges)
        got = _spark_cc(spark, edges)
        assert got == want


def test_cc_long_chain_converges_fast(spark):
    """A 200-node path needs O(log n) star rounds, not O(n); max_rounds=15
    would fail a naive min-propagation loop (which needs ~200)."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = connected_components(df, max_rounds=15)
    rows = got.collect()
    assert len(rows) == 201
    assert {r["component_id"] for r in rows} == {0}


def test_dedup_assignments_singletons(spark):
    universe = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (8, 9)], "a long, b long")
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup_assignments(universe, pairs, "doc_id").collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 1, 6: 6, 7: 7, 8: 8, 9: 8}


def test_cc_over_real_minhash_pairs(spark):
    """End-to-end: MinHash-LSH verified pairs over the documents table →
    components == union-find closure of exactly those pairs."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # mirror a slice so the corpus actually contains near-dup clusters
    mirrored = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(mirrored)
    pairs = minhash_lsh_verified_pairs(
        corpus, "doc_id", "text", threshold=0.5
    ).select(F.col("id").alias("a"), F.col("id2").alias("b"))
    edge_list = [(r["a"], r["b"]) for r in pairs.collect()]
    assert edge_list, "mirror construction must produce near-dup pairs"
    universe = [r["doc_id"] for r in corpus.select("doc_id").collect()]
    want = _union_find(universe, edge_list)
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup_assignments(corpus, pairs, "doc_id").collect()
    }
    assert got == want


def test_curation_pipeline_invariants(spark):
    """Composite curation query: exactly one survivor per duplicate
    cluster that has any eligible member; no ineligible doc is kept."""
    import __spark_entry__ as e

    df = e.queries()["curation_pipeline"](spark, SF_DIR).cache()
    assert df.where("keep AND NOT eligible").count() == 0
    multi = (
        df.where("keep").groupBy("component_id").count().where("count > 1")
    )
    assert multi.count() == 0
    # every component with an eligible member keeps exactly one doc
    from pyspark.sql import functions as F

    per_comp = df.groupBy("component_id").agg(
        F.max(F.col("eligible").cast("int")).alias("any_elig"),
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
    )
    assert per_comp.where("any_elig = 1 AND n_keep != 1").count() == 0
    assert per_comp.where("any_elig = 0 AND n_keep != 0").count() == 0
    df.unpersist()


def test_curation_full_invariants(spark):
    """The all-signals curation query: drop_reason is a total explanation
    (every non-kept doc has one, every kept doc has none), reasons come
    from the fixed vocabulary, 'duplicate' only ever names an eligible
    non-survivor, and per-component keep counts match the eligible
    structure."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    df = e.queries()["curation_full"](spark, SF_DIR).cache()
    assert df.where("keep AND drop_reason IS NOT NULL").count() == 0
    assert df.where("NOT keep AND drop_reason IS NULL").count() == 0
    reasons = {
        r["drop_reason"]
        for r in df.select("drop_reason").distinct().collect()
    }
    assert reasons <= {None, "short", "repetitive", "dup_span",
                       "perplexity", "duplicate"}
    # 'duplicate' docs are eligible losers: same component must have a
    # kept doc with a smaller id
    dups = df.where("drop_reason = 'duplicate'").select(
        "doc_id", "component_id"
    )
    kept = df.where("keep").select(
        F.col("component_id").alias("component_id"),
        F.col("doc_id").alias("keep_id"),
    )
    joined = dups.join(kept, "component_id", "left")
    assert joined.where("keep_id IS NULL OR keep_id >= doc_id").count() == 0
    per_comp = df.groupBy("component_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep")
    )
    assert per_comp.where("n_keep > 1").count() == 0
    df.unpersist()
