"""Link-graph analytics over a crawl corpus — derived edge lists and
PageRank, the crawl-prioritization signal family (the reference's
frontier treats all discovered URLs equally; a production crawler ranks
hosts/pages by link centrality, cf. the published Common Crawl host
ranks).

Everything here is plain DataFrame ops with exact ANSI-SQL twins in
__spark_entry__.oracle_sql (the DuckDB correctness oracle), so the
whole family is cross-engine hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["derive_link_graph", "pagerank", "anchor_text_aggregate"]


def derive_link_graph(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic edge list ``(src, dst)`` over a document
    table: doc i links to ``(i*31 + k) % n_docs`` for k in 1..3, self
    loops dropped. A stand-in for a real href-extraction pass (the crawl
    engine's parse stage emits exactly this shape) that both engines can
    derive with integer arithmetic only.

    ``n_docs`` comes from a 1-row aggregate cross-joined in (broadcast,
    no driver action) — the plan stays fully lazy/distributed."""
    n = F.broadcast(docs.agg(F.count("*").alias("n_docs")))
    ks = F.array(F.lit(1), F.lit(2), F.lit(3))
    return (
        docs.select(F.col(id_col).cast("long").alias("src"))
        .crossJoin(n)
        .select("src", F.explode(ks).alias("k"), "n_docs")
        .select("src", ((F.col("src") * 31 + F.col("k")) % F.col("n_docs")).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def anchor_text_aggregate(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    top_m: int = 3,
) -> DataFrame:
    """Inlink anchor-text aggregation — the classic link-text relevance
    signal (what other pages *call* a page), the field both crawl
    prioritization and BM25F-style ranking consume. The reference's
    scraper extracts hrefs only and throws the anchor text away
    (reference scraper.py:255-273); a production pipeline aggregates it
    per target.

    Input: an edge list ``(dst_col, anchor_col)`` — one row per inlink
    with its (possibly empty) anchor string. Output one row per
    (target doc, top-m anchor term): ``(doc_id, n_inlinks, term,
    term_count, term_rank)``, terms ranked by count desc then term asc.

    Plan shape at corpus scale: anchors tokenize scan-side (JVM split +
    explode, no Python), term counts are one hash aggregation with
    map-side partial combine keyed on (dst, term) — the celebrity-page
    in-degree skew is absorbed by the combiner exactly like PageRank's
    contribution sum — and the top-m cut is a window over the already
    tiny per-target term dim. The inlink count reuses the edge scan."""
    toks = (
        links.select(
            F.col(dst_col).alias("doc_id"),
            F.explode(F.split(F.col(anchor_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    counts = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("term_count")
    )
    inlinks = links.groupBy(F.col(dst_col).alias("doc_id")).agg(
        F.count("*").alias("n_inlinks")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("term_count"), F.asc("term")
    )
    top = (
        counts.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= top_m)
    )
    return top.join(inlinks, "doc_id").select(
        "doc_id", "n_inlinks", "term", "term_count", "term_rank"
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank, returned as ``(doc_id, pr_ppm)`` with
    the rank floored to integer parts-per-million so the cross-engine
    value hash is float-stable.

    ``nodes`` is one column ``doc_id``; ``edges`` is ``(src, dst)``.
    Dangling nodes (no out-edges) leak their mass — callers that need
    mass conservation should pre-add self-loops or trim sinks (the same
    contract as GraphX's staticPageRank). The derived graph from
    :func:`derive_link_graph` has out-degree >= 2 everywhere, so ranks
    sum to ~1.0 there.

    Plan shape per iteration — the canonical distributed PageRank:

    * contribution join ``ranks ⋈ edges`` shuffles both sides on ``src``;
      the per-src out-degree is a tiny pre-aggregated dim joined on the
      same key, so Catalyst/AQE reuses one exchange for both;
    * the contribution sum shuffles on ``dst`` with map-side partial
      aggregation (in-degree skew — a page everyone links to — is
      absorbed by the partial agg, the classic combiner fix);
    * iterations chain lazily; nothing is collected. At 100 TB the edge
      table would be bucketed by ``src`` once so every iteration's
      contribution join is shuffle-free on the big side.
    """
    n = F.broadcast(nodes.agg(F.count("*").alias("n_docs")))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.crossJoin(n).select(
        "doc_id", (F.lit(1.0) / F.col("n_docs")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["doc_id"])
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["doc_id"] == contrib["dst"], "left")
            .crossJoin(n)
            .select(
                "doc_id",
                (
                    (1.0 - damping) / F.col("n_docs")
                    + damping * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks.select(
        "doc_id", F.floor(F.col("pr") * 1_000_000).cast("long").alias("pr_ppm")
    )
