"""Positional inverted-index construction — the materialized form of the
term statistics the report/top-words path (reference analyze_crawl.py:82-87,
re-expressed in operators/report.py) and BM25 (operators/textstats.py
bm25_scores) each derive on the fly. A crawl corpus that feeds retrieval
wants the index written once as a table pair, not recomputed per query:

* **postings**: one row per (term, doc_id) with the term frequency and the
  sorted 0-based token positions (as a CSV string, so the row is
  hash-comparable across engines) — enough for phrase/proximity queries.
* **dictionary**: one row per term with document frequency ``df`` and
  collection frequency ``cf`` — the idf inputs BM25 needs, precomputed.

100-TB shape: ONE wide shuffle keyed by (term, doc_id) builds the
postings; every aggregate in it (count, collect_list of within-doc
positions) partially aggregates map-side, and the per-group state is
bounded by a single document's length — corpus-frequency skew (stopwords)
cannot concentrate into one reducer key because doc_id is part of the
key. The dictionary is a second, much smaller agg keyed by term over the
postings (one row per (term, doc), count/sum only, map-side combinable);
its output is O(vocabulary). Writing ``postings`` bucketed by term makes
downstream term lookups a pruned scan.

The token stream is the shared ``tokens_exploded`` contract, so a corpus
build that already tokenized for curation signals can pass its
checkpointed stream via ``tokens=`` and index "for free" on the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_exploded

__all__ = ["build_inverted_index", "phrase_hits"]


def build_inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokens: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(postings, dictionary)`` for the corpus:

    postings   (term, doc_id, tf, positions)  — positions = sorted 0-based
                                                token offsets, CSV string
    dictionary (term, df, cf)                 — df = docs containing term,
                                                cf = total occurrences

    Zero-token documents contribute no rows (same convention as
    tokens_exploded). Deterministic on any partitioning: positions are
    sorted before joining, tf/df/cf are exact integers.
    """
    toks = (
        tokens
        if tokens is not None
        else tokens_exploded(df, id_col, text_col)
    ).select("doc_id", "pos", F.col("w").alias("term"))
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.array_join(F.array_sort(F.collect_list("pos")), ",").alias(
            "positions"
        ),
    )
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )
    return postings, dictionary


def _term_positions(postings: DataFrame, term: str) -> DataFrame:
    """One posting list, exploded back to (doc_id, pos) ints."""
    return postings.where(F.col("term") == term).select(
        "doc_id",
        F.explode(
            F.transform(
                F.split("positions", ","), lambda x: x.cast("int")
            )
        ).alias("pos"),
    )


def phrase_hits(postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact-phrase search over the positional index: every occurrence of
    the consecutive token sequence ``phrase``, as ``(doc_id, start_pos)``
    (0-based token offset of the first word; overlapping matches all
    count). This is why the index stores positions — tf alone can only
    AND terms, not order them.

    Plan shape: |phrase| posting-list scans (with the term filter pushed
    into the scan — against a term-bucketed postings table each is a
    pruned read of one bucket), then |phrase|-1 equi-joins keyed by
    (doc_id, candidate start), each join between streams already shaped
    by the previous one. No windows, no Python; per-join cardinality is
    bounded by the rarest prefix term's collection frequency.
    """
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    hits = _term_positions(postings, phrase[0]).withColumnRenamed(
        "pos", "start_pos"
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = _term_positions(postings, term).select(
            "doc_id", (F.col("pos") - i).alias("start_pos")
        )
        hits = hits.join(nxt, ["doc_id", "start_pos"])
    return hits
