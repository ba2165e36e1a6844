"""Connected components over near-duplicate pair lists.

Pair lists (exact checksum groups, MinHash/SimHash/Jaccard pairs — see
operators/dedup.py) are only half of a dedup pipeline: to actually DROP
documents you need every doc assigned to a duplicate *cluster* with one
canonical survivor, and near-dup similarity is not transitive — A~B and
B~C pairs must collapse into one {A,B,C} cluster even when A~C was never
emitted. The reference corpus is small enough that it never needs this
step (its exact-dup check is per-page incremental, utils/similarity.py);
at 100 TB the pair list is a distributed edge table and the clustering
must be too.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC 2014) directly on DataFrames:

* each round is one groupBy (per-node min neighbor) + one equi-join +
  distinct — all shuffles on the node id, no driver-side graph state;
* converges in O(log^2 n) rounds (in practice a handful) to a forest of
  stars whose roots are the component minima;
* every round ``localCheckpoint``s the edge frame so the loop's lineage
  stays O(1) — without it the plan doubles every iteration and Catalyst
  analysis time explodes long before the data does.

This beats the naive "propagate min label to neighbors until stable"
loop, which needs O(diameter) rounds — a 10^6-long chain of near-dup
boilerplate pages (pagination runs are exactly this shape) would take
10^6 shuffles naive vs ~40 here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_assignments"]


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge list in canonical (a < b) shape, self-loops dropped."""
    return (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _sym(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = _sym(edges)
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("src", "mn").alias("m"))
    )
    return _canon(
        sym.where(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Rewire every smaller-or-equal neighbor of u (and u) to their min."""
    sym = _sym(edges)
    smaller = sym.where(F.col("dst") < F.col("src"))
    m = smaller.groupBy("src").agg(F.min("dst").alias("m"))
    return _canon(
        smaller.join(m, "src")
        .select(F.col("dst").alias("a"), F.col("m").alias("b"))
        .unionAll(m.select(F.col("src").alias("a"), F.col("m").alias("b")))
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Order-independent (count, checksum) fingerprint of an edge set —
    one action, no driver-side edge materialization."""
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor, not sum: order-independent, immune to ANSI-mode long
        # overflow, and collision-safe here because the edge set is
        # distinct (xor of a *set* of 64-bit hashes)
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src_col: str = "a",
    dst_col: str = "b",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component_id) for every node that appears in ``edges``;
    ``component_id`` is the minimum node id of the component.

    Isolated nodes never appear in an edge list — union the node universe
    back in afterwards (see ``dedup_assignments``).
    """
    # lazy checkpoint + signature: the signature aggregation is the action
    # that materializes each round's checkpoint, so every round costs ONE
    # Spark job (scheduling overhead halves vs eager+signature; the same
    # two-birds trick a driver loop on a 1000-executor cluster wants)
    cur = _canon(
        edges.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
    ).localCheckpoint(eager=False)
    sig = _signature(cur)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # Fixpoint is a star forest: every edge is (child, root). Roots map to
    # themselves; the groupBy-min tolerates any residual multi-edges.
    return (
        _sym(cur)
        .groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "mn").alias("component_id"),
        )
    )


def dedup_assignments(
    universe: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "a",
    dst_col: str = "b",
) -> DataFrame:
    """Every doc in ``universe`` → its duplicate-cluster canonical id.

    Docs absent from the pair list are their own singleton cluster. The
    join is a broadcast-able slim (node, component_id) dim when dup
    density is low — the common case after LSH."""
    comp = connected_components(pairs, src_col, dst_col)
    return (
        universe.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("component_id"),
        )
    )
