"""Politeness dequeue: per-domain FIFO heads under a token budget.

The reference's blocking heap scheduler (crawler/frontier.py:61-87) becomes
a window-ranked selection: FIFO-per-domain is the deterministic discovery
key ``(rk_round, rk_pop, rk_pos)``, the politeness budget is ``rank <=
tokens`` (tokens = rounds in the batch; 1 URL per domain per politeness
quantum, matching the 0.5 s delay floor at frontier.py:24).

Skew handling (north_rule: *.ics.uci.edu holds ~23% of URLs): a naive
``Window.partitionBy(domain)`` puts the hottest domain in one task. The
two-level rank first takes per-(domain, salt) local heads — parallel across
S salt buckets — then re-ranks the ≤ S*tokens survivors per domain, so no
task ever sees more than (its bucket's rows) in pass one or S*tokens rows
in pass two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["politeness_heads", "DISCOVERY_ORDER"]

# the deterministic per-domain FIFO key (SURVEY §2.6 'seq')
DISCOVERY_ORDER = ["rk_round", "rk_pop", "rk_pos"]


# columns the downstream fetch/parse stage needs; ranking shuffles only these
HEAD_COLUMNS = ["url", "url_hash", "domain", "salt", *DISCOVERY_ORDER]


def politeness_heads(pending: DataFrame, tokens: int, salted: bool = True) -> DataFrame:
    """Select the first ``tokens`` pending URLs per domain in FIFO order;
    adds a ``slot`` column (1-based politeness round within this batch).
    Projects to HEAD_COLUMNS first so the two window shuffles move only
    what fetch needs (lineage columns like parent stay behind)."""
    order = [F.col(c).asc() for c in DISCOVERY_ORDER]
    slim = pending.select(*[c for c in HEAD_COLUMNS if c in pending.columns])
    if salted and "salt" in slim.columns:
        local = Window.partitionBy("domain", "salt").orderBy(*order)
        pre = (
            slim.withColumn("_lrn", F.row_number().over(local))
            .where(F.col("_lrn") <= tokens)
            .drop("_lrn")
        )
    else:
        pre = slim
    per_domain = Window.partitionBy("domain").orderBy(*order)
    return (
        pre.withColumn("slot", F.row_number().over(per_domain))
        .where(F.col("slot") <= tokens)
    )
