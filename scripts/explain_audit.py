"""Physical-plan audit for the contract queries.

For each query in __spark_entry__.queries(), prints the formatted physical
plan and greps for the health signals the 100TB design cares about:

* PushedFilters / ReadSchema on parquet scans (pushdown + pruning)
* WholeStageCodegen coverage (JVM-side expressions)
* BroadcastHashJoin vs SortMergeJoin choices
* row-at-a-time Python UDFs (BatchEvalPython = red flag; ArrowEvalPython
  and mapInPandas stages are the sanctioned Python paths)

Usage: python scripts/explain_audit.py [--write] [query ...]
(--write regenerates BENCH/EXPLAIN_AUDIT.md from the full suite)
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "EXPLAIN_AUDIT.md")

DOC_HEADER = """# Physical-plan audit (scripts/explain_audit.py @ sf0.01)

Signals grepped from each contract query's formatted physical plan.
Key invariant: zero `BatchEvalPython` (row-at-a-time Python UDF) nodes —
all Python is Arrow-batched (`ArrowEvalPython` / `MapInPandas` /
`FlatMapGroupsInPandas`). Regenerate with
`python scripts/explain_audit.py --write`.

```
"""

SIGNALS = [
    ("BatchEvalPython", "ROW-AT-A-TIME PYTHON UDF (red flag)"),
    ("ArrowEvalPython", "arrow-batched pandas UDF"),
    ("MapInPandas", "mapInPandas stage"),
    ("FlatMapGroupsInPandas", "applyInPandas (grouped Arrow) stage"),
    ("BroadcastHashJoin", "broadcast hash join"),
    ("SortMergeJoin", "sort-merge join"),
    ("BroadcastNestedLoopJoin", "broadcast nested-loop join"),
    ("CartesianProduct", "cartesian product (check intent)"),
    ("PushedFilters: \\[[^]]", "parquet filter pushdown"),
    ("WholeStageCodegen", "whole-stage codegen"),
    ("Window", "window exec"),
    ("TakeOrderedAndProject", "top-k without full sort"),
]


def main() -> None:
    write = "--write" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("-")}
    from spacetime_crawler4py_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    lines = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            # these execute a readStream->availableNow pipeline; the batch
            # DataFrame they return is just the sink table, so explaining
            # it audits nothing. Their stateless plan segments are the
            # batch twins audited above (event_windows, sessionize,
            # exact_dup_groups, top_words); the stateful exec nodes
            # (StateStoreSave, FlatMapGroupsWithStateExec, dropDuplicates
            # within watermark) have no batch equivalent by design.
            line = (f"== {name}: (streaming contract run — micro-batch "
                    "plan, audited via its batch twin)")
            lines.append(line)
            print(line)
            continue
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"== {name}: EXPLAIN FAILED {type(e).__name__}: {e}")
            continue
        hits = []
        for pat, label in SIGNALS:
            n = len(re.findall(pat, plan))
            if n:
                hits.append(f"{label} x{n}")
        line = f"== {name}: {'; '.join(hits) if hits else '(no signals)'}"
        lines.append(line)
        print(line)
        if "-v" in sys.argv:
            print(plan)
    spark.stop()
    if write and not only:
        with open(DOC, "w") as f:
            f.write(DOC_HEADER + "\n".join(lines) + "\n```\n")
        print(f"[audit] wrote {DOC} ({len(lines)} queries)")


if __name__ == "__main__":
    main()
