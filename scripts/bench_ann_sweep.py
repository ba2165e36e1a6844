#!/usr/bin/env python
"""Recall-vs-(n_planes, n_tables) sweep for the random-hyperplane ANN
index, written to BENCH/ANN_SWEEP.md.

Uses the numpy twin of the operator's bucket math (same int_plane_matrix
hyperplanes, same sign-code einsum — bit-identical to
similarity_search.lsh_bucketed_topk's pandas UDF, which
tests/test_dedup_scale.py gates against brute force at the production
default). Probe truth is exact brute-force cosine top-10.

The corpus matters: the synthetic testdata embeddings have near-
orthogonal true neighbors (median truth cosine ~0.29), the HARD regime
for hyperplane LSH — recall here is a lower bound on what clustered
real-world embeddings give at the same config.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
K = 10
N_PROBES = 20


def main() -> None:
    from spacetime_crawler4py_spark.operators.similarity_search import (
        int_plane_matrix,
    )

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    V = np.floor(np.stack(t["embedding"].to_numpy()).astype(np.float64) * 1000)
    n, dim = V.shape
    norms = np.linalg.norm(V, axis=1)
    cos = (V @ V.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -2)
    probes = list(range(N_PROBES))
    truth = {p: set(np.argsort(-cos[p])[:K]) for p in probes}
    truth_cos = [cos[p, j] for p in probes for j in truth[p]]

    rows = []
    for n_planes in (2, 3, 4, 5, 6, 8):
        for n_tables in (4, 8, 12, 16, 24, 32):
            planes = int_plane_matrix(dim, n_planes, n_tables, seed=42)
            signs = np.einsum("tpd,bd->btp", planes, V) > 0
            w = 1 << np.arange(n_planes, dtype=np.int64)
            codes = (signs * w).sum(axis=2)
            hit = tot = 0
            cands_total = 0
            for p in probes:
                cands: set[int] = set()
                for tb in range(n_tables):
                    cands.update(np.nonzero(codes[:, tb] == codes[p, tb])[0])
                cands.discard(p)
                cands_total += len(cands)
                ranked = sorted(cands, key=lambda j: -cos[p, j])[:K]
                hit += len(truth[p] & set(ranked))
                tot += K
            rows.append(
                (n_planes, n_tables, hit / tot,
                 cands_total / (N_PROBES * (n - 1)))
            )

    md_path = os.path.join(REPO, "BENCH", "ANN_SWEEP.md")
    with open(md_path, "w", encoding="utf-8") as f:
        f.write(
            "# ANN recall sweep — random-hyperplane LSH\n\n"
            f"Corpus: {SF_DIR}/embeddings.parquet ({n} vectors, dim {dim},\n"
            "quantized x1000 like the contract queries). Truth = exact\n"
            f"brute-force cosine top-{K} for {N_PROBES} probes; truth-\n"
            f"neighbor cosine median {np.median(truth_cos):.3f} (near-\n"
            "orthogonal -> the HARD regime for hyperplane LSH; clustered\n"
            "real-world embeddings do better at equal config).\n\n"
            "| n_planes | n_tables | recall@10 | candidate fraction |\n"
            "|---|---|---|---|\n"
        )
        for n_planes, n_tables, rec, frac in rows:
            mark = " **<- production default**" if (
                n_planes, n_tables) == (5, 32) else ""
            f.write(
                f"| {n_planes} | {n_tables} | {rec:.3f} | "
                f"{frac:.2f}{mark} |\n"
            )
        f.write(
            "\nReading: recall rises with tables (more unions) and falls\n"
            "with planes (finer buckets). The production default (5, 32)\n"
            "is the smallest candidate fraction reaching recall >= 0.9 on\n"
            "this corpus — the pytest gate\n"
            "(test_ann_recall_vs_brute_force) holds the real Spark\n"
            "operator to >= 0.9 at exactly that config. Pinned-plane\n"
            "contract query ann_lsh is unaffected (its planes are chosen\n"
            "for recall 1 and inlined into the SQL oracle). At corpus\n"
            "scale the candidate fraction, not recall, is the cost knob:\n"
            "raise n_planes as cluster tightness allows.\n"
        )
    for n_planes, n_tables, rec, frac in rows:
        print(f"planes={n_planes} tables={n_tables} "
              f"recall={rec:.3f} cands={frac:.2f}")


if __name__ == "__main__":
    main()
