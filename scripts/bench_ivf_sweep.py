#!/usr/bin/env python
"""Recall-vs-(n_centroids, n_probe) sweep for the IVF-flat ANN index,
written to BENCH/IVF_SWEEP.md.

Numpy twin of similarity_search.ivf_topk's cell math: cosine argmax
assignment with ties to the smaller centroid id, probes search their
n_probe nearest cells, exact re-rank inside. Two quantizers per config:

* sampled — centroids = corpus vectors with id < k (the operator's
  SQL-expressible default);
* kmeans  — 5 numpy Lloyd iterations (cosine assignment, mean update)
  from the same sampled init (the operator's kmeans_centroids uses a
  hash-based init; the trade-off shape is identical).

Candidate fraction = mean share of the corpus living in a probe's probed
cells — the true cost proxy (an imbalanced quantizer "wins" recall by
scanning more, which is the fraction column's job to expose). The same
hard-regime caveat as BENCH/ANN_SWEEP.md applies: near-orthogonal
synthetic neighbors are a recall lower bound.
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
OUT = os.path.join(REPO, "BENCH", "IVF_SWEEP.md")


def cos_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    return an @ bn.T


def assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmax cosine, ties to the smaller centroid id (ivf_topk parity)."""
    c = cos_matrix(vecs, cents)
    # argmax returns the FIRST max index -> smaller cid on ties, matching
    # the operator's (cos DESC, cid ASC) ordering
    return c.argmax(axis=1)


def lloyd(vecs: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    cents = vecs[:k].copy()
    for _ in range(iters):
        cell = assign(vecs, cents)
        for c in range(k):
            members = vecs[cell == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def sweep_row(vecs, ids, truth, cents, n_probe):
    cell = assign(vecs, cents)
    probe_cells = np.argsort(-cos_matrix(vecs[:N_PROBES], cents), axis=1)[
        :, :n_probe
    ]
    hits = 0
    frac = 0.0
    for p in range(N_PROBES):
        probed = set(probe_cells[p])
        cand = [i for i in range(len(ids)) if cell[i] in probed and i != p]
        frac += len(cand) / (len(ids) - 1)
        sims = cos_matrix(vecs[p : p + 1], vecs[cand])[0]
        order = sorted(range(len(cand)), key=lambda i: (-sims[i], ids[cand[i]]))
        got = {ids[cand[i]] for i in order[:K]}
        hits += len(got & truth[p])
    return hits / (N_PROBES * K), frac / N_PROBES


def main() -> None:
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    vecs = np.floor(
        np.stack(t["embedding"].to_pylist()).astype(np.float64) * 1000
    )
    sims = cos_matrix(vecs[:N_PROBES], vecs)
    truth = {}
    for p in range(N_PROBES):
        order = sorted(
            (i for i in range(len(ids)) if i != p),
            key=lambda i: (-sims[p, i], ids[i]),
        )
        truth[p] = {ids[i] for i in order[:K]}

    lines = [
        "# IVF recall sweep — inverted-file flat index",
        "",
        f"Corpus: {SF_DIR}/embeddings.parquet ({len(ids)} vectors, dim "
        f"{vecs.shape[1]}, quantized x1000 like the contract queries). "
        f"Truth = exact brute-force cosine top-{K} for {N_PROBES} probes. "
        "Candidate fraction = share of the corpus scanned per probe; an "
        "imbalanced quantizer buys recall by scanning more, so compare "
        "recall AT EQUAL fraction. Hard-regime caveat as ANN_SWEEP.md.",
        "",
        "| n_centroids | n_probe | quantizer | recall@10 | candidate fraction |",
        "|---|---|---|---|---|",
    ]
    for k in (8, 16, 32):
        sampled = vecs[:k]
        trained = lloyd(vecs, k)
        for n_probe in (1, 2, 4, 8):
            if n_probe > k:
                continue
            for name, cents in (("sampled", sampled), ("kmeans", trained)):
                r, f = sweep_row(vecs, ids, truth, cents, n_probe)
                lines.append(
                    f"| {k} | {n_probe} | {name} | {r:.3f} | {f:.2f} |"
                )
    lines += [
        "",
        "Reading: on this corpus the two quantizers scan near-identical "
        "candidate fractions (the synthetic vectors are near-uniform, so "
        "id-sampling is already balanced) and the sampled quantizer's "
        "recall is equal or slightly better — training buys nothing HERE. "
        "Its measured in-repo value is worst-case cell balance (max/mean "
        "cell size 1.38 -> 1.15 at k=16, "
        "tests/test_dedup_scale.py::test_kmeans_balances_ivf_cells), "
        "which is what bounds candidate-join skew on the clustered/skewed "
        "corpora real embeddings produce; this uniform corpus cannot "
        "exhibit that regime. The contract default (16 centroids, 8 "
        "probes, sampled) is the SQL-oracle-expressible config gated at "
        "recall >= 0.9.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
