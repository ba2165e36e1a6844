"""Round-2 dedup/ANN guarantees: LSH candidate containment, ANN recall vs
brute force, hot-shingle cap exactness, blocked-grid all-pairs equality,
and the sketch-scheme resume guard."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spacetime_crawler4py_spark.operators.dedup import (
    _lsh_candidate_ids,
    _minhash_base,
    minhash_lsh_verified_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from spacetime_crawler4py_spark.operators.similarity_search import (
    blocked_pair_cos_bp,
    brute_force_topk,
    int_plane_matrix,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("double")
        ).alias("v"),
    )


def _pair_set(df, a="id", b="id2"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_candidates_contain_exact_pairs(docs):
    """The LSH guarantee the verified-pairs oracle depends on: every exact
    Jaccard pair above tau is an LSH candidate (recall 1 on this corpus)
    — for BOTH signature kernels (the JVM-native xxhash64 family and the
    engine's splitmix64 Arrow-UDF scheme)."""
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.operators.dedup import (
        _candidates_from_blocks,
        minhash_native_bands,
        shingles_exploded,
    )

    exact = _pair_set(ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3))
    cands = _lsh_candidate_ids(_minhash_base(docs, "doc_id", "text", 64, 16))
    missing = exact - _pair_set(cands)
    assert not missing, f"python-kernel LSH missed exact pairs: {sorted(missing)[:5]}"

    ex = shingles_exploded(docs, "doc_id", "text", 3).select(
        "id", F.xxhash64("g").alias("gh")
    )
    native = _candidates_from_blocks(minhash_native_bands(ex, 64, 16))
    missing = exact - _pair_set(native)
    assert not missing, f"native-kernel LSH missed exact pairs: {sorted(missing)[:5]}"


def test_minhash_verified_equals_exact(docs):
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3)
    verified = minhash_lsh_verified_pairs(docs, "doc_id", "text", threshold=0.3)
    assert _pair_set(verified) == _pair_set(exact)


def test_hot_shingle_cap_preserves_true_pairs(spark):
    """Inject a boilerplate shingle shared by every doc: the capped run
    must (a) agree with the uncapped run on all pairs above tau, while
    (b) excluding the boilerplate shingle from candidate generation."""
    boiler = "all rights reserved contact webmaster for details"

    def word(i, j):  # tokenizer keeps [a-z]{2,} only — letters, no digits
        return "w" + "".join(
            "abcdefghij"[int(c)] for c in str(i)
        ) + "x" + "".join("abcdefghij"[int(c)] for c in str(j))

    rows = []
    for i in range(40):
        body = " ".join(word(i, j) for j in range(30))
        rows.append((i, body + " " + boiler))
    # two true near-dups sharing real content
    rows.append((100, "the quick brown fox jumps over the lazy dog " + boiler))
    rows.append((101, "the quick brown fox jumps over the lazy dog " + boiler))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5)
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, max_doc_freq=10
    )
    assert _pair_set(capped) == _pair_set(uncapped) == {(100, 101)}
    # and the reported jaccard stays exact (full sets incl. hot shingles)
    j_un = {(r["id"], r["id2"]): r["jaccard"] for r in uncapped.collect()}
    j_cap = {(r["id"], r["id2"]): r["jaccard"] for r in capped.collect()}
    assert j_cap == j_un


def test_simhash_blocking_is_lossless(docs):
    """Pigeonhole blocking (max_hamming+1 blocks) must equal the all-pairs
    scan: compare against pairs computed with blocking disabled via a
    hamming budget so large every pair survives one shared block."""
    blocked = simhash_pairs(docs, "doc_id", "text", max_hamming=8)
    # oracle: compute sketches once, all-pairs hamming in pandas
    from spacetime_crawler4py_spark.functions.fingerprint import simhash64_md5
    from spacetime_crawler4py_spark.functions.tokenize import report_tokens

    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    sk = {i: simhash64_md5(report_tokens(t)) for i, t in texts.items()}
    ids = sorted(i for i, s in sk.items() if s is not None)
    want = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if bin(sk[ids[a]] ^ sk[ids[b]]).count("1") <= 8:
                want.add((ids[a], ids[b]))
    assert _pair_set(blocked) == want


def test_ann_recall_vs_brute_force(emb):
    """An untested ANN index is unshippable: gate recall@10 of the
    bucketed path at its PRODUCTION defaults (n_planes=5, n_tables=32 —
    the measured efficiency frontier, scripts/bench_ann_sweep.py /
    BENCH/ANN_SWEEP.md) against the exact brute-force baseline. 0.9 on
    this corpus is a hard bar: its true neighbors are near-orthogonal
    (median truth cosine ~0.29), the worst regime for hyperplane LSH."""
    probes = emb.where(F.col("vec_id") < 20)
    truth = brute_force_topk(emb, probes, "vec_id", "v", k=10)
    ann = lsh_bucketed_topk(emb, probes, "vec_id", "v", dim=64, k=10)
    t = {(r.probe_id, r.neighbor_id) for r in truth.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in ann.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.9, f"ANN recall@10 too low: {recall:.2f}"


def test_ivf_recall_vs_brute_force(emb):
    """Same bar as the LSH index: recall@10 >= 0.9 at the PRODUCTION
    defaults (n_centroids=16, n_probe=8 — the measured frontier on this
    near-orthogonal corpus; see the sweep in ivf_topk's signature)."""
    probes = emb.where(F.col("vec_id") < 20)
    truth = brute_force_topk(emb, probes, "vec_id", "v", k=10)
    ann = ivf_topk(emb, probes, "vec_id", "v", k=10)
    t = {(r.probe_id, r.neighbor_id) for r in truth.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in ann.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.9, f"IVF recall@10 too low: {recall:.2f}"


def test_ivf_candidates_come_from_probed_cells(emb):
    """Structural invariant of the inverted file: every returned neighbor
    lives in one of its probe's n_probe nearest cells, and each neighbor
    is assigned to exactly one cell."""
    probes = emb.where(F.col("vec_id") < 5)
    out = ivf_topk(emb, probes, "vec_id", "v", n_probe=2, k=50).collect()

    # recompute assignments/probe cells with the same deterministic rule
    import numpy as np

    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.v) for r in rows}
    cents = {i: vecs[i] for i in range(16) if i in vecs}

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    def ranked_cells(v):
        return sorted(cents, key=lambda c: (-cos(v, cents[c]), c))

    cell_of = {i: ranked_cells(v)[0] for i, v in vecs.items()}
    for r in out:
        probed = ranked_cells(vecs[r.probe_id])[:2]
        assert cell_of[r.neighbor_id] in probed, (
            r.probe_id, r.neighbor_id, cell_of[r.neighbor_id], probed
        )


def _cosine_inertia(emb, cent):
    """Sum over vectors of (1 - best cosine to any centroid)."""
    from spacetime_crawler4py_spark.operators.dedup import cosine_sim_col

    best = (
        emb.join(F.broadcast(cent), how="cross")
        .select(
            "vec_id", cosine_sim_col(F.col("v"), F.col("cv")).alias("c")
        )
        .groupBy("vec_id")
        .agg(F.max("c").alias("best"))
    )
    return best.agg(F.sum(1 - F.col("best"))).first()[0]


def test_kmeans_improves_on_its_init(emb):
    """The Lloyd invariant: 5 trained iterations must not quantize worse
    than the hash-sampled initialization they started from."""
    init = (
        emb.withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h", "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    trained = kmeans_centroids(emb, "vec_id", "v", k=16, iters=5).select(
        "cid", "cv"
    )
    i0 = _cosine_inertia(emb, init)
    i5 = _cosine_inertia(emb, trained)
    assert i5 <= i0 + 1e-9, (i5, i0)


def test_kmeans_balances_ivf_cells(emb):
    """The production reason to train the quantizer: bounded worst-case
    cell size (candidate-join skew). On this corpus the trained max/mean
    cell ratio is ~1.15 vs ~1.38 for id-sampled centroids; the bound
    below leaves fp-ordering headroom. (Recall at equal n_probe is the
    trade-off — imbalanced sampled cells scan more of the corpus — which
    is why ivf_topk's default centroids stay the SQL-expressible sampled
    ones and training is opt-in.)"""
    from spacetime_crawler4py_spark.operators.dedup import cosine_sim_col

    cent = kmeans_centroids(emb, "vec_id", "v", k=16, iters=5).select(
        "cid", "cv"
    )
    sizes = (
        emb.join(F.broadcast(cent), how="cross")
        .select(
            "vec_id", "cid",
            cosine_sim_col(F.col("v"), F.col("cv")).alias("c"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("c"), (-F.col("cid")).alias("t"))
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ns = [r["n"] for r in sizes]
    assert max(ns) / (sum(ns) / len(ns)) <= 1.3


def test_ivf_indexed_equals_direct_and_skips_corpus_shuffle(spark, emb):
    """build_ivf_index + ivf_topk_indexed must return row-identical
    results to the one-shot ivf_topk under the same quantizer/params, and
    the probe-time candidate join must NOT shuffle the persisted inverted
    file (the build-once/query-many contract: with broadcast and AQE off,
    the only shuffles are the probe side and the re-rank window)."""
    import uuid

    from spacetime_crawler4py_spark.operators.similarity_search import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    tbl = f"ivf_inv_{uuid.uuid4().hex[:8]}"
    cent = emb.where(F.col("vec_id") < 16).select("vec_id", "v")
    probes = emb.where(F.col("vec_id") < 10)
    try:
        build_ivf_index(emb, "vec_id", "v", tbl, centroids=cent)
        got = ivf_topk_indexed(
            spark, tbl, probes, "vec_id", "v", cent, n_probe=4, k=5
        )
        want = ivf_topk(
            emb, probes, "vec_id", "v", centroids=cent, n_probe=4, k=5
        )
        rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
        assert rows(got) == rows(want) and got.count() > 0

        # A/B the plan against an UNBUCKETED copy of the same inverted
        # file: the bucketed layout must save exactly the corpus-side
        # Exchange (probe pipeline legitimately shuffles 3x: probe_id
        # window -> cell join -> probe_id re-rank window)
        flat = f"{tbl}_flat"
        spark.table(tbl).write.mode("overwrite").saveAsTable(flat)
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.enabled", "false")

            def n_shuffles(table_name):
                plan = ivf_topk_indexed(
                    spark, table_name, probes, "vec_id", "v", cent,
                    n_probe=4, k=5,
                )._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                assert "SortMergeJoin" in plan
                return sum(
                    1 for ln in plan.splitlines()
                    if not ln.lstrip().startswith("(")
                    and "Exchange" in ln and "BroadcastExchange" not in ln
                    and "Reused" not in ln
                )
            assert n_shuffles(flat) == n_shuffles(tbl) + 1 == 4
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.sql(f"DROP TABLE IF EXISTS {flat}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_blocked_grid_equals_single_block(emb):
    """The distributed block-pair grid (no driver collect) must produce
    identical pairs regardless of block count."""
    one = blocked_pair_cos_bp(emb, "vec_id", "v", min_cos_bp=3000, n_blocks=1)
    grid = blocked_pair_cos_bp(emb, "vec_id", "v", min_cos_bp=3000, n_blocks=5)
    rows_one = {(r.id, r.id2, r.cos_bp) for r in one.collect()}
    rows_grid = {(r.id, r.id2, r.cos_bp) for r in grid.collect()}
    assert rows_one == rows_grid
    assert rows_one  # non-trivial


def test_sketch_scheme_guard(spark, tmp_path):
    """Resuming over a fingerprints table written under a different sketch
    scheme must refuse, not silently mix signatures."""
    from spacetime_crawler4py_spark.sources.store import SnapshotStore
    from spacetime_crawler4py_spark.streaming.epochs import CrawlEngine, EngineConfig

    d = str(tmp_path / "store")
    store = SnapshotStore(spark, d)
    store.append(
        "fingerprints",
        spark.createDataFrame(
            [("x", 0, "d", [1], [2])],
            "doc_id string, ord_round long, ord_pop string, "
            "fps array<long>, bands array<long>",
        ),
    )
    store.set_property("fingerprints", "sketch_scheme", "legacy/v0")
    with pytest.raises(ValueError, match="sketch scheme"):
        CrawlEngine(
            spark, store, None, EngineConfig(ordering="relaxed", neardup="lsh")
        )


def test_cross_corpus_contamination_hand_case(spark):
    """Containment is the EVAL doc's covered fraction, floored to ppm;
    the train-side df cap removes ubiquitous grams from the metric."""
    from spacetime_crawler4py_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    # 3-grams; eval doc 10 has tokens a b c d -> grams {abc, bcd} (n_ev=2)
    train = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),          # shares both grams -> 1000000 ppm
            (2, "aa bb cc zz"),          # shares "aa bb cc" -> 500000 ppm
            (3, "zz yy xx ww"),          # shares nothing
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(10, "aa bb cc dd")], "doc_id long, text string")
    got = {
        (r["train_id"], r["eval_id"]): (r["common"], r["containment_ppm"])
        for r in cross_corpus_contamination(
            train, ev, "doc_id", "text", n=3
        ).collect()
    }
    assert got == {(1, 10): (2, 1000000), (2, 10): (1, 500000)}

    # cap: "aa bb cc" appears in 2 train docs; cap=1 excludes it, leaving
    # only "bb cc dd" (train doc 1) -> doc 1 covers 1/1 of eval's
    # remaining grams; doc 2 drops out entirely
    capped = {
        (r["train_id"], r["eval_id"]): (r["common"], r["containment_ppm"])
        for r in cross_corpus_contamination(
            train, ev, "doc_id", "text", n=3, max_gram_train_df=1
        ).collect()
    }
    assert capped == {(1, 10): (1, 1000000)}


def test_quantize_embeddings_int8_properties(spark):
    """q in [-127,127]; the max-|v| dim hits ±127 exactly; dequantization
    error is bounded by one quant step; zero vectors quantize to all-0."""
    from spacetime_crawler4py_spark.operators.similarity_search import (
        quantize_embeddings_int8,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.001, 0.002, -0.0005, 0.0015]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = quantize_embeddings_int8(df, "vec_id", "embedding").collect()
    byid = {}
    for r in out:
        byid.setdefault(r["id"], {})[r["dim_idx"]] = (r["q"], r["scale_micro"])
    assert all(-127 <= q <= 127 for d in byid.values() for q, _ in d.values())
    # vec 1: maxabs dim is -1.0 -> floor(-1e6*127/1e6) = -127 exactly
    assert byid[1][1] == (-127, 1000000)
    assert byid[3] == {i: (0, 0) for i in range(4)}
    # dequant error <= 1 step (scale/127) + micro-floor slack, all dims
    for vid, vec in rows:
        for i, v in enumerate(vec):
            q, scale = byid[vid][i]
            if scale == 0:
                continue
            step = scale / 1e6 / 127
            assert abs(q * step - v) <= step + 2e-6, (vid, i, q, scale, v)


def test_pair_operators_scan_corpus_once(spark):
    """The sketch/shingle pass of every pair operator is checkpointed:
    downstream consumers (candidate generation, per-doc sizes, both
    verification join sides) must read the materialized frame, never
    re-derive it from the corpus scan. Without the checkpoint these
    plans read the parquet source 8-12x with zero ReusedExchange —
    i.e. 8-12 full re-tokenizations of the corpus at scale."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def plan_of(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for label, df in {
        "simhash": simhash_pairs(docs, "doc_id", "text", max_hamming=8),
        "minhash": minhash_lsh_verified_pairs(
            docs, "doc_id", "text", threshold=0.3
        ),
        "ngram": ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3),
    }.items():
        plan = plan_of(df)
        n_scans = plan.count("Scan parquet")
        assert n_scans == 0, (
            f"{label}: {n_scans} parquet scans — the corpus pass is being "
            "re-derived instead of read from the checkpoint"
        )


def test_simhash_native_sketch_matches_python_kernel(spark):
    """The JVM-native md5-scheme sketch must be bit-identical to the
    Arrow-UDF kernel (fingerprint.simhash64_md5) over the real corpus —
    same signed 64-bit values, same doc set (tokenless docs absent)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    native = {
        (r.id, r.sh)
        for r in __import__(
            "spacetime_crawler4py_spark.operators.dedup", fromlist=["d"]
        ).simhash_native_sketch(docs, "doc_id", "text").collect()
    }
    from spacetime_crawler4py_spark.functions.fingerprint import (
        simhash64_md5_batch,
    )
    from spacetime_crawler4py_spark.functions.tokenize import report_tokens

    rows = docs.select("doc_id", "text").collect()
    want = set()
    for r in rows:
        (v,) = simhash64_md5_batch([report_tokens(r.text or "")])
        if v is None:
            continue
        want.add((r.doc_id, v - (1 << 64) if v >= (1 << 63) else v))
    assert native == want and native


def test_simhash_pairs_schemes_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r.id, r.id2, r.hamming)
        for r in simhash_pairs(docs, "doc_id", "text", 8, scheme="native").collect()
    }
    b = {
        (r.id, r.id2, r.hamming)
        for r in simhash_pairs(docs, "doc_id", "text", 8, scheme="python").collect()
    }
    assert a == b and a


def test_simhash_native_scheme_preserves_string_ids(spark):
    """The native kernel must not coerce ids: string ids flow through
    both schemes identically (a long cast would NULL them out and
    collapse every doc into one sketch)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("concat('url-', doc_id) AS url", "text")
        .limit(50)
    )
    a = {
        (r.id, r.id2, r.hamming)
        for r in simhash_pairs(docs, "url", "text", 8, scheme="native").collect()
    }
    b = {
        (r.id, r.id2, r.hamming)
        for r in simhash_pairs(docs, "url", "text", 8, scheme="python").collect()
    }
    assert a == b


def test_ivf_trained_recall_and_determinism(emb):
    """The trained-quantizer contract path (q_ann_ivf_trained): fixed-point
    Lloyd updates must be partitioning-independent (bit-identical centroids
    from a 1-partition and a 32-partition run of the same corpus), and the
    trained index must clear the same recall@10 >= 0.9 bar as the sampled
    one at its contract config (k=16 cells, n_probe=8 — measured sweep:
    (8,5)=0.87 (8,6)=0.94 (16,8)=0.915 (16,10)=0.96)."""
    cfg = dict(k=16, iters=2, init="minid", floor_updates=True)
    c_a = kmeans_centroids(emb.coalesce(1), "vec_id", "v", **cfg)
    c_b = kmeans_centroids(emb.repartition(32), "vec_id", "v", **cfg)
    rows_a = {r.cid: list(r.cv) for r in c_a.collect()}
    rows_b = {r.cid: list(r.cv) for r in c_b.collect()}
    assert rows_a == rows_b, "floor-updated Lloyd is partitioning-dependent"
    # every centroid is integer-valued (the fixed-point invariant)
    assert all(x == float(int(x)) for cv in rows_a.values() for x in cv)

    cents = c_a.select(F.col("cid").alias("vec_id"), F.col("cv").alias("v"))
    probes = emb.where(F.col("vec_id") < 20)
    truth = brute_force_topk(emb, probes, "vec_id", "v", k=10)
    ann = ivf_topk(
        emb, probes, "vec_id", "v", centroids=cents, n_probe=8, k=10
    )
    t = {(r.probe_id, r.neighbor_id) for r in truth.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in ann.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.9, f"trained-IVF recall@10 too low: {recall:.2f}"


def test_semantic_dedup_planted_and_invariance(spark, emb):
    """semantic_dedup (SemDeDup): planted exact duplicates must be dropped
    with their original as witness; the keep rule must match a local
    re-derivation (drop iff some smaller-id cluster-mate >= threshold);
    and the whole output must be partitioning-invariant."""
    from spacetime_crawler4py_spark.operators.similarity_search import (
        semantic_dedup,
    )

    # plant: vectors 10000+i are exact copies of vectors i (i<5) -> cos=1
    base = emb.where(F.col("vec_id") < 200)
    clones = base.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "v"
    )
    corpus = base.unionByName(clones)
    cents = kmeans_centroids(
        corpus, "vec_id", "v", k=4, iters=2, init="minid", floor_updates=True
    )
    out = semantic_dedup(corpus, "vec_id", "v", cents, min_cos_bp=9900)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 205
    for i in range(5):
        clone = rows[10000 + i]
        assert not clone.kept and clone.dup_of == i and clone.cos_bp >= 9900
        assert rows[i].kept  # originals have no smaller-id twin

    # local re-derivation of the keep rule at an in-distribution threshold
    import math

    vecs = {r.vec_id: list(r.v) for r in corpus.collect()}
    cells = {r.vec_id: r.cell for r in semantic_dedup(
        corpus, "vec_id", "v", cents, min_cos_bp=2500).collect()}
    out2 = {r.vec_id: r for r in semantic_dedup(
        corpus.repartition(7), "vec_id", "v", cents, min_cos_bp=2500
    ).collect()}

    def bp(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return math.floor(
            dot / (math.sqrt(sum(x * x for x in a))
                   * math.sqrt(sum(y * y for y in b))) * 10000
        )

    for vid, r in out2.items():
        mates = [w for w in vecs if w < vid and cells[w] == cells[vid]
                 and bp(vecs[w], vecs[vid]) >= 2500]
        if mates:
            assert not r.kept and r.dup_of == min(mates)
        else:
            assert r.kept and r.dup_of is None and r.cos_bp is None
