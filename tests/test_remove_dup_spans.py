"""remove_dup_spans (exact substring dedup rewrite): python-oracle
differential on synthetic docs with engineered shared runs, consistency
with dup_span_stats, fully-removed and untouched docs."""

from __future__ import annotations

import hashlib

from spacetime_crawler4py_spark.functions.tokenize import report_tokens
from spacetime_crawler4py_spark.operators.textstats import (
    dup_span_stats,
    remove_dup_spans,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens

DOCS = [
    (0, f"unique zero prefix {SHARED} unique zero suffix tail words here"),
    (1, f"other document opening {SHARED} closing remarks entirely different"),
    (2, "totally original content with no overlap anywhere at all ok"),
    (3, SHARED),  # fully covered -> everything removed
    (4, "short doc"),  # < n tokens: no windows, nothing removed
]


def _py_expected(n=8):
    toks = {d: report_tokens(t) for d, t in DOCS}
    grams = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[i : i + n]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - n + 1):
            if " ".join(ts[i : i + n]) in dup:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(ts) if i not in covered]
        out[d] = (
            len(ts),
            len(ts) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
        for r in remove_dup_spans(df, "doc_id", "text").collect()
    }
    assert got == _py_expected()
    # the engineered facts, spelled out:
    # docs 0 and 1 share a 10-token run -> 10 tokens removed from each
    assert got[0][1] == 10 and got[1][1] == 10
    # doc 2 untouched, doc 3 fully removed, doc 4 too short to window
    assert got[2][1] == 0
    assert got[3][1] == got[3][0]
    assert got[3][2] == hashlib.md5(b"").hexdigest()
    assert got[4][1] == 0


def test_consistent_with_dup_span_stats(spark):
    """A doc has removals iff its dup_ppm readout is nonzero (both sides
    define 'duplicated' as distinct-doc frequency >= 2 on n-gram windows)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    removed = {
        r.doc_id: r.n_removed
        for r in remove_dup_spans(df, "doc_id", "text").collect()
    }
    ppm = {
        r.doc_id: r.dup_ppm for r in dup_span_stats(df, "doc_id", "text").collect()
    }
    for d, p in ppm.items():
        assert (removed[d] > 0) == (p > 0), (d, removed[d], p)


def test_paragraph_dedup_planted_boilerplate(spark):
    """CCNet paragraph dedup: a boilerplate paragraph repeated across docs
    survives only at its first corpus-order occurrence; within-doc repeats
    also collapse; unique paragraphs are untouched; kept_md5 certifies the
    exact rewritten text."""
    import hashlib

    from spacetime_crawler4py_spark.operators.textstats import (
        paragraph_dedup,
    )

    banner = "accept all cookies"
    rows = [
        (1, f"{banner}\n\nalpha beta\n\n{banner}"),      # within-doc repeat
        (2, f"{banner}\n\ngamma delta"),                 # cross-doc repeat
        (3, "epsilon zeta\n\n\n\neta theta"),            # empty para artifact
    ]
    out = {
        r.doc_id: r
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id", "text",
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1].n_paras, out[1].n_kept) == (3, 2)
    assert out[1].kept_md5 == md5(f"{banner}\n\nalpha beta")
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[2].kept_md5 == md5("gamma delta")
    assert (out[3].n_paras, out[3].n_kept) == (2, 2)  # empty para not counted
    assert out[3].kept_md5 == md5("epsilon zeta\n\neta theta")


def test_maximal_runs_keep_short_spans(spark):
    """remove_dup_spans_maximal: a 20-token duplicated block is removed
    (run >= min_len), a 10-token duplicated phrase survives (run < 16) —
    the Lee et al. variable-length semantics v1 cannot express."""
    import hashlib

    from spacetime_crawler4py_spark.operators.textstats import (
        remove_dup_spans_maximal,
    )

    long_block = (
        "one two three four five six seven eight nine ten eleven twelve"
        " thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
        " twenty"
    )  # 20 tokens
    short_phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, f"{long_block} middle words {short_phrase} zz yy xx"),
        (1, f"opening bit {long_block} closing"),
        (2, f"unrelated text start {short_phrase} unrelated ending words"),
        (3, "completely original sentence with no duplicated content at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
        for r in remove_dup_spans_maximal(
            df, "doc_id", "text", n=8, min_len=16
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 0: the 20-token block goes, the 10-token phrase stays
    assert got[0] == (
        35,
        20,
        md5("middle words " + short_phrase + " zz yy xx"),
    )
    # doc 1 loses exactly the block; docs 2/3 keep everything
    assert got[1] == (23, 20, md5("opening bit closing"))
    assert got[2][1] == 0
    assert got[3][1] == 0


def test_maximal_runs_vs_v1_python_oracle(spark):
    """Differential vs a transparent pure-Python re-implementation of the
    maximal-run rule on the v1 fixture (where every duplicated run is the
    10-token SHARED phrase -> with min_len=16 NOTHING is removed, and with
    min_len=8 v2 degenerates to v1)."""
    from spacetime_crawler4py_spark.operators.textstats import (
        remove_dup_spans_maximal,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    v2_16 = {
        r.doc_id: r.n_removed
        for r in remove_dup_spans_maximal(
            df, "doc_id", "text", n=8, min_len=16
        ).collect()
    }
    assert all(v == 0 for v in v2_16.values()), v2_16
    v2_8 = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
        for r in remove_dup_spans_maximal(
            df, "doc_id", "text", n=8, min_len=8
        ).collect()
    }
    assert v2_8 == _py_expected()
