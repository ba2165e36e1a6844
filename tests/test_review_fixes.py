"""Regression tests for the round-3 review findings on earlier code:
linear comment-end-bang rewrite, bounded pair-grid blocks, minhash band
validation, keep-all sampling rate."""

from __future__ import annotations

import random
import re
import time

import pytest

from spacetime_crawler4py_spark.functions.htmlparse import (
    _fix_comment_end_bang,
)
from spacetime_crawler4py_spark.operators.dedup import minhash_native_bands
from spacetime_crawler4py_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)
from spacetime_crawler4py_spark.operators.similarity_search import (
    _grid_blocks,
)

# the old quadratic-backtracking pattern, kept as the semantics oracle
_OLD_RE = re.compile(r"(<!--(?:(?!-->).)*?)--!>", re.DOTALL)


def test_comment_end_bang_linear_matches_regex_semantics():
    cases = [
        "<!-- a --!> b",
        "<!-- a --> text --!> more",      # text occurrence untouched
        "<!-- a --!> <!-- b --!>",
        "x --!> y",
        "<!-- open forever --!",
        "<!-- a --> <!-- b --!> c",
        "no comments here",
    ]
    # fuzz over realistic fragments (no comment-opener inside an open
    # comment body — there the old regex over-rewrote, see below)
    rng = random.Random(7)
    atoms = ["<!-- c ", "-->", "--!>", "txt ", "- ", "! ", "> "]
    for _ in range(300):
        frag = []
        in_comment = False
        for _ in range(rng.randint(0, 30)):
            a = rng.choice(atoms)
            if a == "<!-- c ":
                if in_comment:
                    continue
                in_comment = True
            elif a in ("-->", "--!>"):
                in_comment = False
            frag.append(a)
        cases.append("".join(frag))
    for html in cases:
        want = _OLD_RE.sub(r"\1-->", html) if "--!>" in html else html
        assert _fix_comment_end_bang(html) == want, html


def test_comment_opener_inside_comment_is_data():
    """HTML5: comments do not nest — '<!--' inside an open comment is
    data, and the comment still ends at the FIRST '-->' / '--!>'. The
    old regex re-entered at inner openers and over-rewrote; the
    sequential scan matches the real tokenizer."""
    # comment closes at '-->' (inside '<!-->'); the later '--!>' is text
    html = "<!--!txt <!-->--!>"
    assert _fix_comment_end_bang(html) == html
    # comment closes at the first '--!>' even with an opener inside
    html2 = "<!-- a <!-- b --!> tail"
    assert _fix_comment_end_bang(html2) == "<!-- a <!-- b --> tail"


def test_comment_end_bang_adversarial_is_linear_time():
    """'<!--'*k + '-->' + '--!>' made the regex quadratic (4s at 32KB);
    the scan must stay effectively instant and agree with the regex."""
    evil = "<!--" * 8000 + "-->" + "--!>"
    t0 = time.monotonic()
    got = _fix_comment_end_bang(evil)
    assert time.monotonic() - t0 < 1.0
    assert got == _OLD_RE.sub(r"\1-->", evil)


def test_grid_blocks_honors_both_bounds():
    # parallelism-bound regime
    assert _grid_blocks(n_rows=1000, rows_per_block=4096, parallelism=16) == 32
    # block-size-bound regime: 1e6 rows / 4096 -> 245 blocks, not 32
    assert _grid_blocks(1_000_000, 4096, 16) == 245
    assert _grid_blocks(0, 4096, 0) == 2


def test_minhash_native_bands_validates_divisibility(spark):
    df = spark.createDataFrame([(1, 7)], "id long, gh long")
    with pytest.raises(ValueError):
        minhash_native_bands(df, num_perm=64, bands=24)
    with pytest.raises(ValueError):
        minhash_native_bands(df, num_perm=64, bands=0)


def test_keep_all_rate_is_expressible(spark):
    df = spark.createDataFrame(
        [(i, "hq" if i % 2 else "noisy") for i in range(200)],
        "doc_id long, source string",
    )
    assert hash_sample(df, "doc_id", 1.0).count() == 200
    kept = stratified_hash_sample(
        df, "doc_id", "source", {"hq": 1.0, "noisy": 0.25}
    )
    assert kept.where("source = 'hq'").count() == 100
    assert 0 < kept.where("source = 'noisy'").count() < 100
