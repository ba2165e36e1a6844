"""temperature_resample: exact python-oracle recomputation, threshold
semantics per alpha, and layout independence."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from spacetime_crawler4py_spark.operators.sampling import temperature_resample


def _synth(spark, partitions=7):
    rows = []
    sizes = {"big": 640, "mid": 160, "small": 40, "tiny": 10}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return (
        spark.createDataFrame(rows, "doc_id long, source string")
        .repartition(partitions),
        sizes,
    )


def _py_keep(doc_id: int, thr: int, salt="mix") -> bool:
    if thr >= 65536:
        return True
    key = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:4]
    return key < format(thr, "04x")


def _py_thr(c: int, cmin: int, alpha: float) -> int:
    r = (cmin / c) ** (1 - alpha)  # exact for the sqrt-family exponents
    return min(int(math.floor(r * 65536)), 65536)


@pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 0.75, 1.0])
def test_matches_python_oracle(spark, alpha):
    df, sizes = _synth(spark)
    got = {
        (r.doc_id, r.keep_thr_q)
        for r in temperature_resample(df, "doc_id", "source", alpha).collect()
    }
    cmin = min(sizes.values())
    thrs = {s: _py_thr(c, cmin, alpha) for s, c in sizes.items()}
    want = {
        (r.doc_id, thrs[r.source])
        for r in df.collect()
        if _py_keep(r.doc_id, thrs[r.source])
    }
    assert got == want and got


def test_alpha_one_keeps_everything(spark):
    df, sizes = _synth(spark)
    out = temperature_resample(df, "doc_id", "source", alpha=1.0)
    assert out.count() == sum(sizes.values())
    assert {r.keep_thr_q for r in out.collect()} == {65536}


def test_alpha_zero_flattens_thresholds(spark):
    df, sizes = _synth(spark)
    out = temperature_resample(df, "doc_id", "source", alpha=0.0)
    thrs = {r.source: r.keep_thr_q for r in out.collect()}
    # rate = cmin/c exactly: tiny keeps all, big keeps 10/640
    assert thrs["tiny"] == 65536
    assert thrs["big"] == int(10 / 640 * 65536)
    # threshold is monotone decreasing in stratum size
    assert thrs["tiny"] > thrs["small"] > thrs["mid"] > thrs["big"]


def test_layout_independent(spark):
    df, _ = _synth(spark, partitions=1)
    a = temperature_resample(df, "doc_id", "source", 0.5)
    b = temperature_resample(df.repartition(13, "source"), "doc_id", "source", 0.5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rejects_nonportable_alpha(spark):
    df, _ = _synth(spark)
    with pytest.raises(ValueError):
        temperature_resample(df, "doc_id", "source", alpha=0.3)


def test_null_stratum_rows_are_kept(spark):
    """A NULL stratum is a real group (unknown-origin docs): groupBy
    counts it, and the null-safe join must give its rows a threshold
    instead of silently dropping them."""
    rows = [(i, "a") for i in range(40)] + [(i + 100, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "doc_id", "source", alpha=1.0)
    assert out.count() == 50  # alpha=1 keeps the natural distribution
    thrs = {r.source: r.keep_thr_q for r in out.collect()}
    assert thrs == {"a": 65536, None: 65536}
    # and at alpha=0 the null stratum (the rarest) keeps everything
    flat = temperature_resample(df, "doc_id", "source", alpha=0.0)
    null_rows = flat.where("source IS NULL")
    assert null_rows.count() == 10
