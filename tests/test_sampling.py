"""Deterministic sampling + decile stats (operators/sampling.py).

The property that distinguishes hash_sample from DataFrame.sample: the
kept set is a pure function of row identity — identical across partition
counts, row orders, and engines (verified against a pure-Python md5
recomputation).
"""

from __future__ import annotations

import hashlib

import pytest

from spacetime_crawler4py_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    stratum_decile_stats,
)


def _py_key(doc_id: int, salt: str = "sample") -> str:
    return hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:4]


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_hash_sample_matches_python_oracle_and_layout_independent(spark):
    rows = [(i, f"src{i % 3}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    expect = {i for i, _ in rows if _py_key(i) < format(int(0.3 * 65536), "04x")}
    got1 = _ids(hash_sample(df, "doc_id", 0.3))
    got2 = _ids(hash_sample(df.repartition(17), "doc_id", 0.3))
    got3 = _ids(hash_sample(df.orderBy(df.doc_id.desc()).coalesce(1), "doc_id", 0.3))
    assert got1 == expect
    assert got2 == expect and got3 == expect


def test_stratified_rates_match_python_oracle(spark):
    rows = [(i, f"src{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 0.1, "src1": 0.5}  # src2 -> default 0.0
    got = _ids(stratified_hash_sample(df, "doc_id", "source", rates))
    expect = {
        i
        for i, s in rows
        if _py_key(i) < format(int(rates.get(s, 0.0) * 65536), "04x")
    }
    assert got == expect
    assert not any(i % 3 == 2 for i in got)  # default rate 0 drops src2


def test_rate_bounds(spark):
    """rate=1.0 (keep-all, a standard mixture weight) is expressible;
    out-of-range rates are rejected."""
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    assert hash_sample(df, "doc_id", 1.0).count() == 1
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", -0.1)


def test_decile_stats_hand_case(spark):
    # 25 rows, one stratum, values == ids: ntile(10) over 25 rows gives
    # tile sizes 3,3,3,3,3,2,2,2,2,2 in order
    df = spark.createDataFrame(
        [(i, "s", i) for i in range(1, 26)], "doc_id long, stratum string, v long"
    )
    got = {
        r["tile"]: (r["n_rows"], r["min_val"], r["max_val"])
        for r in stratum_decile_stats(df, "stratum", "v", "doc_id", 10).collect()
    }
    assert got[1] == (3, 1, 3)
    assert got[5] == (3, 13, 15)
    assert got[6] == (2, 16, 17)
    assert got[10] == (2, 24, 25)
    assert sum(n for n, _, _ in got.values()) == 25


def test_decile_ties_broken_by_id(spark):
    # all-equal values: the tiling must still be deterministic (id order)
    df = spark.createDataFrame(
        [(i, "s", 7) for i in range(1, 11)], "doc_id long, stratum string, v long"
    )
    a = stratum_decile_stats(df, "stratum", "v", "doc_id", 5).collect()
    b = stratum_decile_stats(
        df.repartition(7), "stratum", "v", "doc_id", 5
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["n_rows"] == 2 for r in a)


def test_top_k_per_stratum_hand_case(spark):
    from pyspark.sql import functions as F

    from spacetime_crawler4py_spark.operators.sampling import top_k_per_stratum

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "a", 5), (5, "b", 1)],
        "doc_id long, source string, n long",
    )
    got = {
        r["doc_id"]: r["quota_rank"]
        for r in top_k_per_stratum(
            df, "source", [F.col("n").desc(), F.col("doc_id").asc()], 2
        ).collect()
    }
    # source a: ties at n=30 break by doc_id -> 2 then 3; doc 1/4 cut
    assert got == {2: 1, 3: 2, 5: 1}
