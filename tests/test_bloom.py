"""Bloom seen-filter properties: no false negatives ever (a False probe
must prove novelty — the engine skips the authoritative anti-join on it),
bounded false-positive rate, merge/state round-trips, and the partitioned
(per-bucket) layout behaving identically to a monolithic filter."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from spacetime_crawler4py_spark.functions.bloom import BloomFilter, PartitionedBloom


def _hashes(prefix: str, n: int) -> list[str]:
    return [hashlib.sha256(f"{prefix}-{i}".encode()).hexdigest() for i in range(n)]


SEEN = _hashes("seen", 5000)
FRESH = _hashes("fresh", 5000)


def test_no_false_negatives():
    bf = BloomFilter.sized_for(len(SEEN))
    bf.add_many(SEEN)
    assert bf.might_contain_series(pd.Series(SEEN)).all()


def test_false_positive_rate_bounded():
    bf = BloomFilter.sized_for(len(SEEN))
    bf.add_many(SEEN)
    fp = bf.might_contain_series(pd.Series(FRESH)).mean()
    # 12 bits/key with k=8 gives fpp ~ 3e-4; allow generous slack
    assert fp < 0.01, fp


def test_merge_equals_union():
    a = BloomFilter.sized_for(10000)
    b = BloomFilter.sized_for(10000)
    a.add_many(SEEN[:2500])
    b.add_many(SEEN[2500:])
    a.merge_inplace(b)
    assert a.might_contain_series(pd.Series(SEEN)).all()


def test_state_round_trip():
    bf = BloomFilter.sized_for(1000)
    bf.add_many(SEEN[:100])
    clone = BloomFilter.from_state(bf.to_state())
    assert clone.might_contain_series(pd.Series(SEEN[:100])).all()
    assert (clone.bits == bf.bits).all()


def test_partitioned_no_false_negatives_and_bounded_fp():
    pb = PartitionedBloom.sized_for(len(SEEN), n_buckets=8)
    pb.add_many(SEEN)
    assert pb.might_contain_series(pd.Series(SEEN)).all()
    assert pb.might_contain_series(pd.Series(FRESH)).mean() < 0.01


def test_partitioned_state_round_trip():
    pb = PartitionedBloom.sized_for(2000, n_buckets=4)
    pb.add_many(SEEN[:500])
    clone = PartitionedBloom.from_state(pb.to_state())
    assert clone.might_contain_series(pd.Series(SEEN[:500])).all()


@pytest.mark.usefixtures("spark")
def test_partitioned_distributed_build(spark):
    df = spark.createDataFrame([(h,) for h in SEEN], "url_hash string").repartition(7)
    pb = PartitionedBloom.build_partitioned(
        df, "url_hash", n_buckets=8, n_items_hint=len(SEEN)
    )
    assert pb.might_contain_series(pd.Series(SEEN)).all()
    assert pb.might_contain_series(pd.Series(FRESH)).mean() < 0.01
    # distributed build == driver-side build on identical input
    local = PartitionedBloom.sized_for(len(SEEN), n_buckets=8)
    local.add_many(SEEN)
    for b in range(8):
        assert (local.filters[b].bits == pb.filters[b].bits).all()
