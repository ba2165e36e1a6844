"""Broadcastable Bloom filter over URL-seen hashes.

Replaces the reference's shelve-backed ``self.save`` membership probe
(reference crawler/frontier.py:93) at scale, per the north_rule. The filter
is *advisory only*: a probe returning False proves the URL is new (skip the
anti-join for it); True means "maybe seen" and falls through to the
authoritative anti-join — so false positives can never drop a URL.

Index derivation needs no extra hashing: the seen key is already a sha256
hex string (functions/urlkit.url_hash), so k bit positions come from the
double-hashing scheme idx_i = (h1 + i*h2) mod m with h1/h2 = two 64-bit
slices of the digest.

Sizing note for 10^10 URLs (SURVEY §7): a single 10-bits/key filter is
~12 GB — too big to broadcast. The intended cluster layout is per-bucket
filters aligned to frontier hash-buckets (each executor probes only its
bucket's slice); this module supports that by building one filter per
pmod(bucket) via ``build_partitioned``. Locally a single filter suffices.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["BloomFilter", "PartitionedBloom"]


class BloomFilter:
    def __init__(self, n_bits: int, k: int):
        # round bits up to a byte multiple
        n_bits = max(64, (n_bits + 7) // 8 * 8)
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    # -- construction -------------------------------------------------------
    @classmethod
    def sized_for(cls, n_items: int, bits_per_key: int = 12) -> "BloomFilter":
        k = max(1, int(round(bits_per_key * math.log(2))))
        return cls(max(1024, n_items * bits_per_key), k)

    def _positions(self, hex_hashes: pd.Series) -> np.ndarray:
        """(len, k) array of bit positions for sha256-hex keys."""
        h1 = np.array(
            [int(h[:16], 16) for h in hex_hashes], dtype=np.uint64
        )
        h2 = np.array(
            [int(h[16:32], 16) | 1 for h in hex_hashes], dtype=np.uint64
        )
        ks = np.arange(self.k, dtype=np.uint64)
        return (
            (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.n_bits)
        )

    def add_many(self, hex_hashes) -> None:
        s = pd.Series(list(hex_hashes), dtype=object)
        if s.empty:
            return
        pos = self._positions(s).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def might_contain_series(self, hex_hashes: pd.Series) -> pd.Series:
        if hex_hashes.empty:
            return pd.Series([], dtype=bool)
        pos = self._positions(hex_hashes)
        probe = (self.bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return pd.Series(probe.all(axis=1), index=hex_hashes.index)

    def fill_rate(self) -> float:
        """Fraction of set bits. Drives the saturation rebuild: estimated
        false-positive rate is fill**k, and fill > 0.5 means the filter has
        outgrown the sizing it was built with."""
        if hasattr(np, "bitwise_count"):  # numpy >= 2.0
            ones = int(np.bitwise_count(self.bits).sum())
        else:  # pragma: no cover
            ones = int(np.unpackbits(self.bits).sum())
        return ones / self.n_bits

    # -- distributed build / merge ------------------------------------------
    def merge_inplace(self, other: "BloomFilter") -> None:
        assert other.n_bits == self.n_bits and other.k == self.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    @classmethod
    def build_from_df(cls, df, column: str, n_items_hint: int, bits_per_key: int = 12):
        """Build from a DataFrame column of sha256-hex keys: per-partition
        numpy bitmaps OR-reduced — the one legitimately imperative
        per-partition step in the engine (SURVEY §7 'Bloom lifecycle')."""
        proto = cls.sized_for(n_items_hint, bits_per_key)
        return cls.build_from_df_with_shape(df, column, proto.n_bits, proto.k)

    @classmethod
    def build_from_df_with_shape(cls, df, column: str, n_bits: int, k: int):
        """Build an increment with a fixed shape (mergeable into an
        existing filter without counting the input first)."""

        def build_part(rows):
            bf = cls(n_bits, k)
            bf.add_many(r[0] for r in rows)
            yield bf.bits

        parts = df.select(column).rdd.mapPartitions(build_part)
        merged = parts.treeReduce(np.bitwise_or)
        out = cls(n_bits, k)
        out.bits = merged
        return out

    # -- (de)serialization for broadcast -------------------------------------
    def to_state(self) -> tuple[int, int, bytes]:
        return (self.n_bits, self.k, self.bits.tobytes())

    @classmethod
    def from_state(cls, state: tuple[int, int, bytes]) -> "BloomFilter":
        n_bits, k, raw = state
        bf = cls(n_bits, k)
        bf.bits = np.frombuffer(raw, dtype=np.uint8).copy()
        return bf

    @classmethod
    def from_state_cached(
        cls, token: str, state: tuple[int, int, bytes]
    ) -> "BloomFilter":
        """Worker-process-cached reconstruction: a probe UDF runs once per
        Arrow batch, and rebuilding the filter (a full bitset copy) per
        batch is pure waste — the broadcast state is immutable for the
        lifetime of its token (one epoch). Keeps at most one cached filter
        per worker."""
        bf = _PROBE_CACHE.get(token)
        if bf is None:
            _PROBE_CACHE.clear()
            bf = cls.from_state(state)
            _PROBE_CACHE[token] = bf
        return bf


_PROBE_CACHE: dict[str, "BloomFilter"] = {}


def _bucket_of(hex_hashes: pd.Series, n_buckets: int) -> np.ndarray:
    """Bucket routing key: top 64 bits of the sha256 digest mod n_buckets —
    the same slice BloomFilter uses for h1, so routing needs no extra
    hashing and aligns with pmod-style frontier hash-bucketing."""
    h1 = np.array([int(h[:16], 16) for h in hex_hashes], dtype=np.uint64)
    return (h1 % np.uint64(n_buckets)).astype(np.int64)


class PartitionedBloom:
    """The 10^10-scale seen-filter layout (SURVEY §7): one BloomFilter per
    hash-bucket instead of a single ~12 GB monolith. On a cluster each
    executor holds/probes only the buckets co-located with its frontier
    partitions; locally the dict of slices behaves exactly like one big
    filter with k-probe semantics per slice."""

    def __init__(self, filters: dict[int, BloomFilter], n_buckets: int):
        self.filters = filters
        self.n_buckets = n_buckets

    @classmethod
    def sized_for(
        cls, n_items: int, n_buckets: int, bits_per_key: int = 12
    ) -> "PartitionedBloom":
        per = max(1024, n_items // max(n_buckets, 1))
        return cls(
            {b: BloomFilter.sized_for(per, bits_per_key) for b in range(n_buckets)},
            n_buckets,
        )

    def add_many(self, hex_hashes) -> None:
        s = pd.Series(list(hex_hashes), dtype=object)
        if s.empty:
            return
        buckets = _bucket_of(s, self.n_buckets)
        for b in np.unique(buckets):
            self.filters[int(b)].add_many(s[buckets == b])

    def might_contain_series(self, hex_hashes: pd.Series) -> pd.Series:
        if hex_hashes.empty:
            return pd.Series([], dtype=bool)
        buckets = _bucket_of(hex_hashes, self.n_buckets)
        out = np.zeros(len(hex_hashes), dtype=bool)
        for b in np.unique(buckets):
            mask = buckets == b
            out[mask] = self.filters[int(b)].might_contain_series(
                hex_hashes[mask]
            ).to_numpy()
        return pd.Series(out, index=hex_hashes.index)

    def merge_inplace(self, other: "PartitionedBloom") -> None:
        assert other.n_buckets == self.n_buckets
        for b, f in other.filters.items():
            self.filters[b].merge_inplace(f)

    @classmethod
    def build_partitioned(
        cls,
        df,
        column: str,
        n_buckets: int,
        n_items_hint: int,
        bits_per_key: int = 12,
    ) -> "PartitionedBloom":
        """Distributed build: per-partition (bucket -> bitmap) dicts,
        OR-reduced pairwise — each task only materializes slices for the
        buckets it actually saw."""
        proto = cls.sized_for(n_items_hint, n_buckets, bits_per_key)
        shapes = {b: (f.n_bits, f.k) for b, f in proto.filters.items()}

        def build_part(rows):
            local: dict[int, BloomFilter] = {}
            s = pd.Series([r[0] for r in rows], dtype=object)
            if s.empty:
                yield {}
                return
            buckets = _bucket_of(s, n_buckets)
            for b in np.unique(buckets):
                n_bits, k = shapes[int(b)]
                bf = BloomFilter(n_bits, k)
                bf.add_many(s[buckets == b])
                local[int(b)] = bf
            yield {b: f.bits for b, f in local.items()}

        def merge(a: dict, b: dict) -> dict:
            for key, bits in b.items():
                if key in a:
                    a[key] = np.bitwise_or(a[key], bits)
                else:
                    a[key] = bits
            return a

        merged = df.select(column).rdd.mapPartitions(build_part).treeReduce(merge)
        out = cls.sized_for(n_items_hint, n_buckets, bits_per_key)
        for b, bits in merged.items():
            out.filters[b].bits = bits.copy()
        return out

    def to_state(self) -> tuple[int, dict[int, tuple[int, int, bytes]]]:
        return (self.n_buckets, {b: f.to_state() for b, f in self.filters.items()})

    @classmethod
    def from_state(cls, state) -> "PartitionedBloom":
        n_buckets, filt = state
        return cls(
            {b: BloomFilter.from_state(s) for b, s in filt.items()}, n_buckets
        )
