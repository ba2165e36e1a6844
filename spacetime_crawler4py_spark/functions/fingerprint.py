"""Shingle fingerprints, Jaccard, MinHash and SimHash sketches.

``shingle_fingerprints``/``jaccard`` reproduce the reference near-dup
sketch bit-for-bit (reference utils/similarity.py:23-54): 3-word shingles,
blake2b-64 hash, keep h where h % 8 == 0, Jaccard with the both-empty=1.0
convention. They are used in the engine's *parity* near-dup mode.

``minhash_signature``/``simhash64`` are the scale path (no reference
counterpart — the reference's O(N²) pairwise scan, utils/similarity.py:76-85,
cannot run at 10^10 docs): banded MinHash turns near-dup detection into an
equi-join on (band, band_hash); SimHash gives a 64-bit hamming sketch.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "N_GRAM",
    "SAMPLE_MOD",
    "NEAR_DUP_TAU",
    "shingle_fingerprints",
    "jaccard",
    "checksum_sha1",
    "minhash_signature",
    "minhash_bands",
    "simhash64",
    "hamming64",
]

# Reference tunables (utils/similarity.py:7-9)
N_GRAM = 3
SAMPLE_MOD = 8
NEAR_DUP_TAU = 0.90


def _hash64(text: str) -> int:
    """64-bit blake2b of a string, big-endian unsigned
    (reference utils/similarity.py:30-33)."""
    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(digest, "big", signed=False)


def shingle_fingerprints(
    tokens: list[str], n_gram: int = N_GRAM, sample_mod: int = SAMPLE_MOD
) -> set[int]:
    """Subsampled shingle sketch over a pre-tokenized word list
    (reference utils/similarity.py:36-45; tokenization is the caller's job,
    see tokenize.similarity_tokens)."""
    out: set[int] = set()
    for i in range(len(tokens) - n_gram + 1):
        h = _hash64(" ".join(tokens[i : i + n_gram]))
        if sample_mod <= 1 or h % sample_mod == 0:
            out.add(h)
    return out


def jaccard(a: set[int], b: set[int]) -> float:
    """Jaccard with the reference's empty-set conventions
    (utils/similarity.py:47-54): both empty -> 1.0, one empty -> 0.0."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def checksum_sha1(payload: bytes) -> str:
    """Exact-dup checksum (reference utils/similarity.py:57-58)."""
    return hashlib.sha1(payload).hexdigest()


# ---------------------------------------------------------------------------
# scale-path sketches (new capability; no reference counterpart)
# ---------------------------------------------------------------------------

def _shingle_hashes_unsampled(tokens: list[str], n_gram: int = N_GRAM) -> list[int]:
    return [
        _hash64(" ".join(tokens[i : i + n_gram]))
        for i in range(len(tokens) - n_gram + 1)
    ]


def _minhash_seeds(num_perm: int, seed: int = 42) -> np.ndarray:
    """Deterministic per-permutation 64-bit mix constants (LCG stream)."""
    out = np.empty(num_perm, dtype=np.uint64)
    state = seed
    for i in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out[i] = state | 1
    return out


_MINHASH_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a full-avalanche 64-bit bijection,
    so min over {mix(h ^ seed_i)} is an independent MinHash per seed."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def minhash_signature(
    tokens: list[str], num_perm: int = 64, n_gram: int = N_GRAM, seed: int = 42
) -> list[int]:
    """MinHash signature over shingle hashes: sig[i] = min over shingles of
    splitmix64(h ^ seed_i), vectorized as an (n_shingles, num_perm) uint64
    grid. Empty docs get all-zero signatures (so two empty docs estimate
    similarity 1.0, mirroring the reference's both-empty Jaccard
    convention). Values are reported masked to 63 bits so they survive
    signed-long (Spark LongType) round-trips unchanged."""
    key = (num_perm, seed)
    if key not in _MINHASH_CACHE:
        _MINHASH_CACHE[key] = _minhash_seeds(num_perm, seed)
    seeds = _MINHASH_CACHE[key]
    hashes = _shingle_hashes_unsampled(tokens, n_gram)
    if not hashes:
        return [0] * num_perm
    h = np.asarray(hashes, dtype=np.uint64)
    mixed = _splitmix64(h[:, None] ^ seeds[None, :])  # (n_sh, num_perm)
    sig = mixed.min(axis=0) >> np.uint64(1)
    return [int(v) for v in sig]


def minhash_bands(signature: list[int], bands: int = 16) -> list[int]:
    """Collapse a signature into per-band 64-bit bucket hashes; candidate
    pairs share (band_index, bucket) — an equi-join key."""
    rows = len(signature) // bands
    out = []
    for b in range(bands):
        chunk = signature[b * rows : (b + 1) * rows]
        digest = hashlib.blake2b(
            struct.pack(f"<{len(chunk)}Q", *[c & ((1 << 64) - 1) for c in chunk]),
            digest_size=8,
        ).digest()
        out.append(int.from_bytes(digest, "big") & ((1 << 63) - 1))
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over unigram tokens (charikar sketch). Bit counting is
    vectorized: unpack each token hash to a (n_tokens, 64) bit grid, column
    sums give the per-bit vote."""
    if not tokens:
        return 0
    h = np.asarray([_hash64(t) for t in tokens], dtype=np.uint64)
    return _simhash_pack(h, len(tokens))


# Scheme tag for persisted sketches (see ADVICE: silently mixing hash
# schemes across a resume quietly misses near-dups). SnapshotStore stamps
# this into the manifest of any table carrying minhash/simhash columns and
# refuses to append under a different scheme.
SKETCH_SCHEME = "minhash-splitmix64/v2+simhash-md5/v2"


def _simhash_pack(h: np.ndarray, n_tokens: int) -> int:
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - n_tokens  # (+1/-1 tally)
    out = 0
    for bit in np.nonzero(votes > 0)[0]:
        out |= 1 << int(bit)
    return out


def simhash64_md5(tokens: list[str]) -> int | None:
    """SimHash variant whose token hash is the top 64 bits of md5 — chosen
    so an ANSI-SQL oracle (DuckDB has md5, not blake2b) can recompute the
    identical bit grid: bit j of hash(t) = (hex_nibble(16 - j//4) >> (j%4)) & 1
    over ``md5(t)[:16]``. Token multiplicity weights the votes; a tokenless
    doc has no sketch (returns None) rather than an all-zero one, so
    sketch-less docs are excluded from pair generation symmetrically on
    both engines."""
    if not tokens:
        return None
    h = np.asarray(
        [int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         for t in tokens],
        dtype=np.uint64,
    )
    return _simhash_pack(h, len(tokens))


def simhash64_md5_batch(token_lists: list[list[str]]) -> list[int | None]:
    """Batch twin of :func:`simhash64_md5`, bit-identical per doc, with a
    token→hash memo shared across the batch: token frequencies are Zipfian,
    so the md5 count collapses from corpus-size to ~vocabulary-size (the
    Arrow batch is the natural cache scope — bounded memory per task, no
    cross-batch state)."""
    cache: dict[str, int] = {}
    md5 = hashlib.md5
    out: list[int | None] = []
    for tokens in token_lists:
        if not tokens:
            out.append(None)
            continue
        hs = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = int.from_bytes(md5(t.encode("utf-8")).digest()[:8], "big")
                cache[t] = v
            hs[i] = v
        out.append(_simhash_pack(hs, len(tokens)))
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
