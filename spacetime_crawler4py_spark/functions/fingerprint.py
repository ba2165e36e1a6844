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


_MERSENNE_61 = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h'(x) = (a*x + b) mod p."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state % (_MERSENNE_61 - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % _MERSENNE_61
        params.append((a, b))
    return params


_MINHASH_CACHE: dict[tuple[int, int], list[tuple[int, int]]] = {}


def minhash_signature(
    tokens: list[str], num_perm: int = 64, n_gram: int = N_GRAM, seed: int = 42
) -> list[int]:
    """MinHash signature over shingle hashes. Empty docs get all-zero
    signatures (so two empty docs estimate similarity 1.0, mirroring the
    reference's both-empty Jaccard convention)."""
    key = (num_perm, seed)
    if key not in _MINHASH_CACHE:
        _MINHASH_CACHE[key] = _minhash_params(num_perm, seed)
    params = _MINHASH_CACHE[key]
    hashes = _shingle_hashes_unsampled(tokens, n_gram)
    if not hashes:
        return [0] * num_perm
    sig = []
    for a, b in params:
        sig.append(min((a * h + b) % _MERSENNE_61 for h in hashes))
    return sig


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
    """64-bit SimHash over unigram tokens (charikar sketch)."""
    if not tokens:
        return 0
    acc = [0] * 64
    for t in tokens:
        h = _hash64(t)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
