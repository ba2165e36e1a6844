"""Differential tests: fingerprints/jaccard vs reference utils/similarity.py."""

from __future__ import annotations

import random

from spacetime_crawler4py_spark.functions import fingerprint, tokenize


def _texts():
    rng = random.Random(7)
    vocab = "alpha beta gamma delta epsilon zeta eta theta IOTA kappa42".split()
    out = [
        "",
        "one",
        "one two",
        "one two three",
        "The quick brown-fox jumps!! over 42 lazy dogs, again and again.",
        "University's policy; students' rights — CAFÉ naïve",
    ]
    for _ in range(60):
        out.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 120))))
    return out


def test_fingerprints_match_reference(reference):
    for text in _texts():
        ours = fingerprint.shingle_fingerprints(tokenize.similarity_tokens(text))
        theirs = reference.similarity.fingerprints_from_text(text)
        assert ours == theirs, text[:60]


def test_jaccard_matches_reference(reference):
    cases = [
        (set(), set()),
        (set(), {1}),
        ({1, 2}, {2, 3}),
        ({1}, {1}),
        ({1, 2, 3, 4}, {3, 4, 5, 6}),
    ]
    for a, b in cases:
        assert fingerprint.jaccard(a, b) == reference.similarity.jaccard(a, b)


def test_checksum_matches_reference(reference):
    for payload in (b"", b"abc", b"<html>x</html>"):
        assert fingerprint.checksum_sha1(payload) == reference.similarity.checksum_bytes(
            payload
        )


def test_report_tokens_match_reference(reference):
    for text in _texts():
        assert tokenize.report_tokens(text) == reference.analyze_crawl.tokenize_words(
            text
        ), text[:60]


def test_similarity_tokens_match_reference(reference):
    for text in _texts():
        assert tokenize.similarity_tokens(text) == list(
            reference.similarity._words(text)
        ), text[:60]


def test_stopwords_noise_match_reference(reference):
    assert tokenize.STOPWORDS == frozenset(reference.analyze_crawl.DEFAULT_STOPWORDS)
    assert tokenize.NOISE_WORDS == frozenset(reference.analyze_crawl.NOISE_WORDS)


def test_minhash_estimates_jaccard():
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(200)]
    a = [rng.choice(vocab) for _ in range(300)]
    b = list(a)
    # mutate 10% of b
    for i in range(0, 300, 10):
        b[i] = rng.choice(vocab)
    sig_a = fingerprint.minhash_signature(a, num_perm=128)
    sig_b = fingerprint.minhash_signature(b, num_perm=128)
    est = sum(x == y for x, y in zip(sig_a, sig_b)) / 128
    sa = set(fingerprint._shingle_hashes_unsampled(a))
    sb = set(fingerprint._shingle_hashes_unsampled(b))
    true = len(sa & sb) / len(sa | sb)
    assert abs(est - true) < 0.15
    # identical docs share every band
    assert fingerprint.minhash_bands(sig_a) == fingerprint.minhash_bands(sig_a)


def test_simhash_close_for_similar_docs():
    a = ["common"] * 100 + ["only-a"]
    b = ["common"] * 100 + ["only-b"]
    c = [f"z{i}" for i in range(100)]
    da = fingerprint.simhash64(a)
    db = fingerprint.simhash64(b)
    dc = fingerprint.simhash64(c)
    assert fingerprint.hamming64(da, db) < fingerprint.hamming64(da, dc)


def test_simhash_md5_batch_equals_per_doc():
    """The vocab-memoized batch path must be bit-identical to the per-doc
    function on every shape: empty, repeated tokens, cross-doc shared
    vocabulary, unicode."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)] + ["déjà", "naïve"]
    docs = [[]] + [
        [rng.choice(vocab) for _ in range(rng.randrange(1, 200))]
        for _ in range(30)
    ]
    got = fingerprint.simhash64_md5_batch(docs)
    want = [fingerprint.simhash64_md5(d) for d in docs]
    assert got == want
    assert got[0] is None
