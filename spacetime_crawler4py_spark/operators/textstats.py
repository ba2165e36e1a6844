"""Text-analysis operators over a document table — all JVM-native
(whole-stage-codegen) column expressions; no Python in the hot path.

These extend the reference's analytics tokenizer pipeline
(analyze_crawl.py:82-87,237-244) into the operators a training-data
pipeline needs: token counting, quality scoring, language ID, document
fingerprinting. Every expression here has an exact ANSI-SQL twin in
__spark_entry__.oracle_sql (the DuckDB correctness oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.tokenize import NOISE_WORDS, STOPWORDS

__all__ = [
    "report_tokens_col",
    "word_count_col",
    "stopword_count_col",
    "quality_cols",
    "langid_col",
    "fingerprint_col",
    "LANG_MARKERS",
]


def report_tokens_col(text: Column) -> Column:
    """The reference analytics tokenizer as a native expression:
    lowercase → possessive strip → [a-z]{2,} extraction
    (analyze_crawl.py:82-87)."""
    lowered = F.lower(text)
    no_poss = F.regexp_replace(lowered, r"\b([a-z]+)['’]s\b", r"$1")
    return F.regexp_extract_all(no_poss, F.lit(r"[a-z]{2,}"), 0)


def word_count_col(text: Column) -> Column:
    return F.size(report_tokens_col(text))


def stopword_count_col(tokens: Column) -> Column:
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))


def quality_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio quality features plus a
    boolean gate (thin-page rule generalizing analyze_crawl.py:227-229)."""
    tokens = report_tokens_col(text)
    n_tokens = F.size(tokens)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?'\"()-]", ""))
    n_stop = stopword_count_col(tokens)
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop / F.greatest(n_tokens, F.lit(1)), 6
        ),
        "quality_ok": (n_tokens >= 20)
        & (n_punct / F.greatest(n_chars, F.lit(1)) < 0.2),
    }


# tiny per-language marker sets for the n-gram-free heuristic language ID;
# scoring = marker-token hit count, argmax with deterministic tie-break
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "es"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "et"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh": (),  # no latin markers; zh wins only when nothing scores
}


def langid_col(text: Column) -> Column:
    tokens = report_tokens_col(text)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        if markers:
            arr = F.array(*[F.lit(m) for m in markers])
            score = F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))
        else:
            score = F.lit(0)
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # argmax by (score, lang-reversed) so ties break on lexicographically
    # *smallest* language code deterministically
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["score"].alias("score"),
                    # invert lang ordering inside the struct comparison:
                    # higher score wins; equal scores -> lexicographically
                    # last lang tag wins, so store negated rank
                    F.lit(-i).alias("rank"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return best["lang"]


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized token stream — stable
    under whitespace/punctuation/case noise (the role of the reference's
    shingle sketch, utils/similarity.py:36-45, as a single exact hash)."""
    return F.md5(F.concat_ws(" ", report_tokens_col(text)))
