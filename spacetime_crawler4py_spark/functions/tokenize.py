"""Tokenizers and word-filter sets.

Two tokenizers exist in the reference and both are reproduced exactly:

* ``report_tokens``     — analytics tokenizer: lowercase, possessive-strip,
                          ``[a-z]{2,}``      (reference analyze_crawl.py:82-87, :37)
* ``similarity_tokens`` — near-dup tokenizer: lowercase ``[A-Za-z0-9]+``
                          (reference utils/similarity.py:17-21)

plus the analytics stopword and noise-word sets
(reference analyze_crawl.py:13-33, :40-44).
"""

from __future__ import annotations

import re

__all__ = [
    "report_tokens",
    "similarity_tokens",
    "STOPWORDS",
    "NOISE_WORDS",
]

_WORD_2PLUS = re.compile(r"[a-z]{2,}")          # analyze_crawl.py:37
_POSSESSIVE = re.compile(r"\b([a-z]+)[’']s\b")  # analyze_crawl.py:86
_ALNUM_RUN = re.compile(r"[A-Za-z0-9]+")        # utils/similarity.py:17


def report_tokens(text: str) -> list[str]:
    """Analytics tokenizer (reference analyze_crawl.py:82-87)."""
    s = text.lower()
    s = _POSSESSIVE.sub(r"\1", s)
    return _WORD_2PLUS.findall(s)


def similarity_tokens(text: str) -> list[str]:
    """Near-dup tokenizer (reference utils/similarity.py:19-21)."""
    return _ALNUM_RUN.findall(text.lower())


# Reference analyze_crawl.py:13-33 (DEFAULT_STOPWORDS)
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at
    be because been before being below between both but by
    can cannot could
    did do does doing down during
    each
    few for from further
    had has have having he her here hers herself him himself his how
    i if in into is it its itself
    just
    me more most my myself
    no nor not
    of off on once only or other our ours ourselves out over own
    same she should so some such
    than that the their theirs them themselves then there these they
    this those through to too
    under until up
    very
    was we were what when where which while who whom why with
    you your yours yourself yourselves""".split()
)

# Reference analyze_crawl.py:40-44 (NOISE_WORDS)
NOISE_WORDS = frozenset(
    """html htm pdf jpg jpeg png gif svg css js xml json
    zip rar gz tar bz2 ppt pptx doc docx xls xlsx csv
    php jsp""".split()
)
