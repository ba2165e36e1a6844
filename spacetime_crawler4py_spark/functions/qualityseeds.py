"""Seed corpus + integer training spec for the model-based document
quality scorer (operators/textstats.quality_model) — the DCLM /
FineWeb-Edu-style "educational value" gate, as a fastText-style linear
classifier over hashed token features.

Feature = the token's hashed bucket:

    h(w) = (ascii(w[0])*29791 + ascii(w[1])*961
            + ascii(w[-1])*31 + length(w)) % 8192

(first two chars + last char + length — every term portable SQL:
``substr``/``ascii``/``length``; the reference tokenizer guarantees
``[a-z]{2,}`` tokens so w[0], w[1], w[-1] always exist). Weight per
bucket is the centered ppm frequency difference between the HIGH seed
corpus (encyclopedic/explanatory prose) and the LOW seed corpus
(spam, clickbait, keyword stuffing, nav boilerplate):

    w[b] = (cnt_hi[b] * SCALE) div total_hi
         - (cnt_lo[b] * SCALE) div total_lo

Integer-only arithmetic end-to-end (same discipline as
functions/langseeds.py): no ln, no float division, so Spark, DuckDB and
the pure-Python twin score bit-identically on any engine/partitioning.
A document's score is the SUM of its tokens' weights; the gate is
``score_sum >= 0`` — strictly negative means actively spam-like, while
zero (a document whose vocabulary the model has never seen) passes:
the model fails OPEN on no-opinion, so wiring it into a curation
pipeline can only remove documents it recognizes as low-register.
Accuracy is gated on a held-out labeled fixture
(tests/test_quality_model.py).

Tokenization is exactly the repo's report tokenizer
(textstats.report_tokens_col / the _SQL_TOKENS twin): lowercase ->
possessive strip -> [a-z]{2,} runs — so the scorer can ride the shared
``tokens_exploded`` stream inside curation compositions.

All seed text below is original, written for this repo.
"""

from __future__ import annotations

import re

__all__ = [
    "HI_SEEDS",
    "LO_SEEDS",
    "N_BUCKETS",
    "SCALE",
    "bucket_of_word",
    "tokens_of",
    "train_weights",
    "score",
]

N_BUCKETS = 8192
SCALE = 1_000_000

HI_SEEDS: tuple[str, ...] = (
    "Photosynthesis converts light energy into chemical energy stored in"
    " glucose. Within the chloroplast, light-dependent reactions split"
    " water molecules and release oxygen, while the Calvin cycle fixes"
    " carbon dioxide into sugars that the plant uses for growth.",
    "The industrial revolution transformed manufacturing between 1760 and"
    " 1840. Mechanized textile production, steam power, and improved iron"
    " smelting raised output dramatically, drew workers into cities, and"
    " reshaped family life, transport networks, and international trade.",
    "A binary search algorithm locates a value in a sorted array by"
    " repeatedly halving the search interval. Because each comparison"
    " eliminates half of the remaining candidates, the procedure completes"
    " in logarithmic time, which matters greatly for large datasets.",
    "Plate tectonics explains how the rigid outer shell of the earth is"
    " divided into plates that drift over the mantle. Earthquakes cluster"
    " along plate boundaries, and the collision of continental plates"
    " builds mountain ranges over millions of years.",
    "In economics, opportunity cost measures the value of the best"
    " alternative forgone when a choice is made. Students weighing another"
    " year of study against immediate employment are implicitly comparing"
    " expected lifetime earnings, tuition, and the experience itself.",
    "The immune system distinguishes the body's own cells from foreign"
    " material. Innate defenses respond within hours, while adaptive"
    " immunity develops antibodies tailored to a specific pathogen and"
    " retains memory cells that speed up any later response.",
    "Roman concrete, a mixture of volcanic ash, lime, and seawater, has"
    " endured for two thousand years. Modern analysis shows that mineral"
    " crystals continued to grow within cracks, effectively healing the"
    " material and explaining the durability of ancient harbors.",
    "Probability theory began with questions about games of chance, but"
    " its modern framework rests on measure theory. A random variable is"
    " a function from outcomes to numbers, and its expected value is the"
    " integral of that function with respect to the probability measure.",
    "The novel's unreliable narrator withholds crucial details, forcing"
    " readers to reconstruct events from contradictory testimony. This"
    " technique, refined throughout twentieth century fiction, turns the"
    " act of reading into an exercise in critical judgment.",
    "Vaccination trains the immune system using a harmless fragment or"
    " weakened form of a pathogen. Large trials measure efficacy by"
    " comparing infection rates between vaccinated and placebo groups,"
    " and continued surveillance tracks rare adverse events afterward.",
    "Glaciers form where winter snowfall exceeds summer melt for decades."
    " Compressed snow recrystallizes into dense ice that flows slowly"
    " downhill, carving valleys and depositing moraines that record the"
    " extent of past climates with remarkable precision.",
    "The separation of powers divides government among legislative,"
    " executive, and judicial branches. Each branch checks the others:"
    " legislatures control budgets, executives veto bills, and courts"
    " review statutes against constitutional limits.",
)

LO_SEEDS: tuple[str, ...] = (
    "Click here now to claim your free prize! Limited time offer, act"
    " fast! Winners announced daily, click the link below and enter your"
    " email to win big! Don't miss out, offer ends soon!",
    "Buy cheap watches online, best price guaranteed, discount watches,"
    " luxury watches sale, replica watches free shipping, watches for"
    " men, watches for women, buy now, best deals, shop today!",
    "Home | About Us | Products | Services | Blog | Contact | Privacy"
    " Policy | Terms of Service | Sitemap | Login | Register | Cart |"
    " Checkout | FAQ | Support | Careers | Press",
    "You won't believe what happened next! This one weird trick doctors"
    " don't want you to know! Number 7 will shock you! Click to see the"
    " full list! Share this with everyone you know right now!",
    "Earn money from home fast, no experience needed, work from home"
    " jobs, make cash online today, easy money, guaranteed income, sign"
    " up free, start earning now, unlimited earnings potential!",
    "Follow us on all social networks! Like, share, and subscribe! Hit"
    " the bell icon so you never miss an update! Smash that like button!"
    " Comment below and tag three friends! Link in bio!",
    "Hot singles in your area want to meet you tonight! Create your free"
    " profile now! No credit card required! Thousands of members online"
    " right now! Join free today and start chatting instantly!",
    "Congratulations, you have been selected! Verify your account now to"
    " receive your reward. Your package is waiting. Confirm your details"
    " immediately or your prize will expire. Claim now!",
    "Best casino bonus codes, free spins no deposit, online slots real"
    " money, poker bonus, jackpot winners, play now, instant payout,"
    " biggest bonuses, top rated casinos, bet today, win big!",
    "Cheap flights, cheap hotels, cheap car rental, book now pay later,"
    " lowest price guarantee, compare deals, save up to ninety percent,"
    " exclusive offers, last minute deals, book today!",
    "This site uses cookies to improve your experience. Accept all"
    " cookies. Manage preferences. We and our partners process data to"
    " provide personalised ads and content. Accept. Reject. Learn more.",
    "Lose weight fast with this miracle supplement! Burn fat while you"
    " sleep! No diet, no exercise! Doctors hate this! Order now and get"
    " fifty percent off your first bottle! Results guaranteed!",
)

_POSS = re.compile(r"\b([a-z]+)['’]s\b")
_TOKEN = re.compile(r"[a-z]{2,}")


def tokens_of(text: str) -> list[str]:
    """Pure-Python twin of textstats.report_tokens_col / _SQL_TOKENS."""
    return _TOKEN.findall(_POSS.sub(r"\1", text.lower()))


def bucket_of_word(w: str) -> int:
    return (
        ord(w[0]) * 29791 + ord(w[1]) * 961 + ord(w[-1]) * 31 + len(w)
    ) % N_BUCKETS


def train_weights() -> dict[int, int]:
    """{bucket: integer weight}; zero-weight buckets omitted."""
    hi: dict[int, int] = {}
    lo: dict[int, int] = {}
    for seeds, cnt in ((HI_SEEDS, hi), (LO_SEEDS, lo)):
        for para in seeds:
            for w in tokens_of(para):
                b = bucket_of_word(w)
                cnt[b] = cnt.get(b, 0) + 1
    tot_hi = sum(hi.values())
    tot_lo = sum(lo.values())
    out: dict[int, int] = {}
    for b in set(hi) | set(lo):
        v = (hi.get(b, 0) * SCALE) // tot_hi - (lo.get(b, 0) * SCALE) // tot_lo
        if v:
            out[b] = v
    return out


def score(text: str, weights: dict[int, int] | None = None
          ) -> tuple[int, int, bool]:
    """Pure-Python twin of the Spark/SQL plan: returns
    (score_sum, n_tokens, quality_pass)."""
    w = weights if weights is not None else train_weights()
    toks = tokens_of(text)
    s = sum(w.get(bucket_of_word(t), 0) for t in toks)
    return s, len(toks), s >= 0
