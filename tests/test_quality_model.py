"""Accuracy gate + cross-engine differential for the model-based quality
scorer (operators/textstats.quality_model).

The held-out fixture is original text written for this repo and shares
no paragraph with the training seeds (functions/qualityseeds). Gate:
every HIGH paragraph passes and every LOW paragraph fails (12/12 — the
fixture is small enough to demand perfection); the differential asserts
the Spark plan and the pure-Python twin (qualityseeds.score) agree on
every integer score. The DuckDB oracle replays the same model in
scripts/check_oracle.py (quality_model / curation_quality_gate rows).
"""

from __future__ import annotations

from spacetime_crawler4py_spark.functions.qualityseeds import (
    score,
    train_weights,
)
from spacetime_crawler4py_spark.operators.textstats import quality_model

HI_HELD_OUT = [
    "The water cycle describes how moisture moves between ocean,"
    " atmosphere, and land. Evaporation lifts water vapor into the air,"
    " where it condenses into clouds and returns as precipitation that"
    " feeds rivers and groundwater.",
    "Compound interest grows savings because each period's interest is"
    " added to the principal. Over long horizons this produces"
    " exponential growth, which is why starting to save early matters"
    " more than the rate itself.",
    "The printing press spread literacy across Europe by making books"
    " affordable. Within a century, pamphlets and translated texts"
    " reshaped religion, science, and politics in ways scribes could"
    " never have matched.",
    "Enzymes accelerate chemical reactions by lowering activation"
    " energy. Each enzyme binds a specific substrate at its active site,"
    " and temperature or acidity outside a narrow range deforms the"
    " protein and slows the reaction.",
    "A hash table stores key-value pairs by computing an index from each"
    " key. With a good hash function and a sensible load factor,"
    " insertion and lookup complete in constant expected time.",
    "The treaty established a framework for resolving border disputes"
    " through arbitration. Both governments agreed to submit claims to a"
    " neutral panel, whose rulings were binding and enforced by trade"
    " provisions.",
]

LO_HELD_OUT = [
    "Mega sale ends tonight! Everything must go! Up to eighty percent"
    " off! Free gift with every purchase! Hurry, stocks running out"
    " fast! Shop now! Best prices of the year, guaranteed!",
    "Subscribe now and get instant access! Exclusive members only"
    " content! Cancel anytime! Join thousands of happy subscribers"
    " today! Click the button below! Special discount for new members!",
    "Top 10 celebrities you forgot existed! Number 4 is unbelievable!"
    " See their shocking transformations! You will not believe number 7!"
    " Click next to continue! Share before reading!",
    "Get rich quick with crypto trading bots! Guaranteed profits daily!"
    " No skills required! Automated passive income! Sign up now, limited"
    " spots! Withdraw anytime! Join the winners today!",
    "Accept cookies to continue. Manage your preferences. Our partners"
    " collect data for personalised advertising. Click accept to proceed"
    " to the site. Privacy settings. Cookie policy. Accept all.",
    "Congratulations! You are the lucky visitor number one million!"
    " Claim your free tablet now! Enter your phone number to verify!"
    " Offer valid today only! Click here immediately!",
]


def test_heldout_separation_python():
    w = train_weights()
    for t in HI_HELD_OUT:
        s, _, p = score(t, w)
        assert p and s > 0, f"HIGH scored {s}: {t[:50]}"
    for t in LO_HELD_OUT:
        s, _, p = score(t, w)
        assert not p and s < 0, f"LOW scored {s}: {t[:50]}"


def test_differential_and_separation_spark(spark):
    rows = [(i, t) for i, t in enumerate(HI_HELD_OUT + LO_HELD_OUT)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score_sum"], r["n_tokens"], r["quality_pass"])
        for r in quality_model(df, "doc_id", "text").collect()
    }
    w = train_weights()
    for i, t in rows:
        assert got[i] == score(t, w), f"spark/python diverge on #{i}"
    n_hi = len(HI_HELD_OUT)
    assert all(got[i][2] for i in range(n_hi))
    assert not any(got[i][2] for i in range(n_hi, len(rows)))


def test_neutral_vocabulary_fails_open(spark):
    # a doc whose every token hashes to untrained buckets scores 0 and
    # PASSES: the model only drops docs it recognizes as low-register
    df = spark.createDataFrame(
        [(0, "qzqzv xvqzq zvxqv qqzx")], "doc_id long, text string"
    )
    [row] = quality_model(df, "doc_id", "text").collect()
    py = score("qzqzv xvqzq zvxqv qqzx", train_weights())
    assert (row["score_sum"], row["n_tokens"], row["quality_pass"]) == py
    # and if those buckets happen to be trained, the differential above
    # still pins Spark to the twin; the fail-open claim needs score == 0
    if row["score_sum"] == 0:
        assert row["quality_pass"]
