"""Accuracy gate + cross-engine differential for the character-trigram
language classifier (operators/textstats.langid_ngram).

The held-out fixture below is original text written for this repo and
shares no sentence with the training seed corpus
(functions/langseeds.SEED_CORPUS). The gate is accuracy >= 0.9 over the
fixture (30 sentences, 5 per language); the differential asserts the
Spark plan and the pure-Python twin (langseeds.classify) agree on every
prediction AND every integer score — three engines total, since the
DuckDB oracle replays the same model in scripts/check_oracle.py.
"""

from __future__ import annotations

import pytest

from spacetime_crawler4py_spark.functions.langseeds import (
    LANGS,
    classify,
    train_weights,
)
from spacetime_crawler4py_spark.operators.textstats import langid_ngram

HELD_OUT: list[tuple[str, str]] = [
    ("en", "The museum will remain closed until the end of the month for"
           " repairs to the roof."),
    ("en", "Scientists observed a sharp decline in the bird population"
           " near the coast last autumn."),
    ("en", "He finished his coffee and walked slowly toward the railway"
           " station in the rain."),
    ("en", "The government plans to invest heavily in renewable energy"
           " projects over the next decade."),
    ("en", "Children played in the park while their parents talked"
           " quietly on the benches."),
    ("de", "Das Museum bleibt wegen Bauarbeiten bis Ende des Monats"
           " geschlossen."),
    ("de", "Wissenschaftler beobachteten einen starken Rückgang der"
           " Vogelbestände an der Küste."),
    ("de", "Er trank seinen Kaffee aus und ging langsam zum Bahnhof im"
           " Regen."),
    ("de", "Die Regierung plant hohe Investitionen in erneuerbare"
           " Energien im kommenden Jahrzehnt."),
    ("de", "Die Kinder spielten im Park, während ihre Eltern auf den"
           " Bänken redeten."),
    ("es", "El museo permanecerá cerrado hasta final de mes por obras en"
           " el tejado."),
    ("es", "Los científicos observaron una fuerte caída de la población"
           " de aves en la costa."),
    ("es", "Terminó su café y caminó despacio hacia la estación de tren"
           " bajo la lluvia."),
    ("es", "El gobierno planea invertir mucho en proyectos de energía"
           " renovable durante la próxima década."),
    ("es", "Los niños jugaban en el parque mientras sus padres"
           " conversaban en los bancos."),
    ("fr", "Le musée restera fermé jusqu'à la fin du mois pour des"
           " travaux de toiture."),
    ("fr", "Les scientifiques ont observé une forte baisse de la"
           " population d'oiseaux près de la côte."),
    ("fr", "Il a fini son café et a marché lentement vers la gare sous"
           " la pluie."),
    ("fr", "Le gouvernement prévoit d'investir massivement dans les"
           " énergies renouvelables pendant la prochaine décennie."),
    ("fr", "Les enfants jouaient dans le parc pendant que leurs parents"
           " discutaient sur les bancs."),
    ("it", "Il museo resterà chiuso fino alla fine del mese per lavori"
           " al tetto."),
    ("it", "Gli scienziati hanno osservato un forte calo della"
           " popolazione di uccelli lungo la costa."),
    ("it", "Finì il suo caffè e si avviò lentamente verso la stazione"
           " sotto la pioggia."),
    ("it", "Il governo intende investire molto nei progetti di energia"
           " rinnovabile nel prossimo decennio."),
    ("it", "I bambini giocavano nel parco mentre i genitori"
           " chiacchieravano sulle panchine."),
    ("pt", "O museu ficará fechado até o fim do mês para obras no"
           " telhado."),
    ("pt", "Os cientistas observaram uma queda acentuada na população de"
           " aves perto da costa."),
    ("pt", "Ele terminou o café e caminhou devagar até a estação de trem"
           " debaixo de chuva."),
    ("pt", "O governo pretende investir muito em projetos de energia"
           " renovável na próxima década."),
    ("pt", "As crianças brincavam no parque enquanto os pais conversavam"
           " nos bancos."),
]


def test_heldout_accuracy_python():
    """Pure-Python twin first: fast signal if the model itself regresses."""
    w = train_weights()
    hits = sum(
        1 for lang, s in HELD_OUT if classify(s, w)[0] == lang
    )
    assert hits / len(HELD_OUT) >= 0.9, f"only {hits}/{len(HELD_OUT)}"


def test_heldout_accuracy_and_differential_spark(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(HELD_OUT)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["lang"], r["score_ppm"], r["n_grams"])
        for r in langid_ngram(df, "doc_id", "text").collect()
    }
    assert len(got) == len(HELD_OUT)
    w = train_weights()
    hits = 0
    for i, (lang, s) in enumerate(HELD_OUT):
        p_lang, p_score, p_ngrams = classify(s, w)
        assert got[i] == (p_lang, p_score, p_ngrams), (
            f"spark/python diverge on #{i}: {got[i]} vs "
            f"{(p_lang, p_score, p_ngrams)}"
        )
        hits += got[i][0] == lang
    assert hits / len(HELD_OUT) >= 0.9, f"only {hits}/{len(HELD_OUT)}"


def test_no_trigram_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "!!"), (3, "hello world")],
        "doc_id long, text string",
    )
    rows = langid_ngram(df, "doc_id", "text").collect()
    # "" -> "  " (2 chars) no trigram; "   "/"!!" -> "   " has ONE trigram
    # (three spaces) — still a row; only the truly sub-3-char normals drop
    ids = {r["doc_id"] for r in rows}
    assert 0 not in ids
    assert 3 in ids


def test_tie_breaks_to_smallest_code(spark):
    # a bucket no training trigram touches scores 0 for every language ->
    # 6-way tie -> 'de' (alphabetically first)
    w = train_weights()
    assert LANGS == tuple(sorted(LANGS))
    df = spark.createDataFrame([(0, "zzzz")], "doc_id long, text string")
    [row] = langid_ngram(df, "doc_id", "text").collect()
    py = classify("zzzz", w)
    assert row["lang"] == py[0]
    assert row["score_ppm"] == py[1]
