"""Seed corpus + integer training spec for the character-trigram
language classifier (operators/textstats.langid_ngram).

The classifier is a hashed-feature linear model: normalize text to
``' ' + regexp_replace(lower(text), '[^a-z]+', ' ') + ' '``, slide a
3-char window, hash each trigram into ``N_BUCKETS`` integer buckets with
a base-31 polynomial over the code points, and score each language as
the sum of per-bucket integer weights. Weights are *derived, not
stored*: each engine (Spark / DuckDB / this module) recomputes them from
the SEED_CORPUS below with integer-only arithmetic —

    w[L][b] = (cnt_L[b] * SCALE) div total_L
            - (cnt_all[b] * SCALE) div total_all

(a centered ppm frequency profile; ``div`` is integer floor division on
non-negative operands) — so the model is bit-identical across engines
with NO floating point anywhere: no ``ln``, no float division, hence
none of the ulp-at-the-floor-boundary risk the LM-score operators
document. Prediction = argmax over languages, ties broken by
lexicographically smallest language code.

The seed corpus is original text written for this repo (not quoted from
any source): ~10 short paragraphs per language, generic
encyclopedic/newsy register. Accented characters normalize to spaces
under ``[^a-z]``, which costs a little signal for es/fr/de/pt but keeps
every engine in pure-ASCII ``ascii()`` territory. A held-out labeled
fixture (tests/test_langid_ngram.py) gates accuracy.
"""

from __future__ import annotations

import re

__all__ = [
    "LANGS",
    "N_BUCKETS",
    "SCALE",
    "SEED_CORPUS",
    "bucket_of",
    "normalize",
    "trigrams",
    "train_weights",
]

LANGS = ("de", "en", "es", "fr", "it", "pt")
N_BUCKETS = 4096
SCALE = 1_000_000

SEED_CORPUS: dict[str, tuple[str, ...]] = {
    "en": (
        "The committee published its annual report on Tuesday, noting that"
        " the number of registered participants had grown for the third"
        " consecutive year and that funding remained stable.",
        "Researchers at the university developed a new method for measuring"
        " rainfall over mountainous terrain, which they described in a"
        " paper released last week.",
        "The city council voted to extend the library's opening hours after"
        " residents argued that students needed a quiet place to work in"
        " the evenings.",
        "Historians generally agree that the trade routes through the"
        " region shaped its architecture, its cooking, and even the words"
        " people use for everyday tools.",
        "She walked along the harbour before sunrise, watching the fishing"
        " boats return with their catch while the gulls circled overhead"
        " waiting for scraps.",
        "The company announced that it would open two new factories next"
        " year, creating several hundred jobs and strengthening the local"
        " economy considerably.",
        "According to the weather service, a cold front will move across"
        " the northern plains tonight, bringing snow showers and much"
        " lower temperatures by morning.",
        "The novel tells the story of a young teacher who moves to a small"
        " village and slowly earns the trust of the families who have"
        " lived there for generations.",
        "Engineers tested the bridge under heavy load conditions and"
        " confirmed that the new supports could carry twice the traffic of"
        " the old structure.",
        "Most visitors come to the island in summer, but those who arrive"
        " in winter find empty beaches, quiet villages, and a light that"
        " photographers love.",
    ),
    "de": (
        "Der Ausschuss hat am Dienstag seinen Jahresbericht vorgelegt und"
        " darauf hingewiesen, dass die Zahl der angemeldeten Teilnehmer im"
        " dritten Jahr in Folge gestiegen ist.",
        "Forscher der Universität haben ein neues Verfahren zur Messung"
        " des Niederschlags im Gebirge entwickelt und ihre Ergebnisse"
        " vergangene Woche veröffentlicht.",
        "Der Stadtrat beschloss, die Öffnungszeiten der Bücherei zu"
        " verlängern, nachdem Anwohner erklärt hatten, dass Studenten"
        " abends einen ruhigen Arbeitsplatz brauchen.",
        "Historiker sind sich weitgehend einig, dass die Handelswege durch"
        " die Region ihre Architektur, ihre Küche und sogar die Wörter des"
        " Alltags geprägt haben.",
        "Sie ging vor Sonnenaufgang am Hafen entlang und beobachtete, wie"
        " die Fischerboote mit ihrem Fang zurückkehrten, während die Möwen"
        " über dem Wasser kreisten.",
        "Das Unternehmen kündigte an, im kommenden Jahr zwei neue Werke zu"
        " eröffnen und damit mehrere hundert Arbeitsplätze in der Gegend"
        " zu schaffen.",
        "Nach Angaben des Wetterdienstes zieht heute Nacht eine Kaltfront"
        " über das Land und bringt Schneeschauer sowie deutlich niedrigere"
        " Temperaturen am Morgen.",
        "Der Roman erzählt die Geschichte einer jungen Lehrerin, die in"
        " ein kleines Dorf zieht und langsam das Vertrauen der Familien"
        " gewinnt, die dort seit Generationen leben.",
        "Die Ingenieure prüften die Brücke unter hoher Belastung und"
        " bestätigten, dass die neuen Träger doppelt so viel Verkehr"
        " tragen können wie die alte Konstruktion.",
        "Die meisten Besucher kommen im Sommer auf die Insel, doch wer im"
        " Winter anreist, findet leere Strände, stille Dörfer und ein"
        " Licht, das Fotografen begeistert.",
    ),
    "es": (
        "El comité publicó el martes su informe anual y señaló que el"
        " número de participantes inscritos había crecido por tercer año"
        " consecutivo y que la financiación seguía siendo estable.",
        "Investigadores de la universidad desarrollaron un nuevo método"
        " para medir la lluvia en zonas de montaña y describieron sus"
        " resultados en un artículo publicado la semana pasada.",
        "El ayuntamiento votó a favor de ampliar el horario de la"
        " biblioteca después de que los vecinos explicaran que los"
        " estudiantes necesitaban un lugar tranquilo para trabajar.",
        "Los historiadores coinciden en que las rutas comerciales que"
        " atravesaban la región moldearon su arquitectura, su cocina e"
        " incluso las palabras que la gente usa cada día.",
        "Ella caminaba por el puerto antes del amanecer, mirando cómo los"
        " barcos de pesca regresaban con su captura mientras las gaviotas"
        " daban vueltas sobre el agua.",
        "La empresa anunció que abrirá dos fábricas nuevas el próximo año,"
        " lo que creará varios cientos de puestos de trabajo y fortalecerá"
        " la economía de la comarca.",
        "Según el servicio meteorológico, un frente frío cruzará esta"
        " noche el norte del país y traerá chubascos de nieve y"
        " temperaturas mucho más bajas por la mañana.",
        "La novela cuenta la historia de una maestra joven que se muda a"
        " un pueblo pequeño y poco a poco se gana la confianza de las"
        " familias que viven allí desde hace generaciones.",
        "Los ingenieros probaron el puente con cargas muy pesadas y"
        " confirmaron que los nuevos soportes pueden aguantar el doble del"
        " tráfico que la estructura antigua.",
        "La mayoría de los visitantes llega a la isla en verano, pero"
        " quienes vienen en invierno encuentran playas vacías, pueblos"
        " tranquilos y una luz que encanta a los fotógrafos.",
    ),
    "fr": (
        "Le comité a publié mardi son rapport annuel en soulignant que le"
        " nombre de participants inscrits avait augmenté pour la troisième"
        " année consécutive et que le financement restait stable.",
        "Des chercheurs de l'université ont mis au point une nouvelle"
        " méthode pour mesurer les précipitations en montagne et ont"
        " décrit leurs résultats dans un article paru la semaine dernière.",
        "Le conseil municipal a voté l'extension des horaires de la"
        " bibliothèque après que des habitants ont expliqué que les"
        " étudiants avaient besoin d'un endroit calme pour travailler le"
        " soir.",
        "Les historiens s'accordent à dire que les routes commerciales qui"
        " traversaient la région ont façonné son architecture, sa cuisine"
        " et même les mots que les gens emploient chaque jour.",
        "Elle marchait le long du port avant le lever du soleil, regardant"
        " les bateaux de pêche rentrer avec leur prise tandis que les"
        " mouettes tournaient au-dessus de l'eau.",
        "L'entreprise a annoncé qu'elle ouvrirait deux nouvelles usines"
        " l'année prochaine, ce qui créera plusieurs centaines d'emplois"
        " et renforcera l'économie de la vallée.",
        "Selon le service météorologique, un front froid traversera le"
        " nord du pays cette nuit, apportant des averses de neige et des"
        " températures nettement plus basses au matin.",
        "Le roman raconte l'histoire d'une jeune institutrice qui"
        " s'installe dans un petit village et gagne peu à peu la confiance"
        " des familles qui y vivent depuis des générations.",
        "Les ingénieurs ont testé le pont sous de fortes charges et ont"
        " confirmé que les nouveaux appuis peuvent supporter deux fois"
        " plus de trafic que l'ancienne structure.",
        "La plupart des visiteurs arrivent sur l'île en été, mais ceux qui"
        " viennent en hiver trouvent des plages désertes, des villages"
        " silencieux et une lumière que les photographes adorent.",
    ),
    "it": (
        "Il comitato ha pubblicato martedì la sua relazione annuale,"
        " osservando che il numero dei partecipanti iscritti era cresciuto"
        " per il terzo anno consecutivo e che i finanziamenti restavano"
        " stabili.",
        "I ricercatori dell'università hanno sviluppato un nuovo metodo"
        " per misurare le precipitazioni in montagna e hanno descritto i"
        " risultati in un articolo uscito la settimana scorsa.",
        "Il consiglio comunale ha votato per estendere l'orario della"
        " biblioteca dopo che i residenti avevano spiegato che gli"
        " studenti avevano bisogno di un posto tranquillo per studiare la"
        " sera.",
        "Gli storici concordano sul fatto che le vie commerciali che"
        " attraversavano la regione hanno plasmato la sua architettura, la"
        " sua cucina e perfino le parole che la gente usa ogni giorno.",
        "Camminava lungo il porto prima dell'alba, guardando i pescherecci"
        " tornare con il pescato mentre i gabbiani giravano sopra l'acqua"
        " in attesa degli scarti.",
        "L'azienda ha annunciato che aprirà due nuovi stabilimenti l'anno"
        " prossimo, creando diverse centinaia di posti di lavoro e"
        " rafforzando l'economia della zona.",
        "Secondo il servizio meteorologico, un fronte freddo attraverserà"
        " stanotte il nord del paese portando rovesci di neve e"
        " temperature molto più basse al mattino.",
        "Il romanzo racconta la storia di una giovane maestra che si"
        " trasferisce in un piccolo paese e conquista a poco a poco la"
        " fiducia delle famiglie che vi abitano da generazioni.",
        "Gli ingegneri hanno collaudato il ponte sotto carichi molto"
        " pesanti e hanno confermato che i nuovi sostegni possono reggere"
        " il doppio del traffico della vecchia struttura.",
        "La maggior parte dei visitatori arriva sull'isola d'estate, ma"
        " chi viene d'inverno trova spiagge vuote, paesi silenziosi e una"
        " luce che i fotografi amano.",
    ),
    "pt": (
        "O comitê publicou na terça-feira o seu relatório anual, observando"
        " que o número de participantes inscritos tinha crescido pelo"
        " terceiro ano consecutivo e que o financiamento permanecia"
        " estável.",
        "Pesquisadores da universidade desenvolveram um novo método para"
        " medir a chuva em regiões de montanha e descreveram os resultados"
        " em um artigo divulgado na semana passada.",
        "A câmara municipal votou pela ampliação do horário da biblioteca"
        " depois que os moradores explicaram que os estudantes precisavam"
        " de um lugar sossegado para estudar à noite.",
        "Os historiadores concordam que as rotas comerciais que cruzavam a"
        " região moldaram a sua arquitetura, a sua cozinha e até as"
        " palavras que as pessoas usam todos os dias.",
        "Ela caminhava pelo porto antes do amanhecer, observando os barcos"
        " de pesca voltarem com a sua carga enquanto as gaivotas davam"
        " voltas sobre a água.",
        "A empresa anunciou que vai abrir duas fábricas novas no próximo"
        " ano, criando várias centenas de empregos e fortalecendo a"
        " economia da região.",
        "Segundo o serviço de meteorologia, uma frente fria vai atravessar"
        " o norte do país esta noite, trazendo pancadas de neve e"
        " temperaturas bem mais baixas pela manhã.",
        "O romance conta a história de uma professora jovem que se muda"
        " para uma aldeia pequena e aos poucos conquista a confiança das"
        " famílias que vivem ali há gerações.",
        "Os engenheiros testaram a ponte sob cargas muito pesadas e"
        " confirmaram que os novos apoios aguentam o dobro do tráfego da"
        " estrutura antiga.",
        "A maior parte dos visitantes chega à ilha no verão, mas quem vem"
        " no inverno encontra praias vazias, aldeias tranquilas e uma luz"
        " que os fotógrafos adoram.",
    ),
}

_NON_AZ = re.compile(r"[^a-z]+")


def normalize(text: str) -> str:
    """The exact normalization every engine applies:
    ``' ' + regexp_replace(lower(text), '[^a-z]+', ' ') + ' '``."""
    return " " + _NON_AZ.sub(" ", text.lower()) + " "


def bucket_of(g: str) -> int:
    """Base-31 polynomial over the three code points, mod N_BUCKETS —
    ``(ascii(c1)*961 + ascii(c2)*31 + ascii(c3)) % 4096`` in SQL."""
    return (ord(g[0]) * 961 + ord(g[1]) * 31 + ord(g[2])) % N_BUCKETS


def trigrams(text: str) -> list[str]:
    n = normalize(text)
    return [n[i : i + 3] for i in range(len(n) - 2)]


def train_weights() -> dict[str, dict[int, int]]:
    """Integer weights from the seed corpus (see module docstring).
    Returns {lang: {bucket: weight}} with zero-weight buckets omitted."""
    per_lang: dict[str, dict[int, int]] = {}
    all_cnt: dict[int, int] = {}
    totals: dict[str, int] = {}
    for lang in LANGS:
        cnt: dict[int, int] = {}
        for para in SEED_CORPUS[lang]:
            for g in trigrams(para):
                b = bucket_of(g)
                cnt[b] = cnt.get(b, 0) + 1
                all_cnt[b] = all_cnt.get(b, 0) + 1
        per_lang[lang] = cnt
        totals[lang] = sum(cnt.values())
    total_all = sum(totals.values())
    weights: dict[str, dict[int, int]] = {}
    for lang in LANGS:
        t = totals[lang]
        w: dict[int, int] = {}
        for b, c_all in all_cnt.items():
            v = (per_lang[lang].get(b, 0) * SCALE) // t - (
                c_all * SCALE
            ) // total_all
            if v:
                w[b] = v
        weights[lang] = w
    return weights


def classify(text: str, weights: dict[str, dict[int, int]] | None = None
             ) -> tuple[str, int, int]:
    """Pure-Python twin of the Spark/SQL plan (used by tests as a third
    engine): returns (lang, score, n_grams); ties break on the
    lexicographically smallest language code."""
    w = weights if weights is not None else train_weights()
    gs = [bucket_of(g) for g in trigrams(text)]
    best_lang, best_score = "", 0
    for lang in LANGS:  # LANGS is sorted; first max wins = smallest code
        lw = w[lang]
        s = sum(lw.get(b, 0) for b in gs)
        if not best_lang or s > best_score:
            best_lang, best_score = lang, s
    return best_lang, best_score, len(gs)
