"""Labeled-fixture certification for the text heuristics (VERDICT r3 #6).

lang_id and text_stats.quality pass DuckDB parity (same formula both
sides), but parity alone can't catch silent formula drift — a broken
stopword table or a mis-weighted quality term would still "match the
oracle". This fixture pins the heuristics' *quality*: 54 hand-labeled
documents (12 per supported language, 6 und) with asserted accuracy /
per-language recall floors, plus a high-vs-junk quality-score margin.

The floors are deliberately below the current measured values (1.0
accuracy on this fixture) so legitimate tuning has headroom while a
real regression (wrong stopword list, inverted ratio) trips loudly.
"""

import pytest

# (text, label) — natural sentences rich in each language's stopwords.
LANG_FIXTURE = [
    # -- English (12) --
    ("the cat sat on the mat and it was happy in the warm sun", "en"),
    ("it is important to check that the results are correct for every case", "en"),
    ("we went to the market in the morning and bought bread with cheese", "en"),
    ("the quick brown fox jumps over the lazy dog in the field", "en"),
    ("she said that the meeting is scheduled for tomorrow with the team", "en"),
    ("this is the best book that i have read in a long time", "en"),
    ("the engine processes data in parallel and writes it to the table", "en"),
    ("a plan for the weekend is to walk in the park with friends", "en"),
    ("the weather report says that it will rain for most of the week", "en"),
    ("he explained that the model is trained with data from the archive", "en"),
    ("the children played in the garden and the dog ran with them", "en"),
    ("it is clear that the answer depends on the size of the input", "en"),
    # -- French (12) --
    ("le chat est sur la table et il regarde les oiseaux dans le jardin", "fr"),
    ("la maison est grande et les fenetres donnent sur le parc", "fr"),
    ("il y a des livres sur la table et une lampe pres de la fenetre", "fr"),
    ("le professeur explique la lecon et les eleves ecoutent avec attention", "fr"),
    ("c'est une belle journee et le soleil brille sur les montagnes", "fr"),
    ("la voiture est garee devant la porte et le moteur est froid", "fr"),
    ("les enfants jouent dans la cour et la cloche sonne midi", "fr"),
    ("le train arrive a la gare et les passagers descendent sur le quai", "fr"),
    ("une tasse de cafe et un croissant sont sur le comptoir", "fr"),
    ("le film est long mais la fin est une vraie surprise", "fr"),
    ("la riviere traverse la ville et des ponts relient les deux rives", "fr"),
    ("il pense que la reponse est dans le dernier chapitre du livre", "fr"),
    # -- German (12) --
    ("der hund ist nicht mit der katze und das haus hat ein dach", "de"),
    ("das wetter ist heute schoen und die sonne scheint ueber der stadt", "de"),
    ("ein mann geht mit dem hund durch den park und die voegel singen", "de"),
    ("die kinder spielen nicht im garten weil das gras nass ist", "de"),
    ("der zug ist puenktlich und die reise nach berlin ist kurz", "de"),
    ("das buch liegt auf dem tisch und die lampe ist nicht an", "de"),
    ("eine tasse kaffee und ein stueck kuchen stehen auf dem tisch", "de"),
    ("der lehrer erklaert die aufgabe und die schueler hoeren zu", "de"),
    ("das auto ist alt aber der motor ist noch gut und laeuft", "de"),
    ("die stadt ist gross und der fluss fliesst mitten durch das zentrum", "de"),
    ("ich gehe nicht zu dem konzert weil die karten zu teuer sind", "de"),
    ("das ist ein gutes beispiel und die antwort ist nicht schwer", "de"),
    # -- Spanish (12) --
    ("el perro es un animal que vive en la casa de los vecinos", "es"),
    ("la ciudad es grande y los parques estan llenos de gente", "es"),
    ("es verdad que el clima en la costa es mejor que en la sierra", "es"),
    ("un cafe y un pan dulce es lo que pido en la manana", "es"),
    ("el tren llega a la estacion y los pasajeros bajan en el anden", "es"),
    ("la escuela esta cerca de la plaza y los ninos van caminando", "es"),
    ("el libro que me diste es el mejor regalo de los ultimos anos", "es"),
    ("es una pelicula larga pero el final es una gran sorpresa", "es"),
    ("la receta lleva un poco de sal y un toque de limon", "es"),
    ("el rio cruza la ciudad y los puentes unen los dos lados", "es"),
    ("creo que la respuesta esta en el ultimo capitulo del libro", "es"),
    ("el mercado abre temprano y la fruta es fresca y barata", "es"),
    # -- Unknown / no supported language (6) --
    ("xylophone quartz jkl mnop qrst uvwx", "und"),
    ("lorem12 ipsum34 dolor56 sit78 amet90", "und"),
    ("def frobnicate(x): return x ** 2 # compute square", "und"),
    ("9832 4471 0058 2216 7790 3341", "und"),
    ("sakura yama kawa umi sora hoshi tsuki", "und"),
    ("zzz qqq vvv www kkk yyy", "und"),
]

# (text, label) — 1 = high-quality English prose, 0 = junk (short,
# digit spam, symbol spam). The quality score is English-centric by
# construction (stopword-ratio term uses the en list).
QUALITY_FIXTURE = [
    ("the cat sat on the mat and it was happy in the warm sun", 1),
    ("we went to the market in the morning and bought bread with cheese", 1),
    ("it is important to check that the results are correct for every case", 1),
    ("she said that the meeting is scheduled for tomorrow with the team", 1),
    ("the engine processes data in parallel and writes it to the table", 1),
    ("the weather report says that it will rain for most of the week", 1),
    ("ok", 0),
    ("short", 0),
    ("12345 67890 11111 22222 33333 44444", 0),
    ("4 8 15 16 23 42 108 317 555 999 1024 2048", 0),
    ("!!! ??? *** $$$ %%% ^^^ &&&", 0),
    ("x9 q8 z7 w6 v5 k4 j3 h2 g1 f0", 0),
]


@pytest.fixture(scope="module")
def lang_pred(spark):
    from openmldb_spark.pipeline.text import lang_id
    df = spark.createDataFrame(LANG_FIXTURE, ["text", "label"])
    rows = lang_id(df, "text", keep=["text", "label"]).collect()
    return [(r.label, r.lang_pred) for r in rows]


def test_lang_id_overall_accuracy(lang_pred):
    acc = sum(1 for y, p in lang_pred if y == p) / len(lang_pred)
    assert acc >= 0.9, f"lang_id accuracy {acc:.2f} below floor 0.9: " \
        f"{[(y, p) for y, p in lang_pred if y != p]}"


@pytest.mark.parametrize("lang", ["en", "fr", "de", "es", "und"])
def test_lang_id_per_language_recall(lang_pred, lang):
    rel = [(y, p) for y, p in lang_pred if y == lang]
    recall = sum(1 for y, p in rel if y == p) / len(rel)
    assert recall >= 0.8, f"{lang} recall {recall:.2f}: {rel}"


def test_lang_id_precision_no_false_positives_from_und(lang_pred):
    # an unsupported-language document must never be claimed with high
    # confidence as a supported one (the und rows contain no stopwords)
    leaked = [(y, p) for y, p in lang_pred if y == "und" and p != "und"]
    assert len(leaked) <= 1, leaked


def test_quality_score_separates_prose_from_junk(spark):
    from openmldb_spark.pipeline.text import text_stats
    df = spark.createDataFrame(QUALITY_FIXTURE, ["text", "label"])
    rows = text_stats(df, "text", keep=["text", "label"]).collect()
    hi = [r.quality for r in rows if r.label == 1]
    lo = [r.quality for r in rows if r.label == 0]
    assert min(hi) >= 0.5, f"prose scored low: {sorted(hi)}"
    assert max(lo) <= 0.25, f"junk scored high: {sorted(lo)}"
    # margin, not just thresholds: the score must actually rank every
    # prose document above every junk document
    assert min(hi) > max(lo)
