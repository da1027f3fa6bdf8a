"""NB language ID: discrimination on genuinely distinct languages,
prior behavior, and partition determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.langid import (
    B,
    char_trigram_buckets,
    langid_model,
    langid_predict,
)

_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and the cat sat on the mat with them all",
    "de": "der schnelle braune fuchs springt über den faulen hund und die katze saß auf der matte",
    "es": "el zorro marrón rápido salta sobre el perro perezoso y el gato se sentó en la alfombra",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et le chat était assis dessus",
}


def _corpus(spark, reps=6):
    rows = []
    i = 0
    for lang, s in _SAMPLES.items():
        words = s.split(" ")
        for r in range(reps):
            # rotate word order so docs differ but keep the language's
            # character distribution
            t = " ".join(words[r:] + words[:r])
            rows.append((i, t, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_trigram_mass(spark):
    df = spark.createDataFrame([(0, "abcde")], "doc_id long, text string")
    total = char_trigram_buckets(df).agg(F.sum("c")).collect()[0][0]
    assert total == 3  # abc bcd cde
    short = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    assert char_trigram_buckets(short).count() == 0


def test_model_spine_complete(spark):
    docs = _corpus(spark)
    m = langid_model(docs, spark)
    assert m.count() == len(_SAMPLES) * B
    # per-lang totals equal the lang's trigram mass
    tot = {r["lang"]: r["s"] for r in m.groupBy("lang").agg(F.sum("t_c").alias("s")).collect()}
    mass = {
        r["lang"]: r["s"]
        for r in char_trigram_buckets(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("c").alias("s"))
        .collect()
    }
    assert tot == mass


def test_discriminates_distinct_languages(spark):
    """Trained on rotated copies, scored on held-out rotations: every
    prediction must be the true language."""
    train = _corpus(spark, reps=6)
    model = langid_model(train, spark)
    # held-out: different rotations (reps 6..8) of the same samples
    rows = []
    i = 1000
    for lang, s in _SAMPLES.items():
        words = s.split(" ")
        for r in (6, 7, 8):
            rows.append((i, " ".join(words[r:] + words[:r]), lang))
            i += 1
    test = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    pred = langid_predict(test.select("doc_id", "text"), model)
    joined = pred.join(test.select("doc_id", "lang"), "doc_id")
    wrong = joined.filter(F.col("pred_lang") != F.col("lang")).count()
    assert wrong == 0


def test_empty_featureless_doc_gets_no_prediction(spark):
    """A doc with no trigrams produces no score rows — the caller
    routes it to the heuristic/unknown path rather than a fake max."""
    model = langid_model(_corpus(spark), spark)
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert langid_predict(docs, model).count() == 0


def test_deterministic_across_partitionings(spark):
    docs = _corpus(spark)
    model = langid_model(docs, spark)
    a = sorted(tuple(r) for r in langid_predict(docs, model).collect())
    b = sorted(
        tuple(r)
        for r in langid_predict(docs.repartition(17), langid_model(docs.repartition(5), spark)).collect()
    )
    assert a == b
