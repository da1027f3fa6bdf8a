"""Gopher rule gate: every rule must fire both ways on crafted docs."""

from __future__ import annotations

from dronedb_spark.text.gopher import MIN_WORDS, gopher_quality_flags


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_quality_flags(df).collect()[0]
    return {k: r[k] for k in r.asDict() if k.startswith("r")} | {"keep": r["keep"]}


def _good_text(n=60):
    # alternating stop + content words: passes every rule
    return " ".join(["the rows", "a table"][i % 2] for i in range(n // 2))


def test_good_doc_keeps(spark):
    f = _flags(spark, _good_text())
    assert f == {
        "r1_word_count": 1, "r2_mean_word_len": 1, "r3_symbol_ratio": 1,
        "r4_alpha_words": 1, "r5_stop_words": 1, "keep": 1,
    }


def test_r1_too_short(spark):
    f = _flags(spark, "the a " + "word " * 5)
    assert f["r1_word_count"] == 0 and f["keep"] == 0


def test_r2_mean_word_len_both_tails(spark):
    # 60 one-char words: mean 1 < 3
    short = "the a " + " ".join("x" for _ in range(58))
    assert _flags(spark, short)["r2_mean_word_len"] == 0
    # 60 very long words: mean > 10
    long_ = "the a " + " ".join("x" * 20 for _ in range(58))
    assert _flags(spark, long_)["r2_mean_word_len"] == 0


def test_r3_symbol_ratio(spark):
    hashy = _good_text() + " " + " ".join("#" * 3 for _ in range(12))
    assert _flags(spark, hashy)["r3_symbol_ratio"] == 0
    dotty = _good_text() + " " + " ".join("..." for _ in range(12))
    assert _flags(spark, dotty)["r3_symbol_ratio"] == 0


def test_r4_alpha_words(spark):
    nums = "the a " + " ".join(str(i) for i in range(58))
    f = _flags(spark, nums)
    assert f["r4_alpha_words"] == 0 and f["keep"] == 0


def test_r5_needs_two_distinct(spark):
    one_stop = " ".join(["the"] * 3 + ["rows"] * (MIN_WORDS + 7))
    f = _flags(spark, one_stop)
    assert f["r5_stop_words"] == 0
    two_stop = "a " + one_stop
    assert _flags(spark, two_stop)["r5_stop_words"] == 1
