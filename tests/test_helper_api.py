"""Unit tests for the public helper API surface that no registry query
routes through directly — kept exercised so the package carries zero
unverified code paths."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_text_convenience_wrappers_match_token_forms(spark):
    """distinct_word_count / avg_word_length / langid_score (the
    raw-text conveniences) must agree with their *_from_tokens cores on
    a hand-checked fixture."""
    from uni_mannheim_masters_thesis_spark.operators.textstats import (
        avg_word_length,
        distinct_word_count,
        langid_score,
    )

    df = spark.createDataFrame(
        [("the cat and the hat!",), ("",), ("der der und",)], "text string"
    )
    rows = df.select(
        distinct_word_count(F.col("text")).alias("d"),
        avg_word_length(F.col("text")).alias("a"),
        langid_score(F.col("text"), "en").alias("en"),
        langid_score(F.col("text"), "de").alias("de"),
    ).collect()
    # "the cat and the hat!" cleans to 5 three-letter tokens (the "!"
    # strips): 4 distinct, mean length 3.0, en-markers {the x2, and}
    assert rows[0]["d"] == 4
    assert abs(rows[0]["a"] - 3.0) < 1e-12
    assert rows[0]["en"] == 3 and rows[0]["de"] == 0
    # empty text: zero everything, no division blowup
    assert rows[1]["d"] == 0 and rows[1]["a"] == 0.0
    # "der der und": de-markers 3 hits, en 0
    assert rows[2]["de"] == 3 and rows[2]["en"] == 0


def test_rule_lemmatize_suffix_rules(spark):
    """-ing strips only above length 5; -s strips unless -ss or short."""
    from uni_mannheim_masters_thesis_spark.functions.text import rule_lemmatize

    df = spark.createDataFrame(
        [(["running", "king", "cats", "class", "its", "walks"],)],
        "toks array<string>",
    )
    out = df.select(rule_lemmatize(F.col("toks")).alias("l")).first()["l"]
    assert out == ["runn", "king", "cat", "class", "its", "walk"]


def test_resampling_fallbacks_move_toward_balance(spark):
    """oversample_minority grows minority classes toward the majority
    count; undersample_majority caps majorities near the minority
    count; both are deterministic under a fixed seed."""
    from uni_mannheim_masters_thesis_spark.ml.classify import (
        oversample_minority,
        undersample_majority,
    )

    df = spark.createDataFrame(
        [(i, 0 if i < 90 else 1) for i in range(100)], "id long, label int"
    )
    over = oversample_minority(df, seed=7)
    oc = {r["label"]: r["n"] for r in
          over.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert oc[0] == 90  # majority untouched
    assert oc[1] > 10  # minority grew (Bernoulli sampling, near 90)
    assert [tuple(r) for r in over.orderBy("id", "label").collect()] == [
        tuple(r) for r in oversample_minority(df, seed=7).orderBy("id", "label").collect()
    ]
    under = undersample_majority(df, seed=7)
    uc = {r["label"]: r["n"] for r in
          under.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert uc[1] == 10  # minority kept whole (fraction 1.0)
    assert uc[0] < 90  # majority shrank toward 10
