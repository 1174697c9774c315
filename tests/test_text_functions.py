"""Golden-output tests for the text-cleaning pipeline — semantics derived
from the reference (Read_And_Clean.py:53-86, polysemous_words.py:71-75)."""

from __future__ import annotations

from pyspark.sql import functions as F

from uni_mannheim_masters_thesis_spark.functions.text import (
    clean_string,
    tokenize,
    tokens_pipeline,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("out")).first()[0]


def test_clean_string_strips_punct_symbols_and_lowers(spark):
    out = _one(spark, "Hello, Wörld! 42 (Test)—done.", clean_string(F.col("t")))
    assert out == "hello wörld 42 test done"


def test_clean_string_collapses_whitespace_runs(spark):
    out = _one(spark, "a\t\tb\n\nc   d", clean_string(F.col("t")))
    assert out == "a b c d"


def test_tokenize_empty_string_gives_empty_array(spark):
    assert _one(spark, "", tokenize(F.col("t"))) == []
    assert _one(spark, "!!!", tokenize(F.col("t"))) == []


def test_pipeline_removes_digits_stopwords_short_tokens(spark):
    # "the" = stopword; "a1b" → "ab" (len 2, dropped); "42" → "" dropped;
    # "cat" kept; "running" kept
    out = _one(spark, "The a1b 42 cat running", tokens_pipeline(F.col("t")))
    assert out == ["cat", "running"]


def test_pipeline_preserves_duplicates_and_order(spark):
    out = _one(spark, "data spark data spark data", tokens_pipeline(F.col("t")))
    assert out == ["data", "spark", "data", "spark", "data"]


def test_pipeline_unicode_category_classes(spark):
    # math symbols (Sm), currency (Sc), control chars (Cc) all stripped
    out = _one(spark, "x\u2260y $100 a\x00b price", tokens_pipeline(F.col("t")))
    assert out == ["price"]


# --- T5 golden pairs (VERDICT r2 #8): morphy-style lemmatizer must match
# WordNet-morphy behavior on irregular forms AND detachment cases --------

def test_morphy_lemmatize_golden_pairs(spark):
    from pyspark.sql import functions as F
    from uni_mannheim_masters_thesis_spark.functions.text import morphy_lemmatize

    golden = [
        # exception-map path (irregulars, the *.exc role)
        ("children", "child"), ("mice", "mouse"), ("women", "woman"),
        ("went", "go"), ("written", "write"), ("thought", "think"),
        ("better", "good"), ("worst", "bad"), ("lives", "life"),
        ("making", "make"), ("used", "use"), ("goes", "go"),
        ("analyses", "analysis"), ("criteria", "criterion"),
        # detachment-rule path (morphy suffix table)
        ("studies", "study"), ("studied", "study"), ("boxes", "box"),
        ("churches", "church"), ("classes", "class"), ("wolves", "wolf"),
        ("workmen", "workman"), ("walked", "walk"), ("cats", "cat"),
        # consonant-doubling undo
        ("running", "run"), ("sitting", "sit"), ("planned", "plan"),
        ("stopped", "stop"),
        # guards: geminate l/s and short tokens stay put
        ("falling", "fall"), ("glass", "glass"), ("seeing", "see"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in golden], ["tok"])
    out = df.select(
        "tok", F.element_at(morphy_lemmatize(F.array("tok")), 1).alias("lemma")
    ).collect()
    got = {r["tok"]: r["lemma"] for r in out}
    bad = [(t, got[t], want) for t, want in golden if got[t] != want]
    assert not bad, f"lemma mismatches (tok, got, want): {bad}"


def test_morphy_sql_twin_matches_spark(spark, duck):
    """The DuckDB fragment and the Spark expression are generated from
    the same constants — feed both the same token list and diff."""
    from pyspark.sql import functions as F
    from uni_mannheim_masters_thesis_spark.functions.text import (
        morphy_lemmatize, sql_morphy_lemma,
    )

    toks = ["children", "studies", "running", "planned", "glass", "goes",
            "wolves", "boxes", "better", "falling", "cats", "workmen"]
    sql = sql_morphy_lemma("['" + "', '".join(toks) + "']")
    duck_out = duck.sql(f"SELECT {sql} AS l").fetchone()[0]
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    spark_out = df.select(morphy_lemmatize(F.col("toks")).alias("l")).first()["l"]
    assert list(duck_out) == list(spark_out)


def test_winnowing_expr_matches_python_reference(spark):
    """Randomized cross-check: the Spark rolling-polynomial fingerprint
    must equal the pure-Python reference on arbitrary text, including
    unicode, punctuation runs, short strings, and empty/blank input."""
    import random
    import string as _string

    from pyspark.sql import functions as F
    from uni_mannheim_masters_thesis_spark.functions.text import (
        winnowing_fingerprint_expr, winnowing_fingerprint_py,
    )

    rng = random.Random(20260813)
    alphabet = (
        _string.ascii_letters + _string.digits + "     .,;!?-_()[]"
        + "éüñßøæ€中文日本語русский"
    )
    corpus = [""] + [" .,!? "] + ["ab"] + ["exactly8"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], ["i", "s"])
    got = {
        r["i"]: r["fp"]
        for r in df.select(
            "i", winnowing_fingerprint_expr(F.col("s")).alias("fp")
        ).collect()
    }
    bad = []
    for i, s in enumerate(corpus):
        want = winnowing_fingerprint_py(s)
        if got[i] != want:
            bad.append((repr(s[:40]), got[i], want))
    assert not bad, f"{len(bad)} mismatches, first 3: {bad[:3]}"


def test_lexicon_strategies_match_reference_semantics(spark):
    """Both lexicon strategies reproduce the reference's list-comprehension
    filter (Read_And_Clean.py:68,77,80): order and multiplicity kept,
    drop/keep modes, all-filtered docs -> empty array (not missing row)."""
    from pyspark.sql import functions as F
    from uni_mannheim_masters_thesis_spark.functions.lexicon import (
        filter_tokens_inline,
        filter_tokens_with_lexicon,
        lexicon_from_words,
    )

    rows = [
        (0, ["data", "spark", "data", "join", "row"]),
        (1, ["data", "row", "table"]),          # all lexicon -> drop => []
        (2, ["merge", "sort", "merge"]),        # none lexicon -> keep => []
        (3, []),                                 # empty doc survives
    ]
    lex_words = ["data", "row", "table", "absentword"]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<string>")
    lex = lexicon_from_words(spark, lex_words)
    want = {
        mode: {
            i: [t for t in toks if (t in lex_words) == (mode == "keep")]
            for i, toks in rows
        }
        for mode in ("drop", "keep")
    }
    for mode in ("drop", "keep"):
        joined = {
            r["doc_id"]: r["out"]
            for r in filter_tokens_with_lexicon(
                df, "tokens", lex, ["doc_id"], mode=mode,
                out_col="out", strategy="join",
            ).collect()
        }
        inline = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id",
                filter_tokens_inline(F.col("tokens"), lex_words, mode).alias("out"),
            ).collect()
        }
        assert joined == want[mode], (mode, joined)
        assert inline == want[mode], (mode, inline)


def test_lexicon_auto_strategy_picks_join_for_large(spark):
    from uni_mannheim_masters_thesis_spark.functions import lexicon as L

    small = L.lexicon_from_words(spark, ["a", "b"])
    big = spark.range(L.INLINE_LEXICON_MAX + 5).selectExpr(
        "concat('w', id) AS word"
    )
    df = spark.createDataFrame(
        [(0, ["w1", "zzz"])], "doc_id int, tokens array<string>"
    )
    out_small = L.filter_tokens_with_lexicon(df, "tokens", small, ["doc_id"])
    out_big = L.filter_tokens_with_lexicon(df, "tokens", big, ["doc_id"])
    assert out_small.collect()[0]["tokens"] == ["w1", "zzz"]
    assert out_big.collect()[0]["tokens"] == ["zzz"]


def test_inline_lexicon_cap_enforced(spark):
    """filter_tokens_inline raises past INLINE_LEXICON_MAX — the cap is
    a hard contract for direct callers, not dispatch-only advice."""
    import pytest

    from uni_mannheim_masters_thesis_spark.functions import lexicon as L
    from pyspark.sql import functions as F

    oversized = [f"w{i}" for i in range(L.INLINE_LEXICON_MAX + 1)]
    with pytest.raises(ValueError, match="INLINE_LEXICON_MAX"):
        L.filter_tokens_inline(F.col("tokens"), oversized, "drop")
    # forced strategy='inline' hits the same guard through the facade
    big = spark.range(L.INLINE_LEXICON_MAX + 5).selectExpr(
        "concat('w', id) AS word"
    )
    df = spark.createDataFrame(
        [(0, ["w1"])], "doc_id int, tokens array<string>"
    )
    with pytest.raises(ValueError, match="INLINE_LEXICON_MAX"):
        L.filter_tokens_with_lexicon(
            df, "tokens", big, ["doc_id"], strategy="inline"
        ).collect()


def test_bm25_matches_hand_computation(spark, tmp_path):
    """BM25 on a 3-doc corpus vs the formula computed in pure Python."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uni_mannheim_masters_thesis_spark.plans.registry import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        REGISTRY,
    )

    texts = {
        1: "spark query merge spark",
        2: "query table scan",
        3: "merge merge sort",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pa.array([0, 0, 0], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    toks = {d: t.split() for d, t in texts.items()}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in _BM25_TERMS
    }
    expected = {}
    for d, v in toks.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            c = idf * tf * (_BM25_K1 + 1.0) / (
                tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(v) / avgdl)
            )
            s += round(c, 9)
        if s > 0:
            expected[d] = round(s, 6)

    got = {
        r["doc_id"]: r["bm25"]
        for r in REGISTRY["bm25_retrieval"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expected


# -- lexicon strategy equivalence (round-10 join-path rewrite) ----------------

def test_lexicon_join_and_inline_strategies_agree_on_random_arrays(spark):
    """The join strategy (shuffle only REMOVED positions, filter the
    original array in place) must be EXTENSIONALLY identical to the
    inline literal-map filter for both modes on hostile inputs:
    duplicate tokens, all-removed docs, no-removed docs, empty arrays,
    NULL arrays, and NULL tokens inside arrays."""
    import random

    from uni_mannheim_masters_thesis_spark.functions.lexicon import (
        filter_tokens_with_lexicon,
        lexicon_from_words,
    )

    rng = random.Random(42)
    alphabet = ["aa", "bb", "cc", "dd", "ee", "ff"]
    lex_words = ["bb", "dd", "zz"]  # zz never occurs (no-match path)
    rows = []
    for i in range(200):
        if i % 17 == 0:
            rows.append((i, None))  # NULL array
            continue
        n = rng.randint(0, 8)
        toks = [rng.choice(alphabet) for _ in range(n)]
        if i % 11 == 0 and toks:
            toks[rng.randrange(len(toks))] = None  # NULL token
        if i % 13 == 0:
            toks = ["bb", "dd"] * 2  # all-removed (drop) / all-kept (keep)
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    lex = lexicon_from_words(spark, lex_words)

    for mode in ("drop", "keep"):
        inline = filter_tokens_with_lexicon(
            df, "tokens", lex, id_cols=["doc_id"], mode=mode,
            out_col="out", strategy="inline",
        ).select("doc_id", "out")
        joined = filter_tokens_with_lexicon(
            df, "tokens", lex, id_cols=["doc_id"], mode=mode,
            out_col="out", strategy="join",
        ).select("doc_id", "out")
        a = {r["doc_id"]: r["out"] for r in inline.collect()}
        b = {r["doc_id"]: r["out"] for r in joined.collect()}
        assert a == b, mode


def test_empty_lexicon_drop_still_removes_null_tokens(spark):
    """Round-11 advice fix: with an EMPTY lexicon, drop mode must still
    remove NULL tokens so inline and join strategies agree (the
    non-empty inline path's ~map_contains_key predicate is NULL for a
    NULL token, which filter() drops)."""
    from uni_mannheim_masters_thesis_spark.functions.lexicon import (
        filter_tokens_inline,
        filter_tokens_with_lexicon,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, ["aa", None, "bb"]), (2, [None]), (3, []), (4, None)],
        "doc_id long, tokens array<string>",
    )
    empty_lex = spark.createDataFrame([], "word string")
    expected = {1: ["aa", "bb"], 2: [], 3: [], 4: None}

    inline = df.select(
        "doc_id",
        filter_tokens_inline(F.col("tokens"), [], mode="drop").alias("out"),
    )
    got_inline = {r["doc_id"]: r["out"] for r in inline.collect()}
    assert got_inline == expected

    joined = filter_tokens_with_lexicon(
        df, "tokens", empty_lex, id_cols=["doc_id"], mode="drop",
        out_col="out", strategy="join",
    ).select("doc_id", "out")
    got_join = {r["doc_id"]: r["out"] for r in joined.collect()}
    assert got_join == expected
