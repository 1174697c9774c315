"""Distributed byte-pair-encoding merge training (Sennrich 2016).

The reference counts BPE-ish subword budgets (`bpe_subword_counts`);
this module TRAINS the merge table itself — the iterative
highest-frequency-adjacent-pair loop every subword tokenizer
(BPE/WordPiece-style) is built on — as a sequence of DataFrame jobs:

1. The corpus collapses to a **word-frequency dictionary** once
   (classic BPE trick, and the scale lever: pair statistics over a
   100 TB corpus are identical to pair statistics over its word dict
   weighted by frequency, and the dict is orders of magnitude
   smaller). Each word becomes a space-separated symbol string of its
   characters plus a terminal ``</w>`` marker.
2. Each merge step is one distributed job over the cached dict:
   explode adjacent symbol pairs, weighted-count them (map-side
   partial aggregation on the pair key), and take the argmax with a
   deterministic tie-break (count desc, then lexicographic pair) via
   a distributed TakeOrdered — only ONE row reaches the driver per
   step.
3. The winning pair is applied with BPE's exact greedy
   left-to-right within-word scan — an index fold (``aggregate``
   higher-order function, pure whole-stage-codegen, no shuffle) whose
   accumulator carries a skip flag so a merge consumes its right
   symbol: ``a a a a`` under merge (a,a) becomes ``aa aa``, never
   ``aa a a``. (A plain string ``replace`` of ``' a a '`` gets this
   wrong: the trailing delimiter it consumes hides the next
   occurrence — caught by ``test_bpe_overlapping_pairs``.)

Driver state is O(n_merges) rows; every heavy operation (tokenize,
pair count, merge application) is a distributed scan of the word
dict. The DuckDB oracle unrolls the same loop as chained CTEs but
applies merges via an INDEPENDENT algorithm — relational
gaps-and-islands over exploded token positions (greedy = keep every
even-offset match within a run of consecutive matches) — so the
hash-exact agreement is two different algorithms computing the same
training trajectory, not one algorithm transliterated twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_MARK = "</w>"

# adjacent symbol pairs of the space-separated symbol string `s`
# (Spark SQL array indexing is 0-based)
_PAIRS_EXPR = (
    "explode(transform(sequence(1, size(split(s, ' ')) - 1), "
    "i -> struct(split(s, ' ')[i-1] AS lhs, split(s, ' ')[i] AS rhs)))"
)


def word_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) dictionary over lowercase ASCII-letter words —
    the corpus-collapse step (one shuffle on the word key)."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _greedy_merge_expr(lhs: str, rhs: str) -> str:
    """BPE's within-word greedy left-to-right merge of the pair
    (lhs, rhs) over the symbol string ``s``, as one whole-stage-codegen
    index fold: walk token positions; on a match emit the merged symbol
    and set ``skip`` so the consumed right token is not revisited (and
    cannot start a new match — ``a a a a`` → ``aa aa``)."""
    assert "'" not in lhs + rhs  # symbols come from [a-z]+ / </w> concat
    return f"""
    array_join(
      aggregate(
        sequence(0, size(split(s, ' ')) - 1),
        named_struct('out', array_repeat('', 0), 'skip', false),
        (acc, i) -> CASE
            WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
            WHEN i < size(split(s, ' ')) - 1
                 AND split(s, ' ')[i] = '{lhs}'
                 AND split(s, ' ')[i + 1] = '{rhs}'
              THEN named_struct(
                  'out', concat(acc.out, array('{lhs}{rhs}')), 'skip', true)
            ELSE named_struct(
                'out', concat(acc.out, array(split(s, ' ')[i])),
                'skip', false) END,
        acc -> acc.out),
      ' ')
    """


def bpe_train_full(
    spark: SparkSession, words: DataFrame, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_merges`` BPE merge steps over a (word, freq) dict;
    return ``(merge_table, final_dict)`` — the merge table
    (step, lhs, rhs, pair_count, merged) plus the fully-merged symbol
    dictionary (word, s, freq), i.e. the tokenizer state the encode
    path applies to a corpus.

    Each step is one distributed scan of the dict (the pair-count
    argmax forces a pass anyway, since the winning pair feeds the next
    step's expression); the merged dict is re-pinned per step with
    ``localCheckpoint`` so expression depth stays constant instead of
    compounding across steps. Nothing corpus-sized ever reaches the
    driver — one argmax row per step."""
    base = (
        words.select(
            "word",
            F.concat(
                F.concat_ws(" ", F.split(F.col("word"), "")),
                F.lit(" " + END_MARK),
            ).alias("s"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int, str]] = []
    for step in range(1, n_merges + 1):
        top = (
            # guard: a fully-merged word is ONE symbol; sequence(1, 0)
            # counts DOWN in Spark and would fabricate null pairs
            base.filter(F.expr("size(split(s, ' ')) >= 2"))
            .select(F.expr(_PAIRS_EXPR).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:  # dict fully merged — stop early
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        merges.append((step, lhs, rhs, cnt, lhs + rhs))
        base = base.select(
            "word", F.expr(_greedy_merge_expr(lhs, rhs)).alias("s"), "freq"
        ).localCheckpoint(eager=True)
    merge_df = spark.createDataFrame(
        merges,
        "step int, lhs string, rhs string, pair_count long, merged string",
    )
    return merge_df, base


def bpe_train(
    spark: SparkSession, words: DataFrame, n_merges: int
) -> DataFrame:
    """The merge table alone (see :func:`bpe_train_full`)."""
    return bpe_train_full(spark, words, n_merges)[0]
