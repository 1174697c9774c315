"""Text-analysis operators for the documents table (SURVEY §2.11).

All pure Column expressions (WholeStageCodegen; no UDFs): quality
scoring, token counting, language-ID heuristic, document fingerprinting.
These generalize the reference's cleaning pipeline statistics
(``Read_And_Clean.py:53-86``) into the text-analysis surface a
training-data pipeline needs at 100 TB: every function is a scalar map
over the scan, so throughput is bounded by parquet read speed.

Each statistic has two forms: a ``*_from_tokens`` kernel over an
ALREADY-PROJECTED token-array column, and a convenience wrapper taking
raw text. Queries that evaluate several statistics per row must project
``tokenize(text)`` ONCE and use the token kernels — higher-order
functions block Catalyst's common-subexpression elimination, so
inlining ``tokenize`` into N statistics re-runs the cleaning regex +
split N× per row (measured 3.4× the whole-query cost on the 6-rule
admission filter before the fix).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, clean_string, tokenize

# tiny per-language function-word lists for the n-gram/stopword-hit
# language-ID heuristic; deliberately literal so the DuckDB oracle can
# embed the identical sets.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es": ("el", "los", "las", "es", "una", "que", "por", "para"),
}


def word_count_from_tokens(toks: Column) -> Column:
    return F.size(toks)


def word_count(text: Column) -> Column:
    """Whitespace token count of the cleaned text."""
    return word_count_from_tokens(tokenize(text))


def distinct_word_count_from_tokens(toks: Column) -> Column:
    return F.size(F.array_distinct(toks))


def distinct_word_count(text: Column) -> Column:
    return distinct_word_count_from_tokens(tokenize(text))


def stopword_ratio_from_tokens(toks: Column, stopwords=STOPWORDS) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def stopword_ratio(text: Column, stopwords=STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    return stopword_ratio_from_tokens(tokenize(text), stopwords)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbol."""
    stripped = F.regexp_replace(text, r"[\p{P}\p{S}]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(stripped)).cast("double") / F.length(text)
    )


def avg_word_length_from_tokens(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def avg_word_length(text: Column) -> Column:
    return avg_word_length_from_tokens(tokenize(text))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(clean_string(text))


def langid_score_from_tokens(toks: Column, lang: str) -> Column:
    """Marker-word hit count for one language."""
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def langid_score(text: Column, lang: str) -> Column:
    return langid_score_from_tokens(tokenize(text), lang)


def langid_from_tokens(toks: Column) -> Column:
    """Heuristic language ID over a projected token column: argmax
    marker-hit count, 'und' if no hits.

    Ties break toward the alphabetically-first language code (a
    deterministic when-chain, trivially mirrorable in oracle SQL).
    """
    codes = sorted(LANG_MARKERS)
    hits = {c: langid_score_from_tokens(toks, c) for c in codes}
    expr = F.lit("und")
    # build the chain back-to-front so earlier codes win ties
    for i in range(len(codes) - 1, -1, -1):
        c = codes[i]
        cond = hits[c] > 0
        for other in codes[i + 1 :]:
            cond = cond & (hits[c] >= hits[other])
        for other in codes[:i]:
            cond = cond & (hits[c] > hits[other])
        expr = F.when(cond, F.lit(c)).otherwise(expr)
    return expr


def langid(text: Column) -> Column:
    """Heuristic language ID from raw text. Prefer projecting
    ``tokenize(text)`` once and calling :func:`langid_from_tokens` —
    this wrapper re-tokenizes per language score."""
    return langid_from_tokens(tokenize(text))
