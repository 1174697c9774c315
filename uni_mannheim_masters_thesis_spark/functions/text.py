"""Text-cleaning column functions (pure Spark builtins — JVM codegen path).

Re-expresses the reference's 10-stage scalar cleaning pipeline
(``Read_And_Clean.py:53-86`` — lower, Unicode punctuation strip, tokenize,
digit removal, stopword filter, short-token filter, empty filter) as
Column expressions so the whole pipeline fuses into one WholeStageCodegen
span. No Python UDFs anywhere in this module.

The Unicode class regex matches the reference's
``[\\p{C}\\p{M}\\p{P}\\p{S}\\p{Z}]+`` (``Read_And_Clean.py:48-51``;
``cleanString`` at ``polysemous_words.py:71-75``); Java regex supports
these classes natively, as does RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# control / mark / punctuation / symbol / separator — reference
# Read_And_Clean.py:49
PUNCT_CLASS_RE = r"[\p{C}\p{M}\p{P}\p{S}\p{Z}]+"

# Engine default English stopword list. The reference uses NLTK's English
# list (Read_And_Clean.py:68,171); this is the standard core subset, kept
# as an explicit literal so the DuckDB oracle SQL can embed the identical
# set. Configurable per call.
STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "all", "an", "and", "any",
    "are", "as", "at", "be", "because", "been", "before", "being", "below",
    "between", "both", "but", "by", "can", "did", "do", "does", "doing",
    "down", "during", "each", "few", "for", "from", "further", "had",
    "has", "have", "having", "he", "her", "here", "hers", "him", "his",
    "how", "i", "if", "in", "into", "is", "it", "its", "just", "me",
    "more", "most", "my", "no", "nor", "not", "now", "of", "off", "on",
    "once", "only", "or", "other", "our", "out", "over", "own", "s",
    "same", "she", "should", "so", "some", "such", "t", "than", "that",
    "the", "their", "them", "then", "there", "these", "they", "this",
    "those", "through", "to", "too", "under", "until", "up", "very",
    "was", "we", "were", "what", "when", "where", "which", "while", "who",
    "whom", "why", "will", "with", "you", "your",
)

MIN_TOKEN_LEN = 3  # reference keeps len > 2 (Read_And_Clean.py:74)
MIN_DOC_WORDS = 5  # webisalod_lda.py:33 / BASELINE MIN_DOC_LEN
MAX_DOC_WORDS = 1_706_800  # webisalod_lda.py:32


def clean_string(col: Column) -> Column:
    """lower → strip Unicode punct/symbol/separator runs to ' ' → trim.

    Reference: ``cleanString`` (polysemous_words.py:71-75) and
    Read_And_Clean.py:45-51 (T1+T2).
    """
    return F.trim(F.regexp_replace(F.lower(col), PUNCT_CLASS_RE, " "))


def tokenize(col: Column) -> Column:
    """Whitespace tokenization of an already-cleaned string (T4/T7).

    ``clean_string`` collapses separator runs, so a single-space split is
    exact. Empty input yields an empty array (not ``['']``).
    """
    cleaned = clean_string(col)
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def remove_numbers(tokens: Column) -> Column:
    """Strip digits inside each token (T3, Read_And_Clean.py:14-17)."""
    return F.transform(tokens, lambda t: F.regexp_replace(t, "[0-9]", ""))


def remove_stopwords(tokens: Column, stopwords=STOPWORDS) -> Column:
    """Drop stopword tokens, preserving duplicates/order (P4).

    ``array_except`` would dedupe; a ``filter`` HOF keeps multiplicity,
    matching the reference's list comprehension (Read_And_Clean.py:68).
    """
    return F.filter(tokens, lambda t: ~t.isin(*stopwords))


def drop_short_tokens(tokens: Column, min_len: int = MIN_TOKEN_LEN) -> Column:
    """Keep tokens with length >= min_len (P5, Read_And_Clean.py:74)."""
    return F.filter(tokens, lambda t: F.length(t) >= min_len)


def drop_empty(tokens: Column) -> Column:
    """Drop empty tokens (P8, Read_And_Clean.py:82)."""
    return F.filter(tokens, lambda t: t != "")


def tokens_pipeline(col: Column, stopwords=STOPWORDS, min_len: int = MIN_TOKEN_LEN) -> Column:
    """Full cleaning pipeline text → clean tokens (Read_And_Clean.py:53-86).

    Stages: lower → punct strip → tokenize → de-digit → stopword filter →
    short filter → empty filter. (The reference's spellcheck/English-lexicon
    stages P6/P7 are the same filter-vs-broadcast-lexicon pattern and are
    exposed separately via remove_stopwords with a custom lexicon.)
    """
    toks = tokenize(col)
    toks = remove_numbers(toks)
    toks = remove_stopwords(toks, stopwords)
    toks = drop_short_tokens(toks, min_len)
    return drop_empty(toks)


def rule_lemmatize(tokens: Column) -> Column:
    """Rule-based lemmatizer (T5 analogue of WordNet morphy,
    Read_And_Clean.py:38-43): suffix-strip rules expressed as a CASE
    chain so the semantics are deterministic, broadcast-free, and
    mirrorable in oracle SQL. Rules: -ing (len>5) → stem; -s (len>3,
    not -ss) → singular.
    """
    def lemma(t: Column) -> Column:
        return (
            F.when(
                t.endswith("ing") & (F.length(t) > 5),
                t.substr(F.lit(1), F.length(t) - 3),
            )
            .when(
                t.endswith("s") & ~t.endswith("ss") & (F.length(t) > 3),
                t.substr(F.lit(1), F.length(t) - 1),
            )
            .otherwise(t)
        )

    return F.transform(tokens, lemma)


# --- DuckDB-oracle SQL fragments (same constants, same semantics) -------

def sql_clean_string(expr: str) -> str:
    """DuckDB SQL equivalent of clean_string (RE2 'g' flag = replace all)."""
    return (
        f"trim(regexp_replace(lower({expr}), "
        f"'[\\p{{C}}\\p{{M}}\\p{{P}}\\p{{S}}\\p{{Z}}]+', ' ', 'g'))"
    )


def sql_stopword_list(stopwords=STOPWORDS) -> str:
    return "(" + ", ".join(f"'{s}'" for s in stopwords) + ")"
