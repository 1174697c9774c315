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


# Irregular-form → lemma exceptions, morphy-style (T5). WordNet's morphy
# consults exception lists (the *.exc files) BEFORE suffix detachment —
# this map plays that role with the common English irregular verbs /
# nouns / adjectives plus frequent e-restoration and consonant-doubling
# participles that pure suffix rules get wrong. Public-knowledge word
# pairs (standard English morphology, same behavior as
# Read_And_Clean.py:38-43's WordNetLemmatizer on these forms); kept as
# ONE literal dict so the Spark map expression and the DuckDB oracle MAP
# are generated from identical data.
LEMMA_EXCEPTIONS: dict[str, str] = {
    # irregular verbs (past / participle → base)
    "went": "go", "gone": "go", "goes": "go", "came": "come", "saw": "see",
    "seen": "see", "took": "take", "taken": "take", "got": "get",
    "gotten": "get", "made": "make", "said": "say", "found": "find",
    "gave": "give", "given": "give", "told": "tell", "became": "become",
    "left": "leave", "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "wrote": "write", "written": "write",
    "stood": "stand", "heard": "hear", "meant": "mean", "met": "meet",
    "paid": "pay", "sat": "sit", "spoke": "speak", "spoken": "speak",
    "led": "lead", "grew": "grow", "grown": "grow", "lost": "lose",
    "fell": "fall", "fallen": "fall", "sent": "send", "built": "build",
    "understood": "understand", "drew": "draw", "drawn": "draw",
    "broke": "break", "broken": "break", "spent": "spend", "rose": "rise",
    "risen": "rise", "drove": "drive", "driven": "drive", "bought": "buy",
    "wore": "wear", "worn": "wear", "chose": "choose", "chosen": "choose",
    "ate": "eat", "eaten": "eat", "felt": "feel", "thought": "think",
    "knew": "know", "known": "know", "won": "win", "taught": "teach",
    "caught": "catch", "sold": "sell", "sang": "sing", "sung": "sing",
    "flew": "fly", "flown": "fly", "ran": "run", "swam": "swim",
    "swum": "swim", "threw": "throw", "thrown": "throw", "spread": "spread",
    "shown": "show", "slept": "sleep", "laid": "lay", "lain": "lie",
    # -ing / -ed forms needing e-restoration (detachment alone strips to
    # a non-word: mak-, tak-, us-, …)
    "making": "make", "taking": "take", "using": "use", "coming": "come",
    "giving": "give", "writing": "write", "having": "have",
    "creating": "create", "providing": "provide", "producing": "produce",
    "including": "include", "increasing": "increase", "reducing": "reduce",
    "requiring": "require", "describing": "describe", "receiving": "receive",
    "locating": "locate", "relating": "relate", "involving": "involve",
    "created": "create", "used": "use", "based": "base", "named": "name",
    "required": "require", "provided": "provide", "included": "include",
    "received": "receive", "described": "describe", "increased": "increase",
    "reduced": "reduce", "produced": "produce", "located": "locate",
    "related": "relate", "involved": "involve",
    # irregular nouns (morphy noun.exc core)
    "children": "child", "men": "man", "women": "woman", "mice": "mouse",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "lives": "life",
    "knives": "knife", "wives": "wife", "data": "datum", "indices": "index",
    "matrices": "matrix", "analyses": "analysis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis", "criteria": "criterion",
    "phenomena": "phenomenon", "media": "medium", "series": "series",
    "species": "species",
    # irregular adjectives/adverbs (morphy adj.exc core)
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "further": "far", "farther": "far",
}
# consonants that double before -ing/-ed (run→running); 'l'/'s' excluded
# so fall/miss keep their geminate
_DOUBLED = "bdgkmnprt"


def morphy_lemmatize(tokens: Column) -> Column:
    """Morphy-style lemmatizer (T5, Read_And_Clean.py:38-43): exception
    map first (WordNet *.exc role), then ordered suffix-detachment rules
    (the morphy detachment table), then a consonant-doubling undo for
    -ing/-ed participles. Pure Column expressions — the map literal and
    CASE chain fuse into codegen; no UDF, no broadcast join needed (the
    lexicon is expression-embedded). ``sql_morphy_lemma`` mirrors every
    branch for the DuckDB oracle from the same constants.
    """
    pairs: list[Column] = []
    for k, v in LEMMA_EXCEPTIONS.items():
        pairs.extend((F.lit(k), F.lit(v)))
    exc_map = F.create_map(*pairs)

    def strip(t: Column, n: int) -> Column:
        return t.substr(F.lit(1), F.length(t) - n)

    def undouble(stem: Column) -> Column:
        # runn → run, sitt → sit; fall / miss untouched
        last = stem.substr(F.length(stem), F.lit(1))
        prev = stem.substr(F.length(stem) - 1, F.lit(1))
        return F.when(
            (last == prev) & last.isin(*list(_DOUBLED)), strip(stem, 1)
        ).otherwise(stem)

    def rules(t: Column) -> Column:
        es_forms = (
            t.endswith("sses") | t.endswith("ches") | t.endswith("shes")
            | t.endswith("xes") | t.endswith("zes")
        )
        return (
            F.when(es_forms, strip(t, 2))
            .when(t.endswith("ies") & (F.length(t) > 4), F.concat(strip(t, 3), F.lit("y")))
            .when(t.endswith("ied") & (F.length(t) > 4), F.concat(strip(t, 3), F.lit("y")))
            .when(t.endswith("ves") & (F.length(t) > 4), F.concat(strip(t, 3), F.lit("f")))
            .when(t.endswith("men") & (F.length(t) > 4), F.concat(strip(t, 2), F.lit("an")))
            .when(t.endswith("ing") & (F.length(t) > 5), undouble(strip(t, 3)))
            .when(t.endswith("ed") & (F.length(t) > 4), undouble(strip(t, 2)))
            .when(t.endswith("s") & ~t.endswith("ss") & (F.length(t) > 3), strip(t, 1))
            .otherwise(t)
        )

    return F.transform(
        tokens, lambda t: F.coalesce(F.element_at(exc_map, t), rules(t))
    )


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


# Horner weights for the 8-gram rolling polynomial fingerprint: exact
# int64 base-31 hash over codepoints, replayable bit-identically by any
# engine with 64-bit integer arithmetic (max codepoint 0x10FFFF × 31^7
# × 8 ≈ 2.4e17 < 2^63 — no overflow, no modulus needed)
POLY_WINDOW = 8
POLY_WEIGHTS = tuple(31**p for p in range(POLY_WINDOW - 1, -1, -1))


def winnowing_fingerprint_expr(col: Column) -> Column:
    """Min-of-rolling-8-gram polynomial hashes over the CLEANED text —
    the winnowing-lite document fingerprint (BIGINT). Empty text → 0,
    text shorter than the window → Horner over all chars.

    The cleaned string and its codepoint array are bound ONCE per row
    through a single-element ``transform`` lambda — naively capturing
    the split expression inside the window lambda re-evaluates the
    O(n) split at every window position (O(n²) per document; measured
    6s → 58s at sf0.01 before this binding)."""
    from pyspark.sql import functions as _F

    cleaned = clean_string(col)
    cs = _F.transform(
        _F.split(cleaned, ""), lambda ch: _F.ascii(ch).cast("long")
    )
    row = _F.array(_F.struct(cleaned.alias("c"), cs.alias("cs")))

    def body(x: Column) -> Column:
        c, codes = x["c"], x["cs"]
        n = _F.length(c)

        def poly(i: Column) -> Column:
            acc = None
            for j, w in enumerate(POLY_WEIGHTS):
                t = _F.element_at(codes, i + j) * _F.lit(w).cast("long")
                acc = t if acc is None else acc + t
            return acc

        rolled = _F.array_min(
            _F.transform(
                _F.sequence(_F.lit(1), n - (POLY_WINDOW - 1)), poly
            )
        )
        horner = _F.aggregate(
            codes, _F.lit(0).cast("long"), lambda a, ch: a * 31 + ch
        )
        return (
            _F.when(n == 0, _F.lit(0).cast("long"))
            .when(n >= POLY_WINDOW, rolled)
            .otherwise(horner)
        )

    return _F.element_at(_F.transform(row, body), 1)


def winnowing_fingerprint_py(text: str) -> int:
    """Pure-Python reference of winnowing_fingerprint_expr (tests)."""
    import re as _re
    import unicodedata as _u

    # clean_string twin: lower → \p{C}\p{M}\p{P}\p{S}\p{Z} runs → ' ' → trim
    def _is_strip(ch: str) -> bool:
        return _u.category(ch)[0] in "CMPSZ"

    lowered = text.lower()
    out, prev_space = [], False
    for ch in lowered:
        if _is_strip(ch):
            if not prev_space:
                out.append(" ")
            prev_space = True
        else:
            out.append(ch)
            prev_space = False
    c = "".join(out).strip()
    codes = [ord(ch) for ch in c]
    if not codes:
        return 0
    if len(codes) < POLY_WINDOW:
        acc = 0
        for ch in codes:
            acc = acc * 31 + ch
        return acc
    return min(
        sum(codes[i + j] * w for j, w in enumerate(POLY_WEIGHTS))
        for i in range(len(codes) - POLY_WINDOW + 1)
    )


def sql_morphy_lemma(list_expr: str) -> str:
    """DuckDB twin of morphy_lemmatize — MAP + CASE generated from the
    SAME ``LEMMA_EXCEPTIONS`` / rule constants as the Spark expression."""
    keys = ", ".join(f"'{k}'" for k in LEMMA_EXCEPTIONS)
    vals = ", ".join(f"'{v}'" for v in LEMMA_EXCEPTIONS.values())
    exc = f"list_extract(map_extract(MAP(LIST_VALUE({keys}), LIST_VALUE({vals})), t), 1)"
    doubled = ", ".join(f"'{c}'" for c in _DOUBLED)

    def undouble(s: str) -> str:
        return (
            f"CASE WHEN substring({s}, length({s}), 1) = "
            f"substring({s}, length({s})-1, 1) "
            f"AND substring({s}, length({s}), 1) IN ({doubled}) "
            f"THEN substring({s}, 1, length({s})-1) ELSE {s} END"
        )

    ing_stem = "substring(t, 1, length(t)-3)"
    ed_stem = "substring(t, 1, length(t)-2)"
    rules = (
        "CASE "
        "WHEN t LIKE '%sses' OR t LIKE '%ches' OR t LIKE '%shes' "
        "OR t LIKE '%xes' OR t LIKE '%zes' THEN substring(t, 1, length(t)-2) "
        "WHEN t LIKE '%ies' AND length(t) > 4 THEN substring(t, 1, length(t)-3) || 'y' "
        "WHEN t LIKE '%ied' AND length(t) > 4 THEN substring(t, 1, length(t)-3) || 'y' "
        "WHEN t LIKE '%ves' AND length(t) > 4 THEN substring(t, 1, length(t)-3) || 'f' "
        "WHEN t LIKE '%men' AND length(t) > 4 THEN substring(t, 1, length(t)-2) || 'an' "
        f"WHEN t LIKE '%ing' AND length(t) > 5 THEN {undouble(ing_stem)} "
        f"WHEN t LIKE '%ed' AND length(t) > 4 THEN {undouble(ed_stem)} "
        "WHEN t LIKE '%s' AND t NOT LIKE '%ss' AND length(t) > 3 "
        "THEN substring(t, 1, length(t)-1) "
        "ELSE t END"
    )
    return f"list_transform({list_expr}, t -> COALESCE({exc}, {rules}))"
