from .text import (  # noqa: F401
    PUNCT_CLASS_RE,
    STOPWORDS,
    clean_string,
    drop_empty,
    drop_short_tokens,
    remove_numbers,
    remove_stopwords,
    tokenize,
    tokens_pipeline,
)
from .similarity import cosine_similarity, jaro_winkler  # noqa: F401
