from .topics import (  # noqa: F401
    MIN_TOPIC_PROBABILITY,
    MIN_TOPICS_POLYSEMOUS,
    fit_lda,
    infer_topics,
    polysemy_flag,
    polysemy_n_topics,
    vectorize,
)
