from .relational import per_group_first, topk_per_group  # noqa: F401
from .evaluation import confusion_matrix, classification_metrics  # noqa: F401
from .dedup import (  # noqa: F401
    add_simhash,
    dedup_stats,
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
)
from .similarity_search import knn_bruteforce  # noqa: F401
