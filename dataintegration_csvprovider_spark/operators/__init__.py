"""Large-scale training-data pipeline operators (SURVEY.md §2.10):
dedup, similarity search, text analysis, multimodal columns."""

from .dedup import (  # noqa: F401
    dedup_exact,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    dedup_near_minhash,
    simhash,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from .similarity import (  # noqa: F401
    cosine_similarity_expr,
    knn_bruteforce,
    knn_ivf,
    embedding_near_dup_pairs,
)
from .textstats import (  # noqa: F401
    token_count,
    text_quality,
    language_id,
    doc_fingerprint,
)
