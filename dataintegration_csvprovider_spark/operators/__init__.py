"""Large-scale training-data pipeline operators (SURVEY.md §2.10):
dedup, similarity search, text analysis, multimodal columns."""

from .dedup import (  # noqa: F401
    containment_pairs,
    dedup_exact,
    dedup_near_minhash,
    dedup_spans_across_corpus,
    exact_substring_decontaminate,
    exact_substring_dedup,
    incremental_near_dup_flags,
    lsh_candidate_pairs,
    ngram_jaccard_cross_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from .pq import (  # noqa: F401
    knn_ivfpq,
    pq_adc_topk,
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)
from .sampling import apportion_mixture, temperature_sample  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_similarity_expr,
    embedding_near_dup_pairs,
    knn_batch,
    knn_bruteforce,
    knn_ivf,
)
from .textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    repetition_stats,
    text_quality,
    token_count,
)
