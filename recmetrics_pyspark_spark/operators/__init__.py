from .dedup import (
    dup_ngram_fraction,
    exact_dedup,
    minhash_jaccard_estimate,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalized_dedup,
    simhash_near_pairs,
    simhash_signatures,
)
from .cdc import rollup_merge, snapshot_diff
from .graph import pagerank_from_edges
from .joins import asof_join, range_self_join
from .metrics import (
    coverage,
    item_cooccurrence_pairs,
    item_item_topk,
    item_similarity_pairs,
    intra_list_similarity,
    long_tail_stats,
    novelty,
    personalization,
)
from .quality import (
    check_columns,
    check_foreign_key,
    check_unique,
    run_checks,
)
from .recommend import (
    interactions,
    item_based_recommendations,
    ranking_metrics_at_k,
    synthetic_recommendations,
    top_k_per_group,
)
from .similarity import (
    ann_bruteforce_topk,
    embedding_gram,
    embedding_near_duplicates,
    embedding_pca,
    ivfpq_ann_topk,
    pq_ann_topk,
    pq_codebooks,
)
from .skew import key_skew_stats, salted_join

__all__ = [
    "snapshot_diff",
    "rollup_merge",
    "check_columns",
    "check_unique",
    "check_foreign_key",
    "run_checks",
    "ranking_metrics_at_k",
    "item_based_recommendations",
    "embedding_pca",
    "dup_ngram_fraction",
    "key_skew_stats",
    "coverage",
    "novelty",
    "personalization",
    "intra_list_similarity",
    "long_tail_stats",
    "interactions",
    "synthetic_recommendations",
    "top_k_per_group",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_pairs",
    "ann_bruteforce_topk",
    "ivfpq_ann_topk",
    "pq_ann_topk",
    "pq_codebooks",
    "embedding_near_duplicates",
    "asof_join",
    "range_self_join",
    "salted_join",
]
