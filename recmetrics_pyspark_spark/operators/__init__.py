from .metrics import (
    coverage,
    intra_list_similarity,
    long_tail_stats,
    novelty,
    personalization,
)
from .recommend import interactions, synthetic_recommendations, top_k_per_group

__all__ = [
    "coverage",
    "novelty",
    "personalization",
    "intra_list_similarity",
    "long_tail_stats",
    "interactions",
    "synthetic_recommendations",
    "top_k_per_group",
]
