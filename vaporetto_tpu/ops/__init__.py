from .match import match_longest
from .score import scatter_add_scores, shift_add_scores, type_cache_scores

__all__ = [
    "match_longest",
    "scatter_add_scores",
    "shift_add_scores",
    "type_cache_scores",
]
