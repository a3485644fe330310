from .scorer import (
    init_scorer,
    user_embed,
    item_tower,
    score_pairs,
    scorer_forward,
)

__all__ = [
    "init_scorer",
    "user_embed",
    "item_tower",
    "score_pairs",
    "scorer_forward",
]
