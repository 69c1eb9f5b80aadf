from gags_tpu.query.relevancy import (
    relevancy,
    max_across_levels,
    box_filter_reflect101,
    heatmap_to_mask,
    majority_smooth,
    DEFAULT_NEGATIVES,
)

__all__ = [
    "relevancy",
    "max_across_levels",
    "box_filter_reflect101",
    "heatmap_to_mask",
    "majority_smooth",
    "DEFAULT_NEGATIVES",
]
