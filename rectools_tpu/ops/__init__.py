from .topk import Distance, TopKEngine, exact_top_k, rank_topk
from .topk_select import grouped_exact_top_k
from .topk_sharded import ShardedTopKEngine, rank_topk_sharded

__all__ = [
    "Distance",
    "TopKEngine",
    "exact_top_k",
    "grouped_exact_top_k",
    "rank_topk",
    "ShardedTopKEngine",
    "rank_topk_sharded",
]
