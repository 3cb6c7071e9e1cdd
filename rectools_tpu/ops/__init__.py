from .topk import Distance, TopKEngine, rank_topk
from .topk_sharded import ShardedTopKEngine, rank_topk_sharded

__all__ = ["Distance", "TopKEngine", "rank_topk", "ShardedTopKEngine", "rank_topk_sharded"]
