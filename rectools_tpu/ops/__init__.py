from .topk import Distance, TopKEngine, rank_topk

__all__ = ["Distance", "TopKEngine", "rank_topk"]
