"""Retrieval tools: TPU-native ANN-style recommenders."""

from .ann import ItemToItemAnnRecommender, UserToItemAnnRecommender

__all__ = ["ItemToItemAnnRecommender", "UserToItemAnnRecommender"]
