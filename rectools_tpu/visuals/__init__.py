"""Jupyter visual apps."""

from .metrics_app import MetricsApp
from .visual_app import AppDataStorage, ItemToItemVisualApp, VisualApp

__all__ = ["MetricsApp", "AppDataStorage", "ItemToItemVisualApp", "VisualApp"]
