"""Graph-builder API: PointHierarchy + spatial-query cache (the reference's
utils/MCConvBuilder.py layer — SURVEY §2.2)."""

from .builder import SpatialCache
from .hierarchy import (
    GLOBAL_RADIUS,
    HierarchyLevel,
    PointHierarchy,
    build_hierarchy,
    default_level_caps,
)

__all__ = [
    "GLOBAL_RADIUS",
    "HierarchyLevel",
    "PointHierarchy",
    "SpatialCache",
    "build_hierarchy",
    "default_level_caps",
]
