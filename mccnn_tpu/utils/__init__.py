"""Utilities: point-cloud IO and visualization (reference utils/PyUtils.py)."""

from .io import (
    label_colors,
    read_ply,
    read_points_txt,
    save_normals_ply,
    save_segmentation_ply,
    write_ply,
    write_points_txt,
)

__all__ = [
    "label_colors",
    "read_ply",
    "read_points_txt",
    "save_normals_ply",
    "save_segmentation_ply",
    "write_ply",
    "write_points_txt",
]
