"""Data pipelines: loaders for the reference's datasets, augmentation, and the
non-uniform sampling protocols (SURVEY §2.2 utils/DataSet.py + per-task
dataset classes)."""

from . import augment, datasets, sampling_protocols, synthetic

__all__ = ["augment", "datasets", "sampling_protocols", "synthetic"]
