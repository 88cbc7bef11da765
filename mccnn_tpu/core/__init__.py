"""Core spatial ops: grid indexing, radius neighbors, KDE pdf, Poisson-disk
sampling and the Monte-Carlo convolution (jnp reference implementations)."""

from .gather import batched_gather, masked_mean
from .grid import (
    cell_color27,
    cell_coords,
    compute_aabb,
    grid_res_for_radius,
    linear_cell_ids,
    normalize_to_unit_cube,
)
from .mcconv import KERNEL_HIDDEN, MCConvParams, init_mcconv_params, mc_conv
from .neighbors import Neighborhood, radius_neighbors, self_neighbors
from .pdf import kde_density
from .sampling import SampleSet, gather_sampled, poisson_disk

__all__ = [
    "KERNEL_HIDDEN",
    "MCConvParams",
    "Neighborhood",
    "SampleSet",
    "batched_gather",
    "cell_color27",
    "cell_coords",
    "compute_aabb",
    "gather_sampled",
    "grid_res_for_radius",
    "init_mcconv_params",
    "kde_density",
    "linear_cell_ids",
    "masked_mean",
    "mc_conv",
    "normalize_to_unit_cube",
    "poisson_disk",
    "radius_neighbors",
    "self_neighbors",
]
