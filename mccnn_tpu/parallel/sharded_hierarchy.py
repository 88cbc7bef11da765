"""Multi-level point-hierarchy construction under spatial sharding.

The reference handles huge scenes by chopping them into independent CPU
blocks (SURVEY §5.7), losing all cross-block context; this module builds the
multi-level Poisson hierarchy with the point set sharded into x-slabs across
a mesh axis:

  * Hierarchy levels are NESTED MASKS over the shard's point array — points
    never move, so no gathers/compaction anywhere (TPU-hostile), and every
    level's geometry stays in global coordinates for the halo machinery.
  * Each level l+1 is a ``sharded_poisson_disk`` selection of level l at
    ``radii[l]`` (exact global min-distance; ~2r coverage at slab boundaries).

The network that consumes these levels is the real flax ``MCSeg`` run by
``parallel/sharded_mcseg.py`` (round 4 replaced the earlier bespoke
``ShardedMCSegParams`` net, which had no BN/dropout and hard-coded radii —
see that module's docstring and PARITY.md).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import Array

from .sharded_sampling import sharded_poisson_disk


def sharded_build_levels(
    points: Array,  # (N_shard, 3) GLOBAL coordinates
    mask: Array,  # (N_shard,)
    radii: Sequence[float],
    shard_lo: Array,
    shard_hi: Array,
    halo_cap: int,
    axis_name: str,
) -> tuple[list, Array]:
    """Nested level masks: level 0 = ``mask``; level l+1 = boundary-reconciled
    Poisson selection of level l at ``radii[l]``. Returns (masks, overflow) —
    nonzero overflow means ``halo_cap`` was too small (ADVICE r1: surfaced,
    not swallowed)."""
    masks = [mask]
    overflow = jnp.zeros((), jnp.int32)
    for r in radii:
        sel, ovf = sharded_poisson_disk(
            points, masks[-1], float(r), shard_lo, shard_hi, halo_cap,
            axis_name,
        )
        masks.append(sel)
        overflow = overflow + ovf
    return masks, overflow
