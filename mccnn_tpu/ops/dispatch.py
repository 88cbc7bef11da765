"""Backend dispatch for the MC convolution: fused Pallas bucket kernel on TPU
where profitable, jnp reference path otherwise.

The bucket kernel wins when the bucket geometry is efficient (dense clouds,
moderate grid resolution); the jnp path wins for tiny/coarse levels (e.g. the
global pooling conv, where every point is a neighbor of one sample). The
heuristic below picks per conv site; callers can force either with
``MCCNN_TPU_CONV_BACKEND={pallas,jnp}``.
"""

from __future__ import annotations

import os

import jax

_ENV = "MCCNN_TPU_CONV_BACKEND"


def conv_backend() -> str:
    forced = os.environ.get(_ENV)
    if forced in ("pallas", "jnp"):
        return forced
    return "auto"


def use_pallas(
    n_sources: int, radius: float, c_in: int, c_out: int | None
) -> bool:
    """Heuristic dispatch (auto mode)."""
    mode = conv_backend()
    if mode == "pallas":
        return True
    if mode == "jnp":
        return False
    if jax.default_backend() != "tpu":
        return False  # interpret-mode pallas is test-only
    import math

    res = math.ceil(1.0 / radius)
    # Coarse grids (global/near-global convs) and tiny levels: jnp path.
    if res < 4 or n_sources < 256:
        return False
    return True
