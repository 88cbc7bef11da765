"""Backend dispatch for the MC convolution.

Three implementations, picked per conv site:
  * ``dense``  — fused dense Pallas kernel (ops/pallas/dense_conv.py): whole
    source set in VMEM, no gathers/DMAs. Best for N <= ~3k (every ModelNet/
    ShapeNet level including the global conv).
  * ``bucket`` — fused bucket Pallas kernel (ops/pallas/mcconv_kernel.py):
    ghost-grid cell windows. For big scenes where N is too large for VMEM.
  * ``jnp``    — portable reference path (core/mcconv.py). CPU/debug.

A fourth backend, ``tile`` (ops/pallas/tile_conv.py — z-order tiles, the
fastest big-scene path), needs a STATIC pair capacity and therefore is only
auto-picked when the caller configures ``SpatialCache(tile_pairs=...)``; it
can also be forced with the env var.

Force with ``MCCNN_TPU_CONV_BACKEND={dense,bucket,tile,jnp}``.
"""

from __future__ import annotations

import math
import os

import jax

_ENV = "MCCNN_TPU_CONV_BACKEND"


def conv_backend() -> str:
    forced = os.environ.get(_ENV)
    if forced in ("pallas", "bucket"):
        return "bucket"
    if forced in ("dense", "jnp", "tile"):
        return forced
    return "auto"


def pick_backend(
    n_sources: int,
    radius: float,
    c_in: int,
    c_out: int | None,
    n_samples: int | None = None,
) -> str:
    mode = conv_backend()
    if mode != "auto":
        return mode
    if jax.default_backend() != "tpu":
        return "jnp"  # interpret-mode pallas is test-only
    from .pallas.dense_conv import DENSE_MAX_N

    c_eff = max(c_in, c_out or 0, 128)
    # The dense BACKWARD holds the full sample meta + dout in VMEM and its
    # pair planes scale with the sample count — an upsampling site with few
    # sources but a huge sample side must not pick dense (observed: 289 MB
    # of VMEM at a 2k-source -> 16k-sample decoder conv).
    m = n_sources if n_samples is None else n_samples
    if (
        n_sources <= DENSE_MAX_N
        and n_sources * c_eff <= 3072 * 256
        and m * c_eff <= 8192 * 128
    ):
        return "dense"
    if math.ceil(1.0 / radius) >= 4:
        return "bucket"
    return "jnp"


def use_pallas(n_sources: int, radius: float, c_in: int, c_out: int | None):
    """Back-compat shim: True when the bucket kernel would be used."""
    return pick_backend(n_sources, radius, c_in, c_out) == "bucket"
