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


def dense_fits(n_sources: int, c_in: int, c_out: int | None,
               n_samples: int | None = None) -> bool:
    """VMEM-envelope gate for the dense kernel (v2, batched scratches).

    The fused BACKWARD grids over source tiles and holds, per grid step,
    the full sample-side working set in VMEM: the stacked pair-plane scratch
    ``abig`` ((H+1)*M, TILE) bf16, the hoisted ``D`` matmul output
    (H*M, TILE) f32, and ``tbig`` (H*M, C') bf16 — with H=8, TILE=256,
    C'=128 that is ~14.8 KiB per sample row, so M is capped at ~3k against
    the 64 MiB scoped-vmem limit. Found the hard way (round 4): an 8192-
    sample decoder conv (2k sources -> dense by the old bound) failed
    Mosaic compilation with a 122.89 MiB stack allocation. Sites beyond the
    cap route to bucket (capacity-free) or tile (when a pair capacity is
    configured — MCConv promotes bucket->tile)."""
    from .pallas.dense_conv import DENSE_MAX_N

    c_eff = max(c_in, c_out or 0, 128)
    m = n_sources if n_samples is None else n_samples
    return (
        n_sources <= DENSE_MAX_N
        and n_sources * c_eff <= 3072 * 256
        and m * c_eff <= 3072 * 128
    )


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
    if dense_fits(n_sources, c_in, c_out, n_samples):
        return "dense"
    if math.ceil(1.0 / radius) >= 4:
        return "bucket"
    return "jnp"


def use_pallas(n_sources: int, radius: float, c_in: int, c_out: int | None):
    """Back-compat shim: True when the bucket kernel would be used."""
    return pick_backend(n_sources, radius, c_in, c_out) == "bucket"
