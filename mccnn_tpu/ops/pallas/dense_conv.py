"""Dense Pallas Monte-Carlo convolution — the fast path for moderate clouds.

For the point counts of most reference workloads (ModelNet/ShapeNet levels:
N <= ~3k) the entire source set — positions AND features — fits in VMEM, so
the bucket machinery (ghost grids, window DMAs) of ``mcconv_kernel.py`` is
pure overhead. This kernel keeps the same bilinear factorization and
(candidates=sublanes, samples=lanes) orientation but:

* the full source arrays are plain (auto-pipelined) VMEM inputs — zero manual
  DMAs, zero layout permutations;
* the grid is just (B * M/TM) sample tiles; every step runs full-width
  (TM=128) MXU matmuls over ALL N candidates with the in-radius mask applied
  per pair. Dense all-pairs masking costs N/~count extra multiplies — on the
  MXU that is still far cheaper than any gather-based sparsity on TPU at
  these sizes.

Backward is ONE fused pass gridded over source tiles: d/dfeatures (each
source row written exactly once — deterministic) and the parameter gradients
(accumulated across the sequentially-executed grid — bitwise reproducible)
come out of a single traversal of the pair plane, so the d2/pre/relu planes
are generated once instead of twice. Semantics are identical to
``core.mc_conv`` with unbounded neighbor capacity (exact counts, all
in-radius neighbors).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.mcconv import MCConvParams
from .mcconv_kernel import (
    _COMPILER_PARAMS,
    CNT_LANE,
    FEAT_DTYPE,
    LANE,
    W1_ROWS,
    _HI,
    _lane_mask,
    _mm,
    _pair_d2,
    transposed_tiles,
)

TILE = 256  # samples (fwd/dparam) or sources (dfeat) per grid step
DENSE_MAX_N = 3072  # beyond this, source arrays outgrow comfortable VMEM


class _DSpec(NamedTuple):
    N: int  # padded source rows
    M: int  # padded sample rows
    C: int  # channels (128-padded)
    CO: int | None
    H: int
    radius: float
    mean_norm: bool  # True: divide by neighbor count (usePDF=False mode)
    interpret: bool


def _hloop(spec, cand, t_meta, maskf, fz, w1_ref, b1_ref, w2_ref, b2_ref, co):
    """Shared forward h-loop: returns the (S, CO) accumulator (pre 1/cnt)."""
    inv_r = 1.0 / spec.radius
    cw = (
        jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * inv_r
    )  # (P, H)
    swT = (
        jax.lax.dot_general(
            w1_ref[:], t_meta, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_r
    )  # (H, S)
    S = t_meta.shape[-1]
    acc = jnp.zeros((S, co), jnp.float32)
    for h in range(spec.H):
        pre = cw[:, h : h + 1] - swT[h : h + 1, :] + b1_ref[h, 0]
        a_h = jnp.maximum(pre, 0.0) * maskf
        g_h = _mm(a_h, fz, ((0,), (0,)))  # (S, C)
        if spec.CO is None:
            acc += g_h * w2_ref[h : h + 1, :]
        else:
            acc += jnp.dot(g_h, w2_ref[h], preferred_element_type=jnp.float32)
    g_0 = _mm(maskf, fz, ((0,), (0,)))
    if spec.CO is None:
        acc += g_0 * b2_ref[:]
    else:
        acc += jnp.dot(g_0, b2_ref[:], preferred_element_type=jnp.float32)
    return acc


def _fwd_kernel(
    spec: _DSpec,
    smp_t_ref,  # (1, 8, TILE)
    src_pos_ref,  # (1, N, 128) f32 VMEM (full)
    src_feat_ref,  # (1, N, C) bf16 VMEM (full)
    w1_ref,  # (8, H)
    b1_ref,  # (H, 1)
    w2_ref,
    b2_ref,
    out_ref,  # (1, TILE, C')
    cnt_ref,  # (1, TILE, 1)
):
    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]  # (N, 128)
    d2 = _pair_d2(cand, smp_t)  # (N, TILE)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)
    cnt = jnp.sum(maskf, axis=0)
    if spec.mean_norm:
        inv = 1.0 / jnp.maximum(cnt, 1.0)
    else:
        inv = jnp.ones_like(cnt)
    CO = spec.C if spec.CO is None else spec.CO
    acc = _hloop(
        spec, cand, smp_t, maskf, src_feat_ref[0], w1_ref, b1_ref, w2_ref,
        b2_ref, CO,
    )
    out_ref[0] = acc * inv[:, None]
    cnt_ref[0] = cnt[:, None]


def _bwd_kernel(
    spec: _DSpec,
    src_t_ref,  # (1, 8, TILE) — this tile of sources, transposed
    smp_meta_ref,  # (1, M, 128) f32 VMEM (full; lane 3 = cnt)
    dout_ref,  # (1, M, C') f32 VMEM (full)
    src_feat_ref,  # (1, TILE, C) bf16 — THIS tile's weighted features
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    dfeat_ref,  # (1, TILE, C)
    dw1_ref,  # (8, H) accumulated across grid steps
    db1_ref,  # (H, 1)
    dw2_ref,  # (H, C) | (H, C, CO)
    db2_ref,  # (1, C) | (C, CO)
):
    """FUSED backward: d/dfeatures for this source tile AND parameter-grad
    contributions, in ONE pass over the pair plane. The split design (round
    1) generated the d2/pre/relu planes twice — once per backward kernel;
    fusing halves the plane work and drops a whole kernel dispatch. Each
    source slot is still written exactly once (deterministic), and the param
    grads accumulate over a sequentially-executed grid (bitwise
    reproducible)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    src_t = src_t_ref[0]
    meta = smp_meta_ref[0]  # (M, 128)
    is_cnt = _lane_mask(meta.shape, CNT_LANE)
    q = jnp.where(is_cnt, 0.0, meta)
    wc = jnp.sum(jnp.where(is_cnt, meta, 0.0), axis=1, keepdims=True)

    d2 = _pair_d2(q, src_t)  # (M, TILE)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)

    inv_r = 1.0 / spec.radius
    cwq = (
        jnp.dot(q[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * inv_r
    )  # (M, H)
    spT = (
        jax.lax.dot_general(
            w1_ref[:], src_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_r
    )  # (H, TILE)

    if spec.mean_norm:
        inv_cnt = jnp.where(wc >= 1.0, 1.0 / jnp.maximum(wc, 1.0), 0.0)
    else:
        # cnt lane only marks real rows; garbage rows pair with zero dout
        inv_cnt = jnp.ones_like(wc)
    invdout = dout_ref[0] * inv_cnt  # (M, C') f32
    fz = src_feat_ref[0]  # (TILE, C) bf16
    q8 = q[:, :W1_ROWS]  # (M, 8); rows 3.. feed dw1 rows the caller discards

    acc = jnp.zeros((TILE, spec.C), jnp.float32)
    for h in range(spec.H):
        # offset = src_p - smp_q  =>  pre_h[q, p] = spT[h, p] - cwq[q, h] + b1
        pre = spT[h : h + 1, :] - cwq[:, h : h + 1] + b1_ref[h, 0]
        relu_on = (pre > 0.0).astype(jnp.float32) * maskf
        a_h = jnp.maximum(pre, 0.0) * maskf  # (M, TILE)
        if spec.CO is None:
            t_h = invdout * w2_ref[h : h + 1, :]  # (M, C)
        else:
            t_h = jax.lax.dot_general(
                invdout, w2_ref[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (M, C)
        acc += _mm(a_h, t_h, ((0,), (0,)))  # dfeat: (TILE, C)

        # --- parameter grads (this tile's contribution) ---
        g_h = _mm(a_h, fz, ((1,), (0,)))  # (M, C): sum over tile sources
        if spec.CO is None:
            dw2_ref[h : h + 1, :] += jnp.sum(
                invdout * g_h, axis=0, keepdims=True
            )
        else:
            dw2_ref[h] += jax.lax.dot_general(
                g_h, invdout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, CO)
        da_h = _mm(t_h, fz, ((1,), (1,)))  # (M, TILE)
        dpre = da_h * relu_on
        rq = jnp.sum(dpre, axis=1, keepdims=True)  # (M, 1)
        rp = jnp.sum(dpre, axis=0, keepdims=True)  # (1, TILE)
        t_src = jax.lax.dot_general(
            src_t, rp, (((1,), (1,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # (8, 1)
        t_smp = jax.lax.dot_general(
            q8, rq, (((0,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # (8, 1)
        dw1_ref[:, h : h + 1] += (t_src - t_smp) * inv_r
        db1_ref[h : h + 1, :] += jnp.sum(dpre, keepdims=True).reshape(1, 1)

    if spec.CO is None:
        t_0 = invdout * b2_ref[:]
    else:
        t_0 = jax.lax.dot_general(
            invdout, b2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += _mm(maskf, t_0, ((0,), (0,)))
    dfeat_ref[0] = acc

    g_0 = _mm(maskf, fz, ((1,), (0,)))  # (M, C)
    if spec.CO is None:
        db2_ref[:] += jnp.sum(invdout * g_0, axis=0, keepdims=True)
    else:
        db2_ref[:] += jax.lax.dot_general(
            g_0, invdout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


# ----------------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------------


def _steps(B, rows):
    return B * (rows // TILE)


def _tile_ix(n_tiles):
    def ix(s):
        if isinstance(s, int):
            return (s // n_tiles, s % n_tiles, 0)
        n = jnp.int32(n_tiles)
        return (jax.lax.div(s, n), jax.lax.rem(s, n), 0)

    return ix


def _fwd_call(spec, B, smp_t, src_pos, src_feat, w1, b1, w2, b2):
    n_tiles = spec.M // TILE
    ix = _tile_ix(n_tiles)
    full = lambda s: (ix(s)[0], 0, 0)
    CO = spec.C if spec.CO is None else spec.CO
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(B * n_tiles,),
        in_specs=[
            vm((1, 8, TILE), ix),
            vm((1, spec.N, LANE), full),
            vm((1, spec.N, spec.C), full),
            vm(),
            vm(),
            vm(),
            vm(),
        ],
        out_specs=[vm((1, TILE, CO), ix), vm((1, TILE, 1), ix)],
        out_shape=[
            jax.ShapeDtypeStruct((B, spec.M, CO), jnp.float32),
            jax.ShapeDtypeStruct((B, spec.M, 1), jnp.float32),
        ],
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(smp_t, src_pos, src_feat, w1, b1, w2, b2)
    return out, cnt


def _bwd_call(spec, B, src_t, smp_meta, dout, src_feat, w1, b1, w2, b2):
    n_tiles = spec.N // TILE
    ix = _tile_ix(n_tiles)
    full = lambda s: (ix(s)[0], 0, 0)
    CO = spec.C if spec.CO is None else spec.CO
    const2 = lambda s: (0, 0)
    const3 = lambda s: (0, 0, 0)
    w2_shape = (spec.H, spec.C) if spec.CO is None else (spec.H, spec.C, spec.CO)
    b2_shape = (1, spec.C) if spec.CO is None else (spec.C, spec.CO)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    dfeat, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(B * n_tiles,),
        in_specs=[
            vm((1, 8, TILE), ix),
            vm((1, spec.M, LANE), full),
            vm((1, spec.M, CO), full),
            vm((1, TILE, spec.C), ix),
            vm(),
            vm(),
            vm(),
            vm(),
        ],
        out_specs=[
            vm((1, TILE, spec.C), ix),
            vm((W1_ROWS, spec.H), const2),
            vm((spec.H, 1), const2),
            vm(w2_shape, const2 if spec.CO is None else const3),
            vm(b2_shape, const2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, spec.N, spec.C), jnp.float32),
            jax.ShapeDtypeStruct((W1_ROWS, spec.H), jnp.float32),
            jax.ShapeDtypeStruct((spec.H, 1), jnp.float32),
            jax.ShapeDtypeStruct(w2_shape, jnp.float32),
            jax.ShapeDtypeStruct(b2_shape, jnp.float32),
        ],
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(src_t, smp_meta, dout, src_feat, w1, b1, w2, b2)
    return dfeat, dw1, db1, dw2, db2


# ----------------------------------------------------------------------------
# custom_vjp + public wrapper
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_core(spec, w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat):
    out, _ = _fwd_call(
        spec, smp_t.shape[0], smp_t, src_pos, src_feat, w1, b1, w2, b2
    )
    return out


def _core_fwd(spec, w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat):
    out, cnt = _fwd_call(
        spec, smp_t.shape[0], smp_t, src_pos, src_feat, w1, b1, w2, b2
    )
    return out, (w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat, cnt)


def _core_bwd(spec, res, dout):
    w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat, cnt = res
    B = smp_t.shape[0]
    is_cnt = jax.lax.broadcasted_iota(jnp.int32, smp_pos.shape, 2) == CNT_LANE
    smp_meta = jnp.where(is_cnt, cnt, smp_pos)
    dfeat, dw1, db1, dw2, db2 = _bwd_call(
        spec, B, src_t, smp_meta, dout, src_feat, w1, b1, w2, b2
    )
    return (
        dw1,
        db1,
        dw2,
        db2,
        jnp.zeros_like(smp_t),
        jnp.zeros_like(smp_pos),
        jnp.zeros_like(src_pos),
        jnp.zeros_like(src_t),
        dfeat.astype(src_feat.dtype),
    )


_dense_core.defvjp(_core_fwd, _core_bwd)


def _pad_rows(x, rows, value=0.0):
    pad = rows - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2),
                   constant_values=value)


def dense_mc_conv(
    params: MCConvParams,
    sample_pts: Array,
    sample_mask: Array,
    source_pts: Array,
    source_mask: Array,
    features: Array,
    pdf: Array,
    radius: float,
    *,
    c_out: int | None = None,
    mean_normalize: bool = False,
    interpret: bool = False,
) -> Array:
    """Fused dense MC conv (same semantics as ``core.mc_conv`` with unbounded
    neighbor capacity). Use for source counts up to ``DENSE_MAX_N``."""
    B, M0, _ = sample_pts.shape
    N0 = source_pts.shape[1]
    H = params.w1.shape[1]
    C = features.shape[-1]
    Cp = -(-C // LANE) * LANE
    COp = None if c_out is None else -(-c_out // LANE) * LANE
    Mp = -(-M0 // TILE) * TILE
    Np = -(-N0 // TILE) * TILE  # dfeat grids over source tiles too

    # positions: 128-lane convention, sentinels on invalid/padded slots
    def prep(pts, mask, rows, sentinel):
        p = jnp.where(mask[..., None], pts, sentinel)
        p = _pad_rows(p, rows, value=sentinel)
        return jnp.pad(p, ((0, 0), (0, 0), (0, LANE - 3)))

    smp_pos = prep(sample_pts, sample_mask, Mp, 1.0e6)
    src_pos = prep(source_pts, source_mask, Np, -1.0e6)

    wf = features / pdf[..., None]
    wf = jnp.where(source_mask[..., None], wf, 0.0)
    if Cp != C:
        wf = jnp.pad(wf, ((0, 0), (0, 0), (0, Cp - C)))
    src_feat = _pad_rows(wf, Np).astype(FEAT_DTYPE)

    w1 = jnp.pad(params.w1, ((0, W1_ROWS - 3), (0, 0)))
    b1 = params.b1.reshape(H, 1)
    if c_out is None:
        w2 = jnp.pad(params.w2, ((0, 0), (0, Cp - C)))
        b2 = jnp.pad(params.b2.reshape(1, C), ((0, 0), (0, Cp - C)))
    else:
        w2 = jnp.pad(
            params.w2.reshape(H, C, c_out),
            ((0, 0), (0, Cp - C), (0, COp - c_out)),
        )
        b2 = jnp.pad(params.b2.reshape(C, c_out), ((0, Cp - C), (0, COp - c_out)))

    spec = _DSpec(
        N=Np, M=Mp, C=Cp, CO=COp, H=H, radius=float(radius),
        mean_norm=mean_normalize, interpret=interpret,
    )
    smp_t = transposed_tiles(smp_pos, TILE)
    src_t = transposed_tiles(src_pos, TILE)

    out = _dense_core(
        spec, w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat
    )
    out = out[:, :M0, : (C if c_out is None else c_out)]
    return jnp.where(sample_mask[..., None], out, 0.0)
