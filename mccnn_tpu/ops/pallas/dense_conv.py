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
import os
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
# Batched (v2) kernels.
#
# The round-2 kernel interleaved VPU plane generation with 9 (fwd) / 26 (bwd)
# SMALL matmuls per grid step. Here the per-h loop ONLY writes pair planes
# into a stacked ((H+1)*rows, TILE) bf16 VMEM scratch (block H = the radius
# mask, which carries the h-independent b2 term), and the MXU work is
# restructured around per-h FEATURE/COTANGENT copies built once per cloud
# into persistent scratch (they don't depend on the grid step):
#
#   fwd:  out = sum_h a_h^T (f*w2_h) + mask^T (f*b2) = Abig^T @ Fcat
#         with Fcat = stack_h[f*w2_h] ++ [f*b2] — ONE (H+1)N-deep matmul.
#   bwd:  X_h = a_h^T @ invdout  (H+1 well-shaped matmuls) serves BOTH
#           dfeat = sum_h X_h*w2_h + X_H*b2  and  dw2_h = sum_p f ⊙ X_h;
#         D = Tbig @ f^T with Tbig = stack_h[invdout*w2_h] feeds dw1/db1 via
#           dpre = D * (Abig>0) — relu mask recovered from the stored plane
#           (v1's separate relu_on plane is gone; compare runs in f32).
#
# (CO != None generalizes: Fcat_h = f @ w2_h, Tbig_h = invdout @ w2_h^T,
# dfeat/dw2 via small per-h matmuls on X_h.)
#
# Measured on-chip (B=8, N=M=1024, C=128, fwd+bwd, 2026-08-17): 0.745 ms
# (v1) -> 0.606 ms. Forward is VPU/MXU-serialized at ~0.22 ms (matmul floor
# 0.117 + plane VPU ~0.09; no co-issue observed) — see docs/ROUND3.md.
# ----------------------------------------------------------------------------

_NEG = -1.0e9  # additive out-of-radius penalty: relu(pre + _NEG) == 0


def _plane_fill(spec, rows, cand, other_t, w1_ref, b1t, sign, abig_ref, pen,
                maskf):
    """Write the (H+1) stacked pair planes for this grid step.

    ``pre_h = sign * (cand . w1_h - other_t . w1_h) + b1_h`` with the
    out-of-radius penalty folded in additively (no per-h mask multiply).
    Planes are stored in bf16 (the matmuls consume bf16 anyway — an f32
    scratch would pay an extra full-plane cast at every matmul use) but
    COMPUTED in f32: the relu boundary sits on a cancellation ``cw - owT`` of
    O(1) operands, and bf16 arithmetic there moves the boundary by ~eps(bf16)
    ≈ 0.004, visibly corrupting dw1 (measured: 3x relative error)."""
    inv_r = 1.0 / spec.radius
    cw = (
        jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * (sign * inv_r)
        + b1t
    )  # (rows_axis, H), b1 folded
    owT = (
        jax.lax.dot_general(
            w1_ref[:], other_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * (sign * inv_r)
    )  # (H, TILE)
    for h in range(spec.H):
        pre = cw[:, h : h + 1] - owT[h : h + 1, :] + pen
        abig_ref[h * rows : (h + 1) * rows, :] = jnp.maximum(pre, 0.0).astype(
            FEAT_DTYPE
        )
    abig_ref[spec.H * rows :, :] = maskf.astype(FEAT_DTYPE)


def _plane_fill_mxu(spec, rows, cand, other_t, w1_ref, b1t, sign, abig_ref,
                    pen, maskf):
    """VERDICT r3 #5 variant: generate each pre-plane with a K=2 MXU matmul
    ``[cw_h | 1] @ [[1...1], [-owT_h]]`` instead of the VPU broadcast
    subtract, keeping the penalty add + relu + cast on the VPU.

    MEASURED NEGATIVE RESULT (2026-08-19 on-chip A/B, full fwd+bwd at the
    bench config): 0.611 ms vs the VPU baseline's 0.569 ms. Offloading the
    subtract buys nothing because VPU and MXU strictly serialize under this
    Mosaic (docs/ROOFLINE.md round-3 co-issue probe) and eight K=2 matmuls
    per grid step are latency-bound — the same failure signature as the
    poisson sweep v2 A/B the same day. With this, the round-3 serialized
    floor analysis, and the carry-reuse option ruled out by VMEM capacity
    (H+1 planes of (N, M) bf16 = 18 MB/cloud), the dense kernel is CLOSED at
    ~0.55 ms/layer ≈ 93 % of its serialized floor; big-scene throughput
    discussion lives on the 32k tile line. Behind MCCNN_DENSE_PLANES=mxu."""
    inv_r = 1.0 / spec.radius
    cw = (
        jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * (sign * inv_r)
        + b1t
    )  # (rows, H)
    owT = (
        jax.lax.dot_general(
            w1_ref[:], other_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * (sign * inv_r)
    )  # (H, TILE)
    ones_col = jnp.ones((rows, 1), jnp.float32)
    ones_row = jnp.ones((1, other_t.shape[-1]), jnp.float32)
    for h in range(spec.H):
        lhs = jnp.concatenate([cw[:, h : h + 1], ones_col], axis=1)  # (rows,2)
        rhs = jnp.concatenate([ones_row, -owT[h : h + 1, :]], axis=0)  # (2,S)
        pre = (
            jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + pen
        )
        abig_ref[h * rows : (h + 1) * rows, :] = jnp.maximum(pre, 0.0).astype(
            FEAT_DTYPE
        )
    abig_ref[spec.H * rows :, :] = maskf.astype(FEAT_DTYPE)


_PLANES_MXU = os.environ.get("MCCNN_DENSE_PLANES") == "mxu"


def _fwd_kernel_b(
    spec: _DSpec,
    n_tiles: int,
    smp_t_ref,  # (1, 8, TILE)
    src_pos_ref,  # (1, N, 128) f32 VMEM (full)
    src_feat_ref,  # (1, N, C') bf16 VMEM (full)
    w1_ref,  # (8, H)
    b1t_ref,  # (1, H)
    w2_ref,  # (H, C') | (H, C', CO')
    b2_ref,  # (1, C') | (C', CO')
    out_ref,  # (1, TILE, CO')
    cnt_ref,  # (1, TILE, 1)
    abig_ref,  # ((H+1)*N, TILE) bf16 scratch
    fcat_ref,  # ((H+1)*N, CO') bf16 scratch — built on each cloud's 1st step
):
    step = pl.program_id(0)

    @pl.when(jax.lax.rem(step, jnp.int32(n_tiles)) == 0)
    def _build_fcat():
        # fold w2/b2 into per-h feature copies (constant across the cloud's
        # sample tiles — scratch persists between grid steps)
        fz = src_feat_ref[0]  # (N, C') bf16
        N, H = spec.N, spec.H
        for h in range(H):
            if spec.CO is None:
                fcat_ref[h * N : (h + 1) * N, :] = (
                    fz * w2_ref[h : h + 1, :].astype(FEAT_DTYPE)
                )
            else:
                fcat_ref[h * N : (h + 1) * N, :] = jnp.dot(
                    fz, w2_ref[h].astype(FEAT_DTYPE),
                    preferred_element_type=jnp.float32,
                ).astype(FEAT_DTYPE)
        if spec.CO is None:
            fcat_ref[H * N :, :] = fz * b2_ref[:].astype(FEAT_DTYPE)
        else:
            fcat_ref[H * N :, :] = jnp.dot(
                fz, b2_ref[:].astype(FEAT_DTYPE),
                preferred_element_type=jnp.float32,
            ).astype(FEAT_DTYPE)

    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]  # (N, 128)
    d2 = _pair_d2(cand, smp_t)  # (N, TILE)
    maskb = d2 <= spec.radius * spec.radius
    maskf = maskb.astype(jnp.float32)
    cnt = jnp.sum(maskf, axis=0)
    pen = jnp.where(maskb, 0.0, _NEG)
    # fwd orientation: offset = cand_p - smp_s => cand carries +, sample -
    fill = _plane_fill_mxu if _PLANES_MXU else _plane_fill
    fill(
        spec, spec.N, cand, smp_t, w1_ref, b1t_ref[:], 1.0, abig_ref, pen,
        maskf,
    )
    acc = _mm(abig_ref[:], fcat_ref[:], ((0,), (0,)))  # (TILE, CO')
    if spec.mean_norm:
        inv = 1.0 / jnp.maximum(cnt, 1.0)
        acc = acc * inv[:, None]
    out_ref[0] = acc
    cnt_ref[0] = cnt[:, None]


def _bwd_kernel_b(
    spec: _DSpec,
    n_tiles: int,
    src_t_ref,  # (1, 8, TILE) — this tile of sources, transposed
    smp_pos_ref,  # (1, M, 128) f32 VMEM (full)
    invdout_ref,  # (1, M, CO') bf16 VMEM (full) — dout * 1/cnt (or dout)
    src_feat_ref,  # (1, TILE, C') bf16 — THIS tile's weighted features
    w1_ref,  # (8, H)
    b1t_ref,  # (1, H)
    w2_ref,  # (H, C') | (H, C', CO')
    b2_ref,  # (1, C') | (C', CO')
    dfeat_ref,  # (1, TILE, C')
    dw1_ref,  # (8, H) accumulated across grid steps
    db1_ref,  # (H, 1)
    dw2_ref,  # (H, C') | (H, C', CO')
    db2_ref,  # (1, C') | (C', CO')
    abig_ref,  # ((H+1)*M, TILE) bf16 scratch
    tbig_ref,  # (H*M, C') bf16 scratch — built on each cloud's 1st step
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    H, M = spec.H, spec.M

    @pl.when(jax.lax.rem(step, jnp.int32(n_tiles)) == 0)
    def _build_tbig():
        # only the H dw1 planes need t_h = invdout * w2_h; the b2 term's
        # dfeat/db2 contributions come out of the Xh loop below
        iv = invdout_ref[0]  # (M, CO') bf16
        for h in range(H):
            if spec.CO is None:
                tbig_ref[h * M : (h + 1) * M, :] = iv * w2_ref[
                    h : h + 1, :
                ].astype(FEAT_DTYPE)
            else:
                tbig_ref[h * M : (h + 1) * M, :] = jax.lax.dot_general(
                    iv,
                    w2_ref[h].astype(FEAT_DTYPE),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(FEAT_DTYPE)
    src_t = src_t_ref[0]  # (8, TILE)
    q = smp_pos_ref[0]  # (M, 128)
    d2 = _pair_d2(q, src_t)  # (M, TILE)
    maskb = d2 <= spec.radius * spec.radius
    pen = jnp.where(maskb, 0.0, _NEG)
    fz = src_feat_ref[0]  # (TILE, C') bf16
    ivd = invdout_ref[0]  # (M, CO') bf16
    fzf = fz.astype(jnp.float32)

    # D is hoisted BEFORE the plane loop so dpre_h = step(pre_h) * D_h can be
    # taken while pre_h is still live in f32 registers — v2 re-read the bf16
    # plane and re-derived the relu mask (cast + compare + cast + multiply
    # over the full (HM, TILE) stack); fusing drops those passes. The step()
    # boundary stays in f32 (pre>0 on the f32 plane — see _plane_fill).
    D = _mm(tbig_ref[: H * M, :], fz, ((1,), (1,)))  # (HM, TILE)
    inv_r = 1.0 / spec.radius
    # bwd orientation: offset = src_p - smp_q => sample carries -, src +
    cw = (
        jnp.dot(q[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * (-inv_r)
        + b1t_ref[:]
    )  # (M, H)
    owT = (
        jax.lax.dot_general(
            w1_ref[:], src_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * (-inv_r)
    )  # (H, TILE)
    rq_l, rp_l = [], []
    for h in range(H):
        pre = cw[:, h : h + 1] - owT[h : h + 1, :] + pen
        abig_ref[h * M : (h + 1) * M, :] = jnp.maximum(pre, 0.0).astype(
            FEAT_DTYPE
        )
        dh = jnp.where(pre > 0.0, D[h * M : (h + 1) * M, :], 0.0)
        rq_l.append(jnp.sum(dh, axis=1))  # (M,)
        rp_l.append(jnp.sum(dh, axis=0))  # (TILE,)
    abig_ref[H * M :, :] = maskb.astype(FEAT_DTYPE)
    A = abig_ref[:]  # ((H+1)M, TILE) bf16

    # Xh scheme: X_h = a_h^T @ invdout carries BOTH the dfeat contribution
    # (X_h * w2_h summed over h) and the dw2_h contribution (sum_p fz ⊙ X_h)
    # — one 604 MF matmul family instead of the two (dfeat-direct + G) of
    # the first batched version: backward MXU FLOPs down 35 %.
    acc = jnp.zeros((TILE, spec.C), jnp.float32)  # dfeat
    for h in range(H + 1):
        blk = A[h * M : (h + 1) * M, :]  # (M, TILE) bf16
        X = jax.lax.dot_general(
            blk, ivd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, CO')
        if spec.CO is None:
            row = w2_ref[h : h + 1, :] if h < H else b2_ref[:]
            acc += X * row
            s = jnp.sum(fzf * X, axis=0, keepdims=True)  # (1, C)
            if h < H:
                dw2_ref[h : h + 1, :] += s
            else:
                db2_ref[:] += s
        else:
            wmat = w2_ref[h] if h < H else b2_ref[:]  # (C, CO)
            acc += jax.lax.dot_general(
                X, wmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE, C)
            g = jax.lax.dot_general(
                fzf, X, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, CO)
            if h < H:
                dw2_ref[h] += g
            else:
                db2_ref[:] += g
    dfeat_ref[0] = acc

    rq = jnp.stack(rq_l, axis=0)  # (H, M)
    rp = jnp.stack(rp_l, axis=0)  # (H, TILE)
    t_smp = jax.lax.dot_general(
        q[:, :W1_ROWS], rq, (((0,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )  # (8, H)
    t_src = jax.lax.dot_general(
        src_t, rp, (((1,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )  # (8, H)
    dw1_ref[:] += (t_src - t_smp) * inv_r
    db1_ref[:] += jnp.sum(rp, axis=1, keepdims=True)


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


def _fwd_call_b(spec, B, smp_t, src_pos, src_feat, w1, b1t, w2, b2):
    n_tiles = spec.M // TILE
    ix = _tile_ix(n_tiles)
    full = lambda s: (ix(s)[0], 0, 0)
    CO = spec.C if spec.CO is None else spec.CO
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel_b, spec, n_tiles),
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
        scratch_shapes=[
            pltpu.VMEM(((spec.H + 1) * spec.N, TILE), FEAT_DTYPE),
            pltpu.VMEM(((spec.H + 1) * spec.N, CO), FEAT_DTYPE),
        ],
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(smp_t, src_pos, src_feat, w1, b1t, w2, b2)
    return out, cnt


def _bwd_call_b(spec, B, src_t, smp_pos, invdout, src_feat, w1, b1t, w2, b2):
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
        functools.partial(_bwd_kernel_b, spec, n_tiles),
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
        scratch_shapes=[
            pltpu.VMEM(((spec.H + 1) * spec.M, TILE), FEAT_DTYPE),
            pltpu.VMEM((spec.H * spec.M, spec.C), FEAT_DTYPE),
        ],
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(src_t, smp_pos, invdout, src_feat, w1, b1t, w2, b2)
    return dfeat, dw1, db1, dw2, db2


# ----------------------------------------------------------------------------
# custom_vjp + public wrapper
# ----------------------------------------------------------------------------


# v1 (per-h small matmuls) kept as a fallback: MCCNN_DENSE_V1=1
_USE_V1 = os.environ.get("MCCNN_DENSE_V1") == "1"


def _run_fwd(spec, w1, b1, w2, b2, smp_t, src_pos, src_feat):
    B = smp_t.shape[0]
    if _USE_V1:
        return _fwd_call(spec, B, smp_t, src_pos, src_feat, w1, b1, w2, b2)
    b1t = b1.reshape(1, spec.H)
    return _fwd_call_b(spec, B, smp_t, src_pos, src_feat, w1, b1t, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_core(spec, w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat):
    out, _ = _run_fwd(spec, w1, b1, w2, b2, smp_t, src_pos, src_feat)
    return out


def _core_fwd(spec, w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat):
    out, cnt = _run_fwd(spec, w1, b1, w2, b2, smp_t, src_pos, src_feat)
    return out, (w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat, cnt)


def _core_bwd(spec, res, dout):
    w1, b1, w2, b2, smp_t, smp_pos, src_pos, src_t, src_feat, cnt = res
    B = smp_t.shape[0]
    if _USE_V1:
        is_cnt = (
            jax.lax.broadcasted_iota(jnp.int32, smp_pos.shape, 2) == CNT_LANE
        )
        smp_meta = jnp.where(is_cnt, cnt, smp_pos)
        dfeat, dw1, db1, dw2, db2 = _bwd_call(
            spec, B, src_t, smp_meta, dout, src_feat, w1, b1, w2, b2
        )
    else:
        if spec.mean_norm:
            invdout = dout * jnp.where(cnt >= 1.0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
        else:
            invdout = dout  # garbage rows carry zero cotangent already
        b1t = b1.reshape(1, spec.H)
        dfeat, dw1, db1, dw2, db2 = _bwd_call_b(
            spec, B, src_t, smp_pos, invdout.astype(FEAT_DTYPE), src_feat,
            w1, b1t, w2, b2,
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
