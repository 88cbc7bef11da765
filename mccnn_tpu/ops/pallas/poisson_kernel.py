"""Fused Poisson-disk sweep: the whole 27-color selection in one kernel.

The XLA dense sampler (core/sampling.py) re-reads its (B, N, N) adjacency and
predecessor masks from HBM on every one of the 27 color steps (~1 GB of
traffic at N=1024). Here the pair matrices are computed once INTO VMEM from
positions and the entire sweep runs on-chip; HBM sees positions in and one
selection bitmap out.

State lives as a (N, 1) sublane vector; the per-step lane-oriented view is
produced with an identity-matrix matmul (MXU transpose — cheap, and avoids
relying on Mosaic vector-transpose support)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mcconv_kernel import (
    _COMPILER_PARAMS,
    FEAT_DTYPE,
    LANE,
    _pair_d2,
    transposed_tiles,
)

MAX_N = 1024  # (N, N) f32 pair matrices must fit VMEM


class _PSpec(NamedTuple):
    N: int
    radius: float
    interpret: bool


def _sweep_kernel(spec: _PSpec, pos_ref, pos_t_ref, cid_ref, color_ref, sel_ref):
    """pos (1,N,128); pos_t (1,8,N); cid/color (1,N,1) f32; sel out (1,N,1)."""
    N = spec.N
    pos = pos_ref[0]
    pos_t = pos_t_ref[0]
    d2 = _pair_d2(pos, pos_t)  # (N, N); i=sublane, j=lane
    adj = (d2 <= spec.radius * spec.radius).astype(jnp.float32)

    cid_s = cid_ref[0]  # (N, 1) sublane vector
    # lane views via MXU transpose with the identity
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    ).astype(jnp.float32)

    def to_lanes(v_s, exact=False):  # (N, 1) -> (1, N)
        return jax.lax.dot_general(
            v_s, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # cell ids exceed bf16's exact-integer range; 0/1 vectors don't
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )

    cid_l = to_lanes(cid_s, exact=True)
    # iota must be integer-typed on TPU; cast after
    idx_s = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).astype(jnp.float32)
    idx_l = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1).astype(jnp.float32)
    # pred[i, j]: i is a same-cell predecessor of j (valid rows only — invalid
    # points carry sentinel positions, and their cid is set to -1 by the
    # wrapper so they never match a real cell)
    pred = ((cid_s == cid_l) & (idx_s < idx_l)).astype(jnp.float32)
    color_l = to_lanes(color_ref[0])
    valid_l = to_lanes(
        (cid_s >= 0.0).astype(jnp.float32)
    )  # 1.0 where the point is real

    def body(c, state):
        # NOTE: a leaner two-matmul formulation ((1,N)@(N,N) doing transpose +
        # reduce in one op) sends Mosaic compilation into a >10 min tailspin;
        # this identity-transpose version compiles in seconds and the sweep is
        # a minor cost at model level, so it stays.
        sel_l, cov_l = state  # (1, N) f32 0/1
        unc_l = valid_l * (1.0 - cov_l)
        unc_s = jax.lax.dot_general(  # lanes -> sublanes via the identity
            eye, unc_l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 1)
        blocked_l = jnp.max(pred * unc_s, axis=0, keepdims=True)  # (1, N)
        cand_l = unc_l * (1.0 - blocked_l) * (color_l == jnp.float32(c)).astype(
            jnp.float32
        )
        sel_l = jnp.maximum(sel_l, cand_l)
        # covered: within radius of any candidate; adj[i, j] & cand[j]
        new_cov_s = jnp.max(adj * cand_l, axis=1, keepdims=True)  # (N, 1)
        cov_l = jnp.maximum(cov_l, to_lanes(new_cov_s))
        return sel_l, cov_l

    zero = jnp.zeros((1, N), jnp.float32)
    sel_l, _ = jax.lax.fori_loop(0, 27, body, (zero, zero))
    sel_ref[0] = jax.lax.dot_general(
        eye, sel_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # back to (N, 1)


def _sweep_kernel_v2(
    spec: _PSpec, pos_ref, pos_t_ref, cid_ref, color_ref, sel_ref
):
    """Sublane-domain sweep (round 4): the entire 27-color loop keeps its
    state as (N, 1) sublane vectors and replaces the v1 loop's (N, N) VPU
    elementwise passes (adj*cand + max-reduce, pred*unc + max-reduce, 3
    identity-transpose matmuls) with TWO MXU matmuls per step:

      blocked_s = pred^T @ unc_s   (dot_general contracting dim 0 with dim 0)
      new_cov_s = adj    @ cand_s  (adj is symmetric)

    0/1 vectors make max == (sum > 0), so the matmul result only needs a
    compare, and per step the VPU touches O(N) elements instead of O(N^2).

    MEASURED NEGATIVE RESULT (2026-08-19 on-chip A/B, selections bitwise
    equal): 0.825 ms vs v1's 0.291 ms at B=8 N=1024. The narrow (N,N)@(N,1)
    matmuls are MXU-latency-bound and 27 serial steps never fill the
    pipeline; v1's (N,N) elementwise+reduce passes stream at VPU rate. Kept
    behind MCCNN_POISSON_SWEEP=v2 for future compilers."""
    N = spec.N
    d2 = _pair_d2(pos_ref[0], pos_t_ref[0])  # (N, N); i=sublane, j=lane
    adj = (d2 <= spec.radius * spec.radius).astype(jnp.float32)

    cid_s = cid_ref[0]  # (N, 1)
    color_s = color_ref[0]  # (N, 1)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    ).astype(jnp.float32)
    cid_l = jax.lax.dot_general(  # one transpose OUTSIDE the loop
        cid_s, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # cell ids exceed bf16 range
    )
    idx_s = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).astype(jnp.float32)
    idx_l = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1).astype(jnp.float32)
    # pred[i, j]: i is a same-cell predecessor of j (invalid points carry
    # cid -1 from the wrapper and never match a real cell)
    pred = ((cid_s == cid_l) & (idx_s < idx_l)).astype(jnp.float32)
    valid_s = (cid_s >= 0.0).astype(jnp.float32)  # (N, 1)

    def body(c, state):
        sel_s, cov_s = state  # (N, 1) f32 0/1
        unc_s = valid_s * (1.0 - cov_s)
        blocked_s = jax.lax.dot_general(  # pred^T @ unc: (N,1) per j
            pred, unc_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cand_s = (
            unc_s
            * (1.0 - (blocked_s > 0.0).astype(jnp.float32))
            * (color_s == jnp.float32(c)).astype(jnp.float32)
        )
        sel_s = jnp.maximum(sel_s, cand_s)
        new_cov = jax.lax.dot_general(  # adj @ cand (adj symmetric)
            adj, cand_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cov_s = jnp.maximum(cov_s, (new_cov > 0.0).astype(jnp.float32))
        return sel_s, cov_s

    zero = jnp.zeros((N, 1), jnp.float32)
    sel_s, _ = jax.lax.fori_loop(0, 27, body, (zero, zero))
    sel_ref[0] = sel_s


def _sweep_kernel_v4(
    spec: _PSpec, SB: int, pos_ref, pos_t_ref, cid_ref, meta_l_ref, sel_ref,
    adj_ref, pred_ref,
):
    """Batch-folded sweep (round 5, VERDICT r4 #4): each grid step carries
    ``SB`` batch items stacked in the leading dim, so every per-color op
    processes SB items in ONE issue — attacking the measured per-op issue
    latency (~1.35 us/color-step/item) that v2/v3 pinned as the v1 floor.

    Layout: adjacency (and, for SB <= 2, the same-cell-predecessor plane)
    live as (SB, N, N) bf16 VMEM scratches built once per grid step; the
    sweep state stays in the SUBLANE domain ((SB, N, 1) vectors) and the two
    lane-domain operands per step come from width-1 ``swapaxes`` relayouts
    (Mosaic lowers these; probed on-chip 2026-08-19). Per color step the
    heavy (SB, N, N) passes are: blocked (pred mul + f32 cast + max) and
    coverage (adj mul + f32 cast + max) — comparisons all run in f32
    (Mosaic rejects bf16 cmpf); bf16 is storage + multiplies of 0/1 values
    only, exact. For SB > 2 the predecessor plane would blow the 16 MiB
    scoped VMEM, so it is rebuilt per step from cell-id compares
    (``pred_ref`` is None)."""
    N = spec.N
    r2 = spec.radius * spec.radius
    for i in range(SB):  # setup: per-item 2D planes into the 3D scratches
        d2 = _pair_d2(pos_ref[i], pos_t_ref[i])  # (N, N)
        adj_ref[i] = (d2 <= r2).astype(FEAT_DTYPE)
        if pred_ref is not None:
            cid_s = cid_ref[i]  # (N, 1)
            cid_l = meta_l_ref[i, 0:1, :]  # (1, N)
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            # pred[i, j]: lane j is a same-cell PREDECESSOR of sublane i
            # (blocked_s reduces over lanes)
            pred_ref[i] = ((cid_s == cid_l) & (iota_s > iota_l)).astype(
                FEAT_DTYPE
            )

    valid_s = (cid_ref[:] >= 0.0).astype(jnp.float32)  # (SB, N, 1)
    color_l = meta_l_ref[:, 1:2, :]  # (SB, 1, N) f32

    def body(c, state):
        sel_s, cov_s = state  # (SB, N, 1) f32 0/1
        unc_s = valid_s * (1.0 - cov_s)
        unc_l = jnp.swapaxes(unc_s, 1, 2)  # (SB, 1, N)
        if pred_ref is not None:
            # mul AND max stay bf16 (0/1 exact; a f32 cast of the (SB, N, N)
            # product blew the 16 MiB scoped-vmem stack at 24.08 MiB) —
            # only the (SB, N, 1) result is cast back
            pb = pred_ref[:] * unc_l.astype(FEAT_DTYPE)  # (SB, N, N) bf16
            blocked_s = jnp.max(pb, axis=2, keepdims=True).astype(
                jnp.float32
            )  # (SB, N, 1): any uncovered same-cell predecessor
        else:
            # bf16 multiply chain — Mosaic rejects the 3-D dual-broadcast
            # bool AND this replaces (observed on-chip, 2026-08-19)
            cid_s3 = cid_ref[:]  # (SB, N, 1)
            cid_l3 = jnp.swapaxes(cid_s3, 1, 2)
            cideq = (cid_s3 == cid_l3).astype(FEAT_DTYPE)  # (SB, N, N)
            tri = (
                jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                > jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            ).astype(FEAT_DTYPE)[None]
            pb = cideq * tri * unc_l.astype(FEAT_DTYPE)
            blocked_s = jnp.max(pb, axis=2, keepdims=True).astype(
                jnp.float32
            )
        cand_s = (
            unc_s
            * (1.0 - blocked_s)
            * (jnp.swapaxes(color_l, 1, 2) == jnp.float32(c)).astype(
                jnp.float32
            )
        )  # (SB, N, 1)
        sel_s = jnp.maximum(sel_s, cand_s)
        cand_l = jnp.swapaxes(cand_s, 1, 2)  # (SB, 1, N)
        ca = adj_ref[:] * cand_l.astype(FEAT_DTYPE)  # (SB, N, N) bf16
        new_cov = jnp.max(ca, axis=2, keepdims=True).astype(jnp.float32)
        cov_s = jnp.maximum(cov_s, new_cov)
        return sel_s, cov_s

    zero = jnp.zeros((SB, N, 1), jnp.float32)
    sel_s, _ = jax.lax.fori_loop(0, 27, body, (zero, zero))
    sel_ref[:] = sel_s


def _call_v4(spec: _PSpec, SB, pos, pos_t, cidf, colf, interpret):
    """(B, ...) operands -> (B, N) selection via SB-folded grid steps."""
    B, Np = cidf.shape
    meta_l = jnp.stack([cidf, colf], axis=1)  # (B, 2, Np) lane views
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    ix = lambda g: (g, 0, 0)
    scratch = [pltpu.VMEM((SB, Np, Np), FEAT_DTYPE)]
    if SB <= 2:
        scratch.append(pltpu.VMEM((SB, Np, Np), FEAT_DTYPE))

    def kernel(pos_ref, pos_t_ref, cid_ref, meta_ref, sel_ref, adj_ref,
               pred_ref=None):
        _sweep_kernel_v4(spec, SB, pos_ref, pos_t_ref, cid_ref, meta_ref,
                         sel_ref, adj_ref, pred_ref)

    (sel,) = pl.pallas_call(
        kernel,
        grid=(B // SB,),
        in_specs=[
            vm((SB, Np, LANE), ix),
            vm((SB, 8, Np), ix),
            vm((SB, Np, 1), ix),
            vm((SB, 2, Np), ix),
        ],
        out_specs=[vm((SB, Np, 1), ix)],
        out_shape=[jax.ShapeDtypeStruct((B, Np, 1), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
        # (SB, N, N) scratches + setup temps exceed the default 16 MiB
        # scoped-vmem budget; the shared 64 MiB cap bounds SB at 4
        compiler_params=_COMPILER_PARAMS,
    )(pos, pos_t, cidf[..., None], meta_l)
    return sel


SWEEP_WINDOW = 256  # static lane window of the color-sorted v3 sweep


def _sweep_kernel_v3(
    spec: _PSpec, starts_ref, pos_ref, pos_t_ref, cid_ref, meta_l_ref,
    sel_ref, adj_ref, cov_ref,
):
    """Color-sorted windowed sweep (round 4): points arrive sorted by
    (color, cell, index), so each color's candidates occupy one contiguous
    run. The per-color step then touches only a static W-lane window around
    that run instead of the full (N, N) plane:

      * blocked/cand: a (W, W) same-cell predecessor pass (cells are
        contiguous inside a color run),
      * coverage: an (N, W) slice of a precomputed bf16 adjacency scratch
        (bf16 halves the scratch; 0/1 values are exact).

    VPU elements per sweep drop from v1's 27 * O(N^2) to 27 * O(N*W)
    (~3x less at N=1024, W=256) — but MEASURED NEUTRAL on-chip (0.318 vs
    0.288 ms at B=8 N=1024, selections bitwise equal): the loop is bound
    by per-op issue latency, not element throughput, see the wrapper's
    variant history. Window starts are 128-aligned scalars (SMEM prefetch
    + ``pl.multiple_of`` so Mosaic can prove the lane slices legal); a
    color run longer than W falls back to the v1 kernel via the wrapper's
    lax.cond (counted outside, exact)."""
    N, W = spec.N, SWEEP_WINDOW
    b = pl.program_id(0)
    d2 = _pair_d2(pos_ref[0], pos_t_ref[0])  # (N, N) sorted domain
    # adjacency stored bf16 (0/1 exact): halves the scratch so the kernel
    # fits the 16 MiB scoped-vmem limit inside scan contexts (f32 blew it
    # at 17.41 MiB)
    adj_ref[:] = (d2 <= spec.radius * spec.radius).astype(FEAT_DTYPE)
    cov_ref[:] = jnp.zeros((N, 1), jnp.float32)
    sel_ref[0] = jnp.zeros((N, 1), jnp.float32)
    # lane views of the per-point metadata arrive precomputed from the
    # wrapper (row 0: cell id, row 1: color) — building them in-kernel via
    # constant-eye transposes needs two (N, N) iotas + an (N, N) eye live at
    # once and blew the 16 MiB scoped-vmem stack (17.09 MiB, on-chip).

    eye_w = (
        jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    ).astype(jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def body(c, _):
        # the wrapper 128-aligns every window start; the hint lets Mosaic
        # prove the lane-dim slices legal (it cannot infer it from SMEM data)
        s = pl.multiple_of(starts_ref[b, c], 128)
        cid_w = cid_ref[0, pl.ds(s, W), :]  # (W, 1)
        cov_w = cov_ref[pl.ds(s, W), :]
        valid_w = (cid_w >= 0.0).astype(jnp.float32)
        unc_w = valid_w * (1.0 - cov_w)  # (W, 1)
        cid_l = meta_l_ref[0, 0:1, pl.ds(s, W)]  # (1, W)
        col_l = meta_l_ref[0, 1:2, pl.ds(s, W)]
        pred_w = ((cid_w == cid_l) & (iota_s < iota_l)).astype(jnp.float32)
        blocked_l = jnp.max(pred_w * unc_w, axis=0, keepdims=True)  # (1, W)
        unc_l = jax.lax.dot_general(  # (W,1) -> (1,W)
            unc_w, eye_w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cand_l = (
            unc_l
            * (1.0 - blocked_l)
            * (col_l == jnp.float32(c)).astype(jnp.float32)
        )  # (1, W)
        cand_s = jax.lax.dot_general(  # back to sublanes for the window write
            eye_w, cand_l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel_ref[0, pl.ds(s, W), :] = jnp.maximum(
            sel_ref[0, pl.ds(s, W), :], cand_s
        )
        prod = adj_ref[:, pl.ds(s, W)] * cand_l.astype(FEAT_DTYPE)  # (N, W)
        new_cov = jnp.max(prod.astype(jnp.float32), axis=1, keepdims=True)
        cov_ref[:] = jnp.maximum(cov_ref[:], new_cov)
        return 0

    jax.lax.fori_loop(0, 27, body, 0)


def poisson_sweep_pallas(
    points: Array,
    mask: Array,
    cids: Array,
    colors: Array,
    radius: float,
    *,
    interpret: bool = False,
) -> Array:
    """Returns the (B, N) boolean selection of the 27-color maximal sweep."""
    B, N0, _ = points.shape
    Np = -(-N0 // 8) * 8
    pos = jnp.where(mask[..., None], points, 1.0e6)
    cidf = jnp.where(mask, cids.astype(jnp.float32), -1.0)
    colf = colors.astype(jnp.float32)
    if Np != N0:
        pos = jnp.pad(pos, ((0, 0), (0, Np - N0), (0, 0)), constant_values=1.0e6)
        cidf = jnp.pad(cidf, ((0, 0), (0, Np - N0)), constant_values=-1.0)
        colf = jnp.pad(colf, ((0, 0), (0, Np - N0)), constant_values=-2.0)
    pos = jnp.pad(pos, ((0, 0), (0, 0), (0, LANE - 3)))
    pos_t = transposed_tiles(pos, Np)

    import os

    spec = _PSpec(N=Np, radius=float(radius), interpret=interpret)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    ix = lambda b: (b, 0, 0)

    def call_v1(kernel, pos, pos_t, cidf, colf):
        (sel,) = pl.pallas_call(
            functools.partial(kernel, spec),
            grid=(B,),
            in_specs=[
                vm((1, Np, LANE), ix),
                vm((1, 8, Np), ix),
                vm((1, Np, 1), ix),
                vm((1, Np, 1), ix),
            ],
            out_specs=[vm((1, Np, 1), ix)],
            out_shape=[jax.ShapeDtypeStruct((B, Np, 1), jnp.float32)],
            interpret=interpret,
        )(pos, pos_t, cidf[..., None], colf[..., None])
        return sel

    # Variant history (2026-08-19 on-chip A/Bs, selections identical):
    #   v1 identity-transpose (N,N) VPU passes: 0.288 ms (B=8 N=1024) — DEFAULT
    #   v2 sublane/MXU matmuls: 0.825 ms — narrow serial matmuls are
    #      MXU-latency-bound; kept for future compilers
    #   v3 color-sorted W=256 windows: 0.318 ms — NEUTRAL-to-slightly-worse
    #      despite ~3x fewer VPU elements per step (O(N*W) strips vs O(N^2)
    #      planes; wrapper sort/unsort measured at only 0.014 ms). Together
    #      with the v2 result this pins the cost model: the 27-step loop is
    #      bound by per-op issue latency (~1.35 us/color-step/batch-item),
    #      not element throughput, so shrinking the planes cannot help at
    #      N=1024. Kept behind MCCNN_POISSON_SWEEP=v3: its window strips are
    #      the only variant whose VMEM and work scale subquadratically, so it
    #      is the starting point if MAX_N is ever raised past 1024.
    #   v4 batch-folded (SB, N, N) color steps (round 5): 0.586 ms at SB=2,
    #      0.758 at SB=4 vs v1's 0.316 — 1.9-2.4x SLOWER: Mosaic unrolls
    #      leading-dim-stacked 3-D ops, so the fold never reduces real issue
    #      count while its dual-domain relayouts add passes. With v2/v3 this
    #      closes the small-N sweep on every named axis (docs/ROOFLINE.md).
    variant = os.environ.get("MCCNN_POISSON_SWEEP", "v1")
    if variant == "v2":
        sel = call_v1(_sweep_kernel_v2, pos, pos_t, cidf, colf)
        return (sel[:, :N0, 0] > 0.5) & mask
    if variant.startswith("v4"):
        SB = int(variant[2:] or os.environ.get("MCCNN_POISSON_SB", "4"))
        # SB=8 holds a 16 MiB (8, N, N) bf16 adjacency + same-sized loop
        # temps: it fits the 64 MiB scoped budget on paper but sent the
        # Mosaic compile into a >20 min tailspin on-chip (2026-08-19) — cap
        # at 4, where compiles are normal.
        if SB <= 4 and B % SB == 0:
            sel = _call_v4(spec, SB, pos, pos_t, cidf, colf, interpret)
            return (sel[:, :N0, 0] > 0.5) & mask
        variant = "v1"  # batch not foldable: per-item kernel
    if variant == "v1" or Np <= SWEEP_WINDOW:
        sel = call_v1(_sweep_kernel, pos, pos_t, cidf, colf)
        return (sel[:, :N0, 0] > 0.5) & mask

    # ---- v3: sort by (color, cell, index); windows per color ----
    W = SWEEP_WINDOW
    key = jnp.where(
        cidf >= 0.0,
        colf.astype(jnp.int32) * (1 << 24) + cidf.astype(jnp.int32),
        jnp.int32(2**30),
    )
    order = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
    take = lambda x: jnp.take_along_axis(x, order, axis=-1)
    cid_s = take(cidf)
    col_s = take(colf)
    pos_s = jnp.take_along_axis(pos, order[..., None], axis=1)
    pos_t_s = transposed_tiles(pos_s, Np)

    counts = jnp.sum(
        (colf[..., None] == jnp.arange(27, dtype=colf.dtype))
        & (cidf >= 0.0)[..., None],
        axis=1,
    ).astype(jnp.int32)  # (B, 27)
    starts_x = jnp.cumsum(counts, axis=-1) - counts  # exclusive
    aligned = jnp.minimum((starts_x // 128) * 128, Np - W)
    fits = jnp.all(starts_x + counts <= aligned + W)
    starts = jnp.pad(aligned, ((0, 0), (0, 5)))  # (B, 32) SMEM-friendly

    def v3_branch(ops):
        starts, pos_s, pos_t_s, cid_s, col_s, order, _pos, _pos_t, _cid, _col = ops
        meta_l = jnp.stack([cid_s, col_s], axis=1)  # (B, 2, Np) lane views
        (sel_sorted,) = pl.pallas_call(
            functools.partial(_sweep_kernel_v3, spec),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B,),
                in_specs=[
                    vm((1, Np, LANE), lambda b, st: (b, 0, 0)),
                    vm((1, 8, Np), lambda b, st: (b, 0, 0)),
                    vm((1, Np, 1), lambda b, st: (b, 0, 0)),
                    vm((1, 2, Np), lambda b, st: (b, 0, 0)),
                ],
                out_specs=[vm((1, Np, 1), lambda b, st: (b, 0, 0))],
                scratch_shapes=[
                    pltpu.VMEM((Np, Np), FEAT_DTYPE),
                    pltpu.VMEM((Np, 1), jnp.float32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((B, Np, 1), jnp.float32)],
            interpret=interpret,
        )(starts, pos_s, pos_t_s, cid_s[..., None], meta_l)
        sel_sorted = sel_sorted[..., 0] > 0.5  # (B, Np) sorted domain

        def unsort(o, s):
            return jnp.zeros((Np,), bool).at[o].set(s)

        return jax.vmap(unsort)(order, sel_sorted)

    def v1_branch(ops):
        _starts, _ps, _pts, _cs, _cols, _order, pos, pos_t, cidf, colf = ops
        sel = call_v1(_sweep_kernel, pos, pos_t, cidf, colf)
        return sel[..., 0] > 0.5

    sel = jax.lax.cond(
        fits, v3_branch, v1_branch,
        (starts, pos_s, pos_t_s, cid_s, col_s, order, pos, pos_t, cidf, colf),
    )
    return sel[:, :N0] & mask
