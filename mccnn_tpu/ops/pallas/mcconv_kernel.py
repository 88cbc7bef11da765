"""Fused bucket-dense Monte-Carlo convolution — the framework's hot Pallas op.

Reference parity (viscom-ulm/MCCNN): ``tf_ops/spatial_conv.*`` (``SpatialConv``
+ ``SpatialConvGrad``, SURVEY §2.1) — but redesigned for the TPU memory model
instead of translated:

* The CUDA kernel walks a CSR neighbor list and does per-neighbor global-memory
  gathers + atomicAdd backward. TPUs have neither efficient arbitrary gathers
  nor atomics, so here BOTH point sets live in a dense ghost-padded cell-bucket
  layout (core/buckets.py) and the kernel touches memory only through dense,
  lane-aligned async DMAs.
* Each grid step processes a 2x2x2 BLOCK of sample cells (block-major sample
  layout, built by a static permutation of the z-major bucket rows): with cell
  capacity 16 that is 128 samples per step — full MXU-width matmuls — and the
  source window is the surrounding 4x4x4 cells, fetched as 16 contiguous
  z-runs per operand. Window DMAs are double-buffered across grid steps so
  DMA latency hides behind MXU work.
* Per-pair kernel-MLP work is bilinearly factorized (see core/mcconv.py):
  ``pre_h[p, s] = (cand_p - smp_s)/r . W1_h + b1_h = cw_h[p] - sw_h[s] + b1_h``
  splits into per-point projections, so each hidden unit h contributes one
  dense MXU matmul ``G_h = relu(pre_h)^T @ feats`` over the shared candidate
  window — no (pairs, C) tensor ever exists, in HBM *or* VMEM.
* Distances are computed per-axis on the VPU from a transposed sample-position
  block (exact f32 — no bf16 matmul passes near the radius boundary, and no
  HIGHEST-precision matmul cost).
* Features run in bf16 on the MXU with f32 accumulation (standard practice).
* Backward needs no atomics: d/dfeatures runs a second pass gridded over
  SOURCE cell blocks (each source slot is written exactly once —
  deterministic, bitwise-reproducible gradients, unlike the reference's
  atomicAdd); parameter gradients accumulate into a constant-index output
  block across grid steps.

Point positions are not differentiated (positions are data, not parameters —
same as the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.buckets import BucketGrid, bucketize
from ...core.mcconv import MCConvParams

_HI = jax.lax.Precision.HIGHEST
LANE = 128
CNT_LANE = 3  # lane of the backward meta array carrying the neighbor count
FEAT_DTYPE = jnp.bfloat16
W1_ROWS = 8  # xyz in rows 0..2, zeros elsewhere (row 3 guards the |p|^2 slot)

# Big-scene configs (cap=64) put the pair planes just past Mosaic's default
# 16 MiB scoped-VMEM budget; v5e has 128 MiB physical VMEM, so raise it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


class _Spec(NamedTuple):
    """Static kernel configuration (all dims pre-padded to TPU tiles)."""

    R: int  # real grid resolution (cells per axis; EVEN)
    CP: int  # source cell capacity (multiple of 8)
    CS: int  # sample cell capacity (multiple of 8)
    C: int  # input channels (multiple of 128)
    CO: int | None  # None => depthwise; else multiple of 128
    H: int  # kernel-MLP hidden width
    radius: float
    mean_norm: bool  # True: divide by neighbor count (usePDF=False mode)
    interpret: bool
    BZ: int = 2  # z-cells per block ("z-brick"); must divide R
    NBA: int | None = None  # active-brick steps per cloud (None: dense sweep)

    # A block is a 2x2xBZ cell BRICK. Big scenes have small cell capacities
    # (occupancy ~4-8), so the round-1 fixed 2x2x2 block starved the MXU lane
    # dimension (SB = 8*cap < 128); stretching the block along z keeps the
    # SAME 16 window DMAs per operand (each one contiguous z-run, just
    # longer) while restoring full-width tiles.

    @property
    def nbx(self) -> int:  # 2-cell blocks per x/y axis
        return self.R // 2

    @property
    def nbz(self) -> int:  # BZ-cell bricks per z axis
        return self.R // self.BZ

    @property
    def n_blocks(self) -> int:
        return self.nbx * self.nbx * self.nbz

    @property
    def SB(self) -> int:  # samples per block
        return 4 * self.BZ * self.CS

    @property
    def PB(self) -> int:  # sources per block (bwd pass)
        return 4 * self.BZ * self.CP

    @property
    def WIN_P(self) -> int:  # source-window rows in fwd
        return 16 * (self.BZ + 2) * self.CP

    @property
    def WIN_Q(self) -> int:  # sample-window rows in bwd
        return 16 * (self.BZ + 2) * self.CS


# ----------------------------------------------------------------------------
# Static layout permutations (python/numpy; become jnp constants)
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _block_perm(R: int, cap: int, BZ: int = 2) -> tuple:
    """Block-major row -> z-major ghost-padded row (static permutation).

    Block-major layout: for each 2x2xBZ brick (x-major), its 4*BZ cells
    (x-major within the brick, z contiguous), each with ``cap`` slots."""
    assert R % 2 == 0 and R % BZ == 0
    Rp, nb, nbz = R + 2, R // 2, R // BZ
    rows = np.empty(nb * nb * nbz * 4 * BZ * cap, np.int32)
    i = 0
    for bx in range(nb):
        for by in range(nb):
            for bz in range(nbz):
                for dx in range(2):
                    for dy in range(2):
                        for dz in range(BZ):
                            cx, cy, cz = 2 * bx + dx, 2 * by + dy, BZ * bz + dz
                            pid = ((cx + 1) * Rp + (cy + 1)) * Rp + (cz + 1)
                            rows[i : i + cap] = np.arange(
                                pid * cap, (pid + 1) * cap, dtype=np.int32
                            )
                            i += cap
    return tuple(rows.tolist())


@functools.lru_cache(maxsize=None)
def _inv_block_perm(R: int, cap: int, BZ: int = 2) -> tuple:
    """z-major ghost-padded row -> block-major row (ghost rows -> n_blk_rows,
    i.e. one past the end, used as a trash marker)."""
    Rp = R + 2
    perm = np.asarray(_block_perm(R, cap, BZ), np.int32)
    inv = np.full(Rp**3 * cap, len(perm), np.int32)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    return tuple(inv.tolist())


def _to_block_major(x: Array, R: int, cap: int, BZ: int = 2) -> Array:
    perm = jnp.asarray(_block_perm(R, cap, BZ), jnp.int32)
    return x[:, perm]


def _from_block_major_slots(grid: BucketGrid, R: int, cap: int, BZ: int = 2) -> Array:
    """Per-point slot index into the BLOCK-major layout (B, N)."""
    inv = jnp.asarray(_inv_block_perm(R, cap, BZ), jnp.int32)
    slot = jnp.minimum(grid.slot_of_point, inv.shape[0] - 1)
    return inv[slot]


def transposed_tiles(pos: Array, tile: int) -> Array:
    """(B, n_rows, 128) positions -> (B, n_rows/tile*8, tile): per tile of
    ``tile`` points, an (8, tile) block with rows 0..2 = xyz, row 3 = |p|^2,
    rows 4..7 = 0 — the lane-oriented geometry operand for the kernels."""
    B, n_rows, _ = pos.shape
    n_tiles = n_rows // tile
    p = pos.reshape(B, n_tiles, tile, LANE)[..., :3]
    sq = jnp.sum(p * p, axis=-1, keepdims=True)
    t = jnp.concatenate([p, sq, jnp.zeros_like(p), jnp.zeros_like(sq)], axis=-1)
    t = jnp.swapaxes(t, -1, -2)  # (B, n_tiles, 8, tile)
    return t.reshape(B, n_tiles * 8, tile)


def _transposed_meta(blk_pos: Array, rows_per_block: int) -> Array:
    return transposed_tiles(blk_pos, rows_per_block)


# ----------------------------------------------------------------------------
# In-kernel helpers
# ----------------------------------------------------------------------------


def _split_step(s, n_blocks):
    if isinstance(s, int):
        return s // n_blocks, s % n_blocks
    n = jnp.int32(n_blocks)
    return jax.lax.div(s, n), jax.lax.rem(s, n)


def _block_xyz(blk, spec):
    div, rem = jax.lax.div, jax.lax.rem
    nbx, nbz = jnp.int32(spec.nbx), jnp.int32(spec.nbz)
    return div(blk, nbx * nbz), rem(div(blk, nbz), nbx), rem(blk, nbz)


def _locate(step, spec, ids_ref):
    """(cloud, brick) for flat grid ``step``. Dense iteration decomposes the
    step; active-brick iteration reads the brick id from the prefetched
    per-cloud active list (``ids_ref`` shape (B, NBA))."""
    if ids_ref is None:
        return _split_step(step, spec.n_blocks)
    nba = jnp.int32(spec.NBA)
    b = jax.lax.div(step, nba)
    return b, ids_ref[b, jax.lax.rem(step, nba)]


def _issue(step, spec, cap, pairs, sems, slot, wait, ids_ref=None):
    """Start (or wait for) the 16 window DMAs per operand for flat ``step``.

    The window of a 2x2xBZ brick is its 4x4x(BZ+2) cell dilation; for each of
    the 16 (dx, dy) columns the z-extent is ONE contiguous run of
    ``(BZ+2) * cap`` rows in the z-major ghosted layout."""
    Rp = spec.R + 2
    b, blk = _locate(step, spec, ids_ref)
    bx, by, bz = _block_xyz(blk, spec)
    run = (spec.BZ + 2) * cap
    n = len(pairs)
    for i, (dx, dy) in enumerate((dx, dy) for dx in range(4) for dy in range(4)):
        row0 = (
            (((2 * bx + dx) * Rp) + (2 * by + dy)) * Rp + spec.BZ * bz
        ) * cap
        for j, (hbm, scratch) in enumerate(pairs):
            cpy = pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0, run), :],
                scratch.at[slot, pl.ds(i * run, run), :],
                sems.at[slot, n * i + j],
            )
            if wait:
                cpy.wait()
            else:
                cpy.start()


def _double_buffered(step, n_steps, spec, cap, pairs, sems, ids_ref=None):
    """Cross-step double buffering; returns the buffer slot for this step."""
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _prologue():
        _issue(step, spec, cap, pairs, sems, slot, wait=False, ids_ref=ids_ref)

    _issue(step, spec, cap, pairs, sems, slot, wait=True, ids_ref=ids_ref)

    @pl.when(step + 1 < n_steps)
    def _prefetch():
        _issue(
            step + 1, spec, cap, pairs, sems, 1 - slot, wait=False,
            ids_ref=ids_ref,
        )

    return slot


def _sq_norm(x):
    return jnp.sum(x * x, axis=-1, keepdims=True)


def _lane_mask(shape, lane):
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return ids == lane


def _pair_d2(cand, meta_t):
    """Exact f32 distances on the VPU: cand (P, 128) vs transposed sample meta
    (8, S) -> d2 (P, S)."""
    cand2 = _sq_norm(cand)  # (P, 1)
    cx, cy, cz = cand[:, 0:1], cand[:, 1:2], cand[:, 2:3]
    sx, sy, sz = meta_t[0:1, :], meta_t[1:2, :], meta_t[2:3, :]
    s2 = meta_t[3:4, :]
    return cand2 + s2 - 2.0 * (cx * sx + cy * sy + cz * sz)


def _mm(a, b, dims):
    """bf16 matmul with f32 accumulation (feature-path precision)."""
    return jax.lax.dot_general(
        a.astype(FEAT_DTYPE),
        b.astype(FEAT_DTYPE),
        (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------


def _fwd_kernel(
    spec: _Spec,
    n_steps: int,
    *refs,
):
    """Forward kernel. ``refs`` layout (with a leading prefetched active-brick
    id array iff ``spec.NBA``):

      [ids_ref,] smp_t_ref (1, 8, SB), src_pos_hbm (B, S_src, 128) ANY,
      src_feat_hbm (B, S_src, C) bf16 ANY, w1 (8, H), b1 (H, 1), w2, b2,
      out_ref (1, SB, C'), cnt_ref (1, SB, 1),
      cand_pos (2, WIN_P, 128), cand_feat (2, WIN_P, C), sems (2, 32)
    """
    ids_ref = refs[0] if spec.NBA else None
    (
        smp_t_ref, src_pos_hbm, src_feat_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
        out_ref, cnt_ref, cand_pos, cand_feat, sems,
    ) = refs[1 if spec.NBA else 0 :]
    step = pl.program_id(0)
    pairs = ((src_pos_hbm, cand_pos), (src_feat_hbm, cand_feat))
    slot = _double_buffered(
        step, n_steps, spec, spec.CP, pairs, sems, ids_ref=ids_ref
    )

    smp_t = smp_t_ref[0]  # (8, SB)
    cand = cand_pos[slot]  # (P, 128)
    d2 = _pair_d2(cand, smp_t)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)  # (P, S)
    cnt = jnp.sum(maskf, axis=0)  # (S,)
    if spec.mean_norm:
        inv = 1.0 / jnp.maximum(cnt, 1.0)
    else:
        inv = jnp.ones_like(cnt)

    inv_r = 1.0 / spec.radius
    cw = (
        jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * inv_r
    )  # (P, H)
    swT = (
        jax.lax.dot_general(
            w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_r
    )  # (H, S)
    fz = cand_feat[slot]  # (P, C) bf16

    CO = spec.C if spec.CO is None else spec.CO
    acc = jnp.zeros((spec.SB, CO), jnp.float32)
    for h in range(spec.H):
        pre = cw[:, h : h + 1] - swT[h : h + 1, :] + b1_ref[h, 0]
        a_h = jnp.maximum(pre, 0.0) * maskf  # (P, S)
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

    out_ref[0] = acc * inv[:, None]
    cnt_ref[0] = cnt[:, None]


# ----------------------------------------------------------------------------
# Backward: d/d(weighted features) — gridded over SOURCE cell blocks
# ----------------------------------------------------------------------------


def _bwd_kernel(
    spec: _Spec,
    n_steps: int,
    *refs,
):
    """FUSED backward, gridded over SOURCE cell blocks: d/dfeatures (each
    source slot written exactly once — deterministic) AND the parameter
    gradients (accumulated over the sequentially-executed grid — bitwise
    reproducible) from a single traversal of the pair plane. Round 1 ran two
    kernels and generated the d2/pre/relu planes twice.

    ``refs`` layout (leading prefetched active-brick ids iff ``spec.NBA``):

      [ids_ref,] src_t_ref (1, 8, PB), src_feat_ref (1, PB, C) bf16,
      smp_meta_hbm (B, S_smp, 128) ANY (lanes 0..2 pos, lane 3 cnt),
      dout_hbm (B, S_smp, C') f32 ANY, w1, b1, w2, b2,
      dfeat_ref (1, PB, C), dw1 (8, H), db1 (H, 1), dw2, db2,
      wmeta (2, WIN_Q, 128) f32, wdout (2, WIN_Q, C') f32, sems (2, 32)
    """
    if spec.NBA:
        # extra trailing input: the zeros array donated into dfeat (aliased)
        ids_ref = refs[0]
        (
            src_t_ref, src_feat_ref, smp_meta_hbm, dout_hbm, w1_ref, b1_ref,
            w2_ref, b2_ref, _dfeat_init, dfeat_ref, dw1_ref, db1_ref,
            dw2_ref, db2_ref, wmeta, wdout, sems,
        ) = refs[1:]
    else:
        ids_ref = None
        (
            src_t_ref, src_feat_ref, smp_meta_hbm, dout_hbm, w1_ref, b1_ref,
            w2_ref, b2_ref, dfeat_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
            wmeta, wdout, sems,
        ) = refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    pairs = ((smp_meta_hbm, wmeta), (dout_hbm, wdout))
    slot = _double_buffered(
        step, n_steps, spec, spec.CS, pairs, sems, ids_ref=ids_ref
    )

    src_t = src_t_ref[0]  # (8, PB)
    meta = wmeta[slot]  # (Q, 128)
    is_cnt = _lane_mask(meta.shape, CNT_LANE)
    q = jnp.where(is_cnt, 0.0, meta)  # positions only
    wc = jnp.sum(jnp.where(is_cnt, meta, 0.0), axis=1, keepdims=True)  # (Q, 1)

    # Orientation: q(samples) = sublanes, p(this block's sources) = lanes.
    d2 = _pair_d2(q, src_t)  # (Q, PB)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)

    inv_r = 1.0 / spec.radius
    cwq = (
        jnp.dot(q[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * inv_r
    )  # (Q, H)
    spT = (
        jax.lax.dot_general(
            w1_ref[:], src_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_r
    )  # (H, PB)

    # cnt windows can cover ghost cells the fwd kernel never wrote: their cnt
    # is 0 (scatter into zeros) and their dout rows are true zeros, so the
    # wc guard below keeps everything finite and contribution-free.
    if spec.mean_norm:
        inv_cnt = jnp.where(wc >= 1.0, 1.0 / jnp.maximum(wc, 1.0), 0.0)
    else:
        inv_cnt = jnp.ones_like(wc)
    invdout = wdout[slot] * inv_cnt  # (Q, C') f32
    fz = src_feat_ref[0]  # (PB, C) bf16
    q8 = q[:, :W1_ROWS]  # (Q, 8)

    acc = jnp.zeros((spec.PB, spec.C), jnp.float32)
    for h in range(spec.H):
        # offset = src_p - smp_q  =>  pre_h[q, p] = spT[h, p] - cwq[q, h] + b1
        pre = spT[h : h + 1, :] - cwq[:, h : h + 1] + b1_ref[h, 0]
        relu_on = (pre > 0.0).astype(jnp.float32) * maskf
        a_h = jnp.maximum(pre, 0.0) * maskf  # (Q, PB)
        if spec.CO is None:
            t_h = invdout * w2_ref[h : h + 1, :]  # (Q, C)
        else:
            t_h = jax.lax.dot_general(
                invdout, w2_ref[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Q, C)
        acc += _mm(a_h, t_h, ((0,), (0,)))  # dfeat: (PB, C)

        # --- parameter grads (this block's contribution) ---
        g_h = _mm(a_h, fz, ((1,), (0,)))  # (Q, C): sum over block sources
        if spec.CO is None:
            dw2_ref[h : h + 1, :] += jnp.sum(
                invdout * g_h, axis=0, keepdims=True
            )
        else:
            dw2_ref[h] += jax.lax.dot_general(
                g_h, invdout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, CO)
        da_h = _mm(t_h, fz, ((1,), (1,)))  # (Q, PB)
        dpre = da_h * relu_on
        rq = jnp.sum(dpre, axis=1, keepdims=True)  # (Q, 1)
        rp = jnp.sum(dpre, axis=0, keepdims=True)  # (1, PB)
        # d/dW1 column h: sum over pairs of dpre * offset/r, split into the
        # source-side and sample-side projections (exact, f32).
        t_src = jax.lax.dot_general(
            src_t, rp, (((1,), (1,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # (8, 1)
        t_smp = jax.lax.dot_general(
            q8, rq, (((0,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # (8, 1)
        # accumulate straight into the output refs (static slices; the
        # functional value.at[].add lowers to an unsupported scatter-add)
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

    g_0 = _mm(maskf, fz, ((1,), (0,)))  # (Q, C)
    if spec.CO is None:
        db2_ref[:] += jnp.sum(invdout * g_0, axis=0, keepdims=True)
    else:
        db2_ref[:] += jax.lax.dot_general(
            g_0, invdout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


# ----------------------------------------------------------------------------
# pallas_call wrappers (block space)
# ----------------------------------------------------------------------------


def _blk_ix(spec):
    if spec.NBA:
        nba = spec.NBA

        def ix(s, ids):
            b = jax.lax.div(s, jnp.int32(nba))
            return (b, ids[b, jax.lax.rem(s, jnp.int32(nba))], 0)

    else:

        def ix(s):
            b, blk = _split_step(s, spec.n_blocks)
            return (b, blk, 0)

    return ix


def _const_ix(spec, ndim):
    """Constant index map with the right arity for the prefetch mode."""
    zeros = (0,) * ndim
    if spec.NBA:
        return lambda s, ids: zeros
    return lambda s: zeros


def _fwd_call(spec: _Spec, B, smp_t, src_pos, src_feat, w1, b1, w2, b2, ids=None):
    ix = _blk_ix(spec)
    CO = spec.C if spec.CO is None else spec.CO
    n_steps = B * (spec.NBA or spec.n_blocks)
    n_blk_rows = spec.n_blocks * spec.SB
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        vm((1, 8, spec.SB), ix),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        vm(),
        vm(),
        vm(),
        vm(),
    ]
    out_specs = [vm((1, spec.SB, CO), ix), vm((1, spec.SB, 1), ix)]
    out_shape = [
        jax.ShapeDtypeStruct((B, n_blk_rows, CO), jnp.float32),
        jax.ShapeDtypeStruct((B, n_blk_rows, 1), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2, spec.WIN_P, LANE), jnp.float32),
        pltpu.VMEM((2, spec.WIN_P, spec.C), FEAT_DTYPE),
        pltpu.SemaphoreType.DMA((2, 32)),
    ]
    kern = functools.partial(_fwd_kernel, spec, n_steps)
    if spec.NBA:
        out, cnt = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=spec.interpret,
            compiler_params=_COMPILER_PARAMS,
        )(ids, smp_t, src_pos, src_feat, w1, b1, w2, b2)
    else:
        out, cnt = pl.pallas_call(
            kern,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=spec.interpret,
            compiler_params=_COMPILER_PARAMS,
        )(smp_t, src_pos, src_feat, w1, b1, w2, b2)
    return out, cnt


def _bwd_call(
    spec: _Spec, B, src_t, src_feat_blk, smp_meta, dout, w1, b1, w2, b2,
    ids=None, dfeat_init=None,
):
    ix = _blk_ix(spec)
    CO = spec.C if spec.CO is None else spec.CO
    n_steps = B * (spec.NBA or spec.n_blocks)
    n_blk_rows = spec.n_blocks * spec.PB
    const2 = _const_ix(spec, 2)
    const3 = _const_ix(spec, 3)
    w2_shape = (spec.H, spec.C) if spec.CO is None else (spec.H, spec.C, spec.CO)
    b2_shape = (1, spec.C) if spec.CO is None else (spec.C, spec.CO)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        vm((1, 8, spec.PB), ix),
        vm((1, spec.PB, spec.C), ix),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        vm(),
        vm(),
        vm(),
        vm(),
    ]
    out_specs = [
        vm((1, spec.PB, spec.C), ix),
        vm((W1_ROWS, spec.H), const2),
        vm((spec.H, 1), const2),
        vm(w2_shape, const2 if spec.CO is None else const3),
        vm(b2_shape, const2),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, n_blk_rows, spec.C), jnp.float32),
        jax.ShapeDtypeStruct((W1_ROWS, spec.H), jnp.float32),
        jax.ShapeDtypeStruct((spec.H, 1), jnp.float32),
        jax.ShapeDtypeStruct(w2_shape, jnp.float32),
        jax.ShapeDtypeStruct(b2_shape, jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2, spec.WIN_Q, LANE), jnp.float32),
        pltpu.VMEM((2, spec.WIN_Q, CO), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 32)),
    ]
    kern = functools.partial(_bwd_kernel, spec, n_steps)
    if spec.NBA:
        # dfeat rows of bricks never visited must hold zeros, not garbage:
        # the zeros input is donated/aliased into the dfeat output, and only
        # visited bricks overwrite their rows.
        dfeat, dw1, db1, dw2, db2 = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=in_specs + [vm((1, spec.PB, spec.C), ix)],
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            input_output_aliases={9: 0},  # zeros input -> dfeat output
            interpret=spec.interpret,
            compiler_params=_COMPILER_PARAMS,
        )(
            ids, src_t, src_feat_blk, smp_meta, dout, w1, b1, w2, b2,
            dfeat_init,
        )
    else:
        dfeat, dw1, db1, dw2, db2 = pl.pallas_call(
            kern,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=spec.interpret,
            compiler_params=_COMPILER_PARAMS,
        )(src_t, src_feat_blk, smp_meta, dout, w1, b1, w2, b2)
    return dfeat, dw1, db1, dw2, db2


# ----------------------------------------------------------------------------
# custom_vjp core (bucket/block space) + public wrapper
# ----------------------------------------------------------------------------


def _ids_int(spec, ids_f):
    """Active-brick ids travel the custom_vjp as float32 (integer cotangents
    are not a thing); exact for any realistic brick count (< 2^24)."""
    if spec.NBA is None:
        return None
    return ids_f.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bucket_conv_core(
    spec: _Spec, w1, b1, w2, b2, smp_t, smp_meta0, src_pos, src_t, src_feat,
    ids_smp_f, ids_src_f,
):
    out, _ = _fwd_call(
        spec, smp_t.shape[0], smp_t, src_pos, src_feat, w1, b1, w2, b2,
        ids=_ids_int(spec, ids_smp_f),
    )
    return out


def _core_fwd(
    spec, w1, b1, w2, b2, smp_t, smp_meta0, src_pos, src_t, src_feat,
    ids_smp_f, ids_src_f,
):
    out, cnt = _fwd_call(
        spec, smp_t.shape[0], smp_t, src_pos, src_feat, w1, b1, w2, b2,
        ids=_ids_int(spec, ids_smp_f),
    )
    return out, (
        w1, b1, w2, b2, smp_t, smp_meta0, src_pos, src_t, src_feat, cnt,
        ids_smp_f, ids_src_f,
    )


def _core_bwd(spec, res, dout):
    (
        w1, b1, w2, b2, smp_t, smp_meta0, src_pos, src_t, src_feat, cnt,
        ids_smp_f, ids_src_f,
    ) = res
    B = smp_t.shape[0]
    # Fold the per-sample neighbor count into lane CNT_LANE of the Z-MAJOR
    # sample position array (smp_meta0) so the bwd pass fetches positions
    # and counts with one DMA per window. cnt is block-major — scatter it
    # back to z-major via the static inverse permutation.
    perm = jnp.asarray(_block_perm(spec.R, spec.CS, spec.BZ), jnp.int32)
    cnt_z = jnp.zeros((B, smp_meta0.shape[1], 1), cnt.dtype)
    cnt_z = jax.vmap(lambda z, c: z.at[perm].set(c))(cnt_z, cnt)
    is_cnt = jax.lax.broadcasted_iota(jnp.int32, smp_meta0.shape, 2) == CNT_LANE
    smp_meta = jnp.where(is_cnt, cnt_z, smp_meta0)
    # dout arrives block-major; the bwd windows need it z-major ghosted.
    # Shipped in f32 so the parameter grads keep full dout precision.
    dout_z = jnp.zeros((B, smp_meta0.shape[1], dout.shape[-1]), jnp.float32)
    dout_z = jax.vmap(lambda z, d: z.at[perm].set(d))(dout_z, dout)
    # The fused kernel needs this block's source features: block-major view.
    src_feat_blk = _to_block_major(src_feat, spec.R, spec.CP, spec.BZ)
    dfeat_init = None
    if spec.NBA is not None:
        dfeat_init = jnp.zeros(
            (B, spec.n_blocks * spec.PB, spec.C), jnp.float32
        )
    dfeat_blk, dw1, db1, dw2, db2 = _bwd_call(
        spec, B, src_t, src_feat_blk, smp_meta, dout_z, w1, b1, w2, b2,
        ids=_ids_int(spec, ids_src_f), dfeat_init=dfeat_init,
    )
    # dfeat is block-major over source slots; scatter back to z-major.
    perm_p = jnp.asarray(_block_perm(spec.R, spec.CP, spec.BZ), jnp.int32)
    dfeat = jnp.zeros((B, src_feat.shape[1], spec.C), jnp.float32)
    dfeat = jax.vmap(lambda z, d: z.at[perm_p].set(d))(dfeat, dfeat_blk)
    return (
        dw1,
        db1,
        dw2,
        db2,
        jnp.zeros_like(smp_t),  # positions are data, not parameters
        jnp.zeros_like(smp_meta0),
        jnp.zeros_like(src_pos),
        jnp.zeros_like(src_t),
        dfeat.astype(src_feat.dtype),
        jnp.zeros_like(ids_smp_f),
        jnp.zeros_like(ids_src_f),
    )


_bucket_conv_core.defvjp(_core_fwd, _core_bwd)


def _pad_lanes(x: Array, lanes: int = LANE) -> Array:
    return jnp.pad(x, ((0, 0), (0, 0), (0, lanes - x.shape[-1])))


def pick_bz(R: int, cap: int) -> int:
    """z-brick depth: smallest divisor of R with >= 128 samples per block
    (full MXU lane width). Big scenes have small cell caps — a fixed 2x2x2
    block would starve the lane dimension there. Conversely BZ=1 is preferred
    once cap alone fills the lane: the window is 3 z-cells instead of 4
    (less overcompute) and the pair plane is ~2x smaller (VMEM: the plane
    scales with cap^2, which OOMs the 16 MB scoped limit at cap=64, BZ=2)."""
    for bz in range(1, R + 1):
        if R % bz == 0 and 4 * bz * cap >= LANE:
            return bz
    return R


def count_active_bricks(grid: BucketGrid) -> Array:
    """Per-cloud count of occupied 2x2xBZ bricks — the exact lossless value
    for ``bucket_mc_conv(..., max_active_bricks=)`` on this grid. Call on a
    concrete grid outside jit (the count must be static for the kernel)."""
    R, cap = grid.res, grid.cap
    BZ = pick_bz(R, cap)
    perm = jnp.asarray(_block_perm(R, cap, BZ), jnp.int32)
    bm = grid.slot_mask[:, :-1][:, perm]
    occ = bm.reshape(bm.shape[0], -1, 4 * BZ * cap).any(-1)
    return occ.sum(-1)


def _brick_activity(grid: BucketGrid, spec_cap: int, R: int, BZ: int, NBA: int):
    """(ids, rank_of_brick) per cloud: active bricks first (ascending id),
    inactive bricks pad the tail (their sentinel positions contribute
    nothing). Bricks ranked >= NBA are DROPPED from iteration — callers must
    size NBA to the data (lossless default: NBA=None = dense sweep)."""
    perm = jnp.asarray(_block_perm(R, spec_cap, BZ), jnp.int32)
    bm = grid.slot_mask[:, :-1][:, perm]
    rows = 4 * BZ * spec_cap
    occ = bm.reshape(bm.shape[0], -1, rows).any(-1)  # (B, n_blocks)
    order = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
    n_blocks = occ.shape[1]
    ranks = jax.vmap(
        lambda o: jnp.zeros((n_blocks,), jnp.int32).at[o].set(
            jnp.arange(n_blocks, dtype=jnp.int32)
        )
    )(order)
    return order[:, :NBA], ranks


def bucket_mc_conv(
    params: MCConvParams,
    sample_grid: BucketGrid,
    sample_mask: Array,
    source_grid: BucketGrid,
    features: Array,
    pdf: Array,
    *,
    c_out: int | None = None,
    mean_normalize: bool = False,
    interpret: bool = False,
    max_active_bricks: int | None = None,
) -> Array:
    """Monte-Carlo conv via the fused bucket kernel.

    Args:
      params: kernel-MLP parameters (core/mcconv.py layout).
      sample_grid / source_grid: bucketizations of the out-level / in-level
        point sets at cell edge == conv radius (``build_buckets``).
      sample_mask: ``(B, M)`` validity of sample points (for the output).
      features: ``(B, N, C)`` in-level features; pdf ``(B, N)`` KDE densities.

    Semantics match ``core.mc_conv`` with unbounded neighbor capacity: ALL
    in-radius neighbors contribute (the bucket layout has no per-sample K),
    and the estimator divides by the exact neighbor count. Features run in
    bf16 on the MXU with f32 accumulation (pass f32 inputs; outputs are f32).
    """
    assert sample_grid.radius == source_grid.radius
    assert sample_grid.res == source_grid.res
    H = params.w1.shape[1]
    C = features.shape[-1]
    R = source_grid.res

    # Mosaic wants lane dims to be multiples of 128: pad the channel axes with
    # zeros — zero input channels contribute nothing, extra output channels
    # are sliced off, and the pad/slice VJPs do the right thing outside the
    # custom_vjp core.
    Cp = -(-C // LANE) * LANE
    COp = None if c_out is None else -(-c_out // LANE) * LANE

    wf = features / pdf[..., None]
    if Cp != C:
        wf = jnp.pad(wf, ((0, 0), (0, 0), (0, Cp - C)))

    w1 = jnp.pad(params.w1, ((0, W1_ROWS - 3), (0, 0)))  # (8, H), zero rows 3..
    b1 = params.b1.reshape(H, 1)
    if c_out is None:
        w2 = jnp.pad(params.w2, ((0, 0), (0, Cp - C)))
        b2 = jnp.pad(params.b2.reshape(1, C), ((0, 0), (0, Cp - C)))
    else:
        w2 = jnp.pad(
            params.w2.reshape(H, C, c_out),
            ((0, 0), (0, Cp - C), (0, COp - c_out)),
        )
        b2 = jnp.pad(
            params.b2.reshape(C, c_out), ((0, Cp - C), (0, COp - c_out))
        )

    BZ = pick_bz(R, min(sample_grid.cap, source_grid.cap))
    NBA = max_active_bricks
    if NBA is not None:
        n_blocks = (R // 2) ** 2 * (R // BZ)
        NBA = min(NBA, n_blocks)
        if NBA >= n_blocks:
            NBA = None  # dense sweep is strictly better
    spec = _Spec(
        R=R,
        CP=source_grid.cap,
        CS=sample_grid.cap,
        C=Cp,
        CO=COp,
        H=H,
        radius=source_grid.radius,
        mean_norm=mean_normalize,
        interpret=interpret,
        BZ=BZ,
        NBA=NBA,
    )

    src_feat_z = bucketize(source_grid, wf)[:, :-1].astype(FEAT_DTYPE)
    src_pos_z = _pad_lanes(source_grid.positions[:, :-1])
    smp_pos_z = _pad_lanes(sample_grid.positions[:, :-1])

    # Block-major views (static permutation) for the grid sides.
    smp_blk = _to_block_major(smp_pos_z, R, spec.CS, spec.BZ)
    src_blk = _to_block_major(src_pos_z, R, spec.CP, spec.BZ)
    smp_t = _transposed_meta(smp_blk, spec.SB)
    src_t = _transposed_meta(src_blk, spec.PB)

    B = features.shape[0]
    if spec.NBA is not None:
        ids_smp, ranks_smp = _brick_activity(
            sample_grid, spec.CS, R, spec.BZ, spec.NBA
        )
        ids_src, _ = _brick_activity(source_grid, spec.CP, R, spec.BZ, spec.NBA)
        ids_smp_f = ids_smp.astype(jnp.float32)
        ids_src_f = ids_src.astype(jnp.float32)
    else:
        ids_smp_f = ids_src_f = jnp.zeros((B, 1), jnp.float32)
        ranks_smp = None

    out_b = _bucket_conv_core(
        spec, w1, b1, w2, b2, smp_t, smp_pos_z, src_pos_z, src_t, src_feat_z,
        ids_smp_f, ids_src_f,
    )
    out_b = out_b[..., : (C if c_out is None else c_out)]
    # back to point order (block-major slots); trash/dropped reads are masked
    blk_slot = _from_block_major_slots(sample_grid, R, spec.CS, spec.BZ)
    slot = jnp.minimum(blk_slot, out_b.shape[1] - 1)
    out = jax.vmap(lambda v, i: v[i])(out_b, slot)
    valid = sample_mask & (blk_slot < out_b.shape[1])
    if ranks_smp is not None:
        # samples in bricks beyond the active capacity were never computed
        brick = jnp.minimum(blk_slot // spec.SB, ranks_smp.shape[1] - 1)
        kept = jax.vmap(lambda r, b: r[b])(ranks_smp, brick) < spec.NBA
        valid = valid & kept
    return jnp.where(valid[..., None], out, 0.0)
