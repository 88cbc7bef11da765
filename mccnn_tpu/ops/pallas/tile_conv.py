"""Z-order tile Monte-Carlo convolution — the compacted big-scene kernel.

Reference parity (viscom-ulm/MCCNN): same op as ``tf_ops/spatial_conv.*``
(SURVEY §2.1) at scene scale — but the layout is the TPU answer to the
reference's CSR neighbor lists, designed around this chip's measured limits:

* The cell-bucket kernel (``mcconv_kernel.py``) pays slot padding: its cell
  capacity must cover the MAX cell occupancy while the MEAN is far lower
  (ScanNet-like surface scenes: cap 64 vs mean ~10 → ~6x padding on BOTH
  sides of the pair plane, ~40x total). Measured on a 32k surface cloud it is
  slower than brute force.
* Here points are sorted along a Morton (z-order) curve and partitioned into
  FIXED-SIZE tiles of ``T`` consecutive points — fully compact (zero slot
  padding), spatially coherent, and each tile is one contiguous lane-aligned
  DMA. Candidate pruning happens at tile granularity: tile pair (i, j) is
  processed iff their point AABBs, dilated by the radius, intersect — a
  conservative superset of all true neighbor pairs, so results are EXACT.
* The (sample tile, source tile) pair list is flattened into the grid
  dimension (one grid step per surviving pair, sorted by sample tile) and the
  tile ids ride scalar prefetch; Pallas pipelines the tile fetches. Output
  tiles accumulate across their consecutive candidate steps.
* Backward runs the transposed pair list (sorted by SOURCE tile): d/dfeatures
  accumulates per source tile (deterministic — no atomics, unlike the
  reference's atomicAdd scatter), parameter grads accumulate across the
  sequential grid; both from one pair-plane traversal, as in the bucket
  kernel's fused backward.

The pair-list length is static (``max_pairs``); size it with
``count_tile_pairs`` (excess pairs would be silently dropped — callers
assert, as with ``BucketGrid.overflow``).
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
    _mm,
    _pad_lanes,
    _pair_d2,
    FEAT_DTYPE,
    LANE,
    transposed_tiles,
    W1_ROWS,
)

_HI = jax.lax.Precision.HIGHEST
SENTINEL = 1.0e6  # far-away coordinate: d2 > r^2 against anything real

# Measured-best big-scene config (32k surface scene, v5e): T=128 has ~40 %
# fewer true candidate pairs than T=256 (tighter AABBs), and chunk=8 restores
# the per-step matmul height / amortizes step overhead — 10.6 ms fwd+bwd vs
# 15.2 ms for (256, 1). ``count_tile_pairs`` MUST be called with the same
# tile as the kernel (pair counts differ per tile size).
DEFAULT_TILE = 128
DEFAULT_CHUNK = 8
# Minor (candidate-side) sub-tile granularity: each direction's CANDIDATE
# tiles are Tm-point sub-tiles with their own AABBs while majors stay T, so
# pair planes keep their (G*Tm, T) lane-128 shape and output accumulation is
# untouched. Tighter minor boxes prune candidate points the T-granularity
# test cannot (32k bench scene, host-counted: Tm=64 -> -25 % candidate work,
# Tm=32 -> -40 %). Round-5 on-chip A/B (tools/exp_tile_minor.py): Tm=32 wins
# at 5.74 ms/layer vs 7.54 (Tm=128) and 7.77 (Tm=64) — DMA-count growth eats
# the Tm=64 saving, Tm=16 regresses (128 fetches/step). At quantization-
# bound small sites Tm=32 pads to the same slot-point count as Tm=128, so
# the global default is safe (tests cover both granularities).
DEFAULT_MINOR = 32


class _TSpec(NamedTuple):
    """Static tile-kernel configuration."""

    T: int  # points per z-order tile (multiple of 128)
    C: int  # input channels (multiple of 128)
    CO: int | None  # None => depthwise; else multiple of 128
    H: int  # kernel-MLP hidden width
    radius: float
    S: int  # padded step-list length per cloud (grid steps per cloud)
    NTs: int  # sample tiles (excluding the sentinel tile)
    NTp: int  # source tiles (excluding the sentinel tile)
    interpret: bool
    G: int = 1  # candidate tiles per grid step (chunking: amortizes per-step
    # overhead and feeds the MXU (G*T)-row pair planes; quantization waste is
    # <= one partial chunk per output tile)
    probe: str = ""  # ROOFLINE measurement hook (MCCNN_TILE_PROBE): "" is the
    # real kernel; "noop"/"planes"/"mm" strip the fwd body to grid+DMA+d2,
    # +planes, +matmuls respectively; "bwd_noop" strips the bwd body. Results
    # are WRONG under any probe — tools/exp_tile_roofline.py only.
    Tm: int = 0  # minor (candidate-side) tile: fwd source minors and bwd
    # sample minors are Tm-point sub-tiles with their own (tighter) AABBs,
    # while majors stay T so every plane keeps its (G*Tm, T) lane-128 shape
    # and per-major output accumulation is unchanged. 0 => Tm = T.
    NTs_m: int = 0  # sample minor tiles (excl. sentinel); 0 => NTs * T / Tm
    NTp_m: int = 0  # source minor tiles (excl. sentinel)
    pack: bool = False  # OPT-IN (MCCNN_TILE_PACK=1): fuse each minor tile's
    # positions + bf16 payload (features fwd / out-cotangent bwd) into ONE
    # (Tm + nc*Tm/2, 128) f32 record per candidate — HALF the DMA issues per
    # step, targeting the round-5 roofline finding that the Tm=32 kernel is
    # DMA-ISSUE-bound (fwd noop = 56 % of fwd at 64 block fetches/step).
    # Bitwise-exact, but Mosaic compiles of the packed kernels took >25 min
    # on the 32k config (2026-08-19) — kept opt-in until a future compiler.


# ----------------------------------------------------------------------------
# Morton (z-order) sorting
# ----------------------------------------------------------------------------

MORTON_BITS = 8  # 256 cells/axis — locality scale far below any conv radius


def morton_order(points: Array, mask: Array) -> Array:
    """(B, N) argsort of the 3-D Morton code (invalid points sort last)."""
    res = 1 << MORTON_BITS
    c = jnp.clip((points * res).astype(jnp.int32), 0, res - 1)  # (B, N, 3)
    code = jnp.zeros(points.shape[:-1], jnp.int32)
    for b in range(MORTON_BITS):
        for d in range(3):
            code = code | (((c[..., d] >> b) & 1) << (3 * b + d))
    code = jnp.where(mask, code, jnp.int32(2**30))
    return jnp.argsort(code, axis=-1, stable=True).astype(jnp.int32)


def hilbert_code(c: Array, bits: int) -> Array:
    """Integer coords ``(..., 3)`` in ``[0, 2**bits)`` -> 3-D Hilbert index
    (int32; requires ``3 * bits <= 30``).

    Skilling's transpose<->Hilbert bit transform, vectorized in jnp (static
    bit loops — jit-friendly). Bijective on the coordinate cube: distinct
    cells always get distinct codes (the sampler's cell-run ordering relies
    on this)."""
    assert 3 * bits <= 30, bits
    X = [c[..., 0], c[..., 1], c[..., 2]]
    n = 3
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:  # static: bits-1 iterations
        P = Q - 1
        for i in range(n):
            t = (X[i] & Q) != 0
            X[0] = jnp.where(t, X[0] ^ P, X[0])  # invert low bits of X[0]
            tt = (X[i] & Q) == 0
            tmp = (X[0] ^ X[i]) & P
            X[0] = jnp.where(tt, X[0] ^ tmp, X[0])
            X[i] = jnp.where(tt, X[i] ^ tmp, X[i])
        Q >>= 1
    for i in range(1, n):  # Gray encode
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = jnp.where((X[n - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    X = [x ^ t for x in X]
    code = jnp.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            code = (code << 1) | ((X[i] >> b) & 1)
    return code


def hilbert_order(points: Array, mask: Array) -> Array:
    """(B, N) argsort of the 3-D Hilbert index (invalid points sort last).

    The Hilbert curve has no long jumps, so consecutive fixed-size tiles get
    ~40 % tighter AABBs than Morton tiles: measured on the 32k surface scene
    (T=128, r=0.05) the surviving tile-pair count drops 5012 -> 3202 (-36 %),
    and the conv kernel cost is proportional to surviving pairs."""
    bits = MORTON_BITS
    res = 1 << bits
    c = jnp.clip((points * res).astype(jnp.int32), 0, res - 1)  # (B, N, 3)
    code = hilbert_code(c, bits)
    code = jnp.where(mask, code, jnp.int32(2**30))
    return jnp.argsort(code, axis=-1, stable=True).astype(jnp.int32)


def curve_order(points: Array, mask: Array) -> Array:
    """The space-filling-curve ordering used by ALL tile machinery in this
    module (conv, kde, cover sweep, pair counting — they must agree).
    Hilbert by default; ``MCCNN_TILE_ORDER=morton`` restores z-order."""
    if os.environ.get("MCCNN_TILE_ORDER") == "morton":
        return morton_order(points, mask)
    return hilbert_order(points, mask)


def _sorted_tiles(points, mask, order, T, n_rows):
    """Morton-sorted positions (B, n_rows + T, LANE) with invalid/padding rows
    at SENTINEL and one all-sentinel tile appended, plus the sorted validity
    (B, n_rows) and per-tile valid-point AABBs (B, nt, 3) x2."""
    B, N, _ = points.shape
    p = jnp.take_along_axis(points, order[..., None], axis=1)
    v = jnp.take_along_axis(mask, order, axis=1)
    pad = n_rows - N
    p = jnp.pad(p, ((0, 0), (0, pad), (0, 0)), constant_values=SENTINEL)
    v = jnp.pad(v, ((0, 0), (0, pad)))
    pv = jnp.where(v[..., None], p, SENTINEL)
    rows = _pad_lanes(pv)
    rows = jnp.pad(rows, ((0, 0), (0, T), (0, 0)), constant_values=0.0)
    rows = rows.at[:, n_rows:, :3].set(SENTINEL)
    nt = n_rows // T
    tp = jnp.where(v[..., None], p, jnp.inf).reshape(B, nt, T, 3)
    mn = tp.min(axis=2)
    tp = jnp.where(v[..., None], p, -jnp.inf).reshape(B, nt, T, 3)
    mx = tp.max(axis=2)
    return rows, v, mn, mx


def _tile_adjacency(mn_i, mx_i, mn_j, mx_j, radius):
    """(B, NTs, NTp) bool — sample tile i's AABB dilated by ``radius``
    intersects source tile j's AABB. Empty tiles (mn=+inf / mx=-inf) never
    intersect anything."""
    lo = mn_i[:, :, None, :] - radius <= mx_j[:, None, :, :]
    hi = mx_i[:, :, None, :] + radius >= mn_j[:, None, :, :]
    return jnp.all(lo & hi, axis=-1)


def _points_near_boxes(rows3, mn, mx, T, radius):
    """(B, n_rows//T, ntb) bool — does ANY point of tile a sit within
    ``radius`` of target AABB b? Strictly tighter than the AABB-AABB test
    (boxes can overlap while every point hides in a far corner: measured on
    the 32k bench scene it prunes 19 % of the AABB-surviving pairs, 80 % of
    what an exact point-point test would — tools/exp_tile_adjacency.py) and
    still CONSERVATIVE: a true pair (p, q), d(p,q) <= r implies
    d(p, AABB_q's tile) <= r, so no contributing tile pair is ever dropped.

    ``rows3`` are curve-sorted positions (invalid points at SENTINEL — their
    box distance is huge, so they never vote); empty target boxes are
    (+inf, -inf) and repel everything. Pure per-axis VPU f32 arithmetic (no
    matmul — exactness per CLAUDE.md precision rules) with a 1e-5 relative
    slack on the compare so the kernel's own ``_pair_d2`` mask can never
    accept a pair this test pruned."""
    B, n_rows, _ = rows3.shape
    nta = n_rows // T
    ntb = mn.shape[1]
    d2 = jnp.zeros((B, n_rows, ntb), jnp.float32)
    for d in range(3):
        p = rows3[..., d][..., None]  # (B, n_rows, 1)
        lo = jnp.maximum(mn[:, None, :, d] - p, 0.0)
        hi = jnp.maximum(p - mx[:, None, :, d], 0.0)
        d2 = d2 + (lo + hi) ** 2
    near = d2 <= (radius * radius) * (1.0 + 1e-5)
    return jnp.any(near.reshape(B, nta, T, ntb), axis=2)


def _refined_adjacency(
    smp_rows, mn_i, mx_i, src_rows, mn_j, mx_j, T, radius, Tm=None
):
    """AABB-AABB adjacency intersected with the point-vs-box test in BOTH
    directions (some sample point near source box AND some source point near
    sample box). ``Tm`` is the SOURCE side's tile granularity (defaults to
    ``T`` — symmetric); mixed granularity serves the minor-tile kernels.
    ``MCCNN_TILE_ADJ=aabb`` restores the round-3 box-only test (A/B hook)."""
    Tm = T if Tm is None else Tm
    nts, ntp = mn_i.shape[1], mn_j.shape[1]
    adj = _tile_adjacency(mn_i, mx_i, mn_j, mx_j, radius)
    if os.environ.get("MCCNN_TILE_ADJ") == "aabb":
        return adj
    near_ij = _points_near_boxes(
        smp_rows[:, : nts * T, :3], mn_j, mx_j, T, radius
    )
    near_ji = _points_near_boxes(
        src_rows[:, : ntp * Tm, :3], mn_i, mx_i, Tm, radius
    )
    return adj & near_ij & jnp.swapaxes(near_ji, 1, 2)


def _chunked_pair_lists(adj, S_steps, G, pad_major, sentinel_minor):
    """Chunked step list over ``adj`` (B, n_major, n_minor): each step is one
    major tile plus up to ``G`` of its true minors. Returns ``major``
    (B, S_steps) — non-decreasing, padded with ``pad_major`` — and ``minors``
    (B, G, S_steps) padded with ``sentinel_minor``.

    Minors are laid out G-major: SMEM arrays lane-pad their LAST dim to 128,
    so (S, G) would cost S*128 ints (observed 1.87 MB > the 1 MB SMEM at a
    40960-point scene); (G, S) costs G*S."""
    B, n_major, n_minor = adj.shape
    # compact each row's true minors to the front (stable: ascending ids)
    order = jnp.argsort(~adj, axis=-1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(adj, axis=-1)  # (B, n_major)
    rank = jnp.arange(n_minor, dtype=jnp.int32)[None, None, :]
    minors_full = jnp.where(rank < cnt[..., None], order, jnp.int32(sentinel_minor))
    n_chunks = -(-n_minor // G)
    pad = n_chunks * G - n_minor
    minors_full = jnp.pad(
        minors_full, ((0, 0), (0, 0), (0, pad)),
        constant_values=sentinel_minor,
    )
    chunks = minors_full.reshape(B, n_major, n_chunks, G)
    occ = (
        jnp.arange(n_chunks, dtype=jnp.int32)[None, None, :] * G
        < cnt[..., None]
    )
    occ_flat = occ.reshape(B, n_major * n_chunks)
    sel = jnp.argsort(~occ_flat, axis=-1, stable=True)[:, :S_steps].astype(
        jnp.int32
    )
    real = jnp.take_along_axis(occ_flat, sel, axis=-1)
    major = jnp.where(real, sel // n_chunks, jnp.int32(pad_major))
    flat_chunks = chunks.reshape(B, n_major * n_chunks, G)
    minors = jnp.take_along_axis(
        flat_chunks, jnp.where(real, sel, 0)[..., None], axis=1
    )
    minors = jnp.where(real[..., None], minors, jnp.int32(sentinel_minor))
    # S_steps can exceed this direction's natural list length (it is shared
    # with the transposed direction) — pad with inert steps, NEVER truncate:
    # the kernel indexes ids[b, k] for k < S_steps, and a short array would
    # clamp-read earlier entries and double-accumulate their tiles.
    L = major.shape[1]
    if L < S_steps:
        major = jnp.pad(
            major, ((0, 0), (0, S_steps - L)), constant_values=pad_major
        )
        minors = jnp.pad(
            minors, ((0, 0), (0, S_steps - L), (0, 0)),
            constant_values=sentinel_minor,
        )
    return major, jnp.swapaxes(minors, 1, 2)  # (B, G, S)


def _steps_for_pairs(max_pairs, G, n_major, n_minor):
    """Static step capacity: ceil(pairs/G) plus one partial chunk per major
    row covers any distribution of ``max_pairs`` pairs over rows."""
    full = -(-max_pairs // G) + n_major
    return min(full, n_major * (-(-n_minor // G)))


def _needed_steps(adj, G):
    """Per-cloud chunked-step demand of ``adj`` (B, n_major, n_minor): the
    exact number of grid steps ``_chunked_pair_lists`` needs to emit every
    true pair (sum over major rows of ceil(row_count / G))."""
    cnt = jnp.sum(adj.astype(jnp.int32), axis=-1)  # (B, n_major)
    return jnp.sum(-(-cnt // G), axis=-1)  # (B,)


def auto_tile_pairs(
    pts,
    mask,
    radius: float,
    *,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    headroom: float = 1.3,
    multiple: int = 256,
) -> int:
    """Static ``max_pairs`` capacity sized from a representative batch.

    The kernels' true capacity is the static STEP budget ``S`` they derive
    from ``max_pairs`` (``_steps_for_pairs``: worst case over any pair
    distribution, i.e. ceil(pairs/G) plus one partial chunk per major row).
    That worst case is ~1.8x the measured demand on real scenes (every row
    would need a partial chunk), and padding steps cost full kernel compute —
    so this sizes from the MEASURED chunked-step demand instead: it runs the
    batch against itself (self demand upper-bounds the cross-level demands of
    the same scene at the same radius, since deeper levels have fewer tiles),
    takes the batch max over both list directions, applies ``headroom`` for
    scene-to-scene variation, and inverts the S(max_pairs) formula so every
    downstream site lands at S ~= headroom * measured demand. Rounded up to
    ``multiple`` (keeps recompiles rare if callers re-size on a later batch).
    Call on CONCRETE arrays outside jit; step overflow is still counted
    downstream (``tile_mc_conv(..., with_overflow=True)``) so an unluckily
    dense later scene reports (fatally, at the task boundary) instead of
    silently dropping pairs."""
    import numpy as np

    B, N, _ = pts.shape
    nt = -(-N // tile)
    need = int(
        np.asarray(count_tile_steps(pts, mask, pts, mask, radius, tile, chunk)).max()
    )
    target_s = int(need * headroom) + 1
    # invert S(max_pairs) = ceil(max_pairs / G') + n_major with the MINOR
    # chunk G' = chunk * tile / minor (what the kernels actually use)
    gm = chunk * (tile // tile_minor(tile))
    n = max(gm * (target_s - nt), gm)
    return -(-n // multiple) * multiple


def tile_minor(tile: int = DEFAULT_TILE) -> int:
    """Minor (candidate-side) tile granularity used by the conv kernels.
    ``MCCNN_TILE_MINOR`` overrides for A/Bs; must divide ``tile``."""
    env = os.environ.get("MCCNN_TILE_MINOR")
    m = int(env) if env else min(tile, DEFAULT_MINOR)
    assert tile % m == 0 and m % 8 == 0, (tile, m)
    return m


def _count_adjacency(
    sample_pts, sample_mask, src_pts, src_mask, radius, tile, minor=None
):
    """The (B, n_major, n_minor) surviving-tile-pair adjacency the kernels
    will see for one list DIRECTION: majors are ``tile``-point tiles of the
    sample side, minors ``minor``-point sub-tiles of the source side (same
    sort, same refinement as the kernels)."""
    minor = tile if minor is None else minor
    B, M, _ = sample_pts.shape
    N = src_pts.shape[1]
    nts, ntp = -(-M // tile), -(-N // minor)
    smp_rows, _, mn_i, mx_i = _sorted_tiles(
        sample_pts, sample_mask, curve_order(sample_pts, sample_mask),
        tile, nts * tile,
    )
    src_rows, _, mn_j, mx_j = _sorted_tiles(
        src_pts, src_mask, curve_order(src_pts, src_mask), minor, ntp * minor
    )
    return _refined_adjacency(
        smp_rows, mn_i, mx_i, src_rows, mn_j, mx_j, tile, radius, minor
    )


def count_tile_pairs(
    sample_pts: Array,
    sample_mask: Array,
    src_pts: Array,
    src_mask: Array,
    radius: float,
    tile: int = DEFAULT_TILE,
) -> Array:
    """Per-cloud surviving tile-pair count — a lossless (worst-case over pair
    distributions) value for ``tile_mc_conv(..., max_pairs=)``. Call on
    concrete data outside jit (``max_pairs`` must be static). For a TIGHT
    lossless budget on a fixed scene, pass ``count_tile_steps`` as
    ``max_steps=`` instead. With a minor granularity below ``tile`` the
    count is the max over the two list directions (their minor-granularity
    adjacencies differ)."""
    minor = tile_minor(tile)
    fwd = _count_adjacency(
        sample_pts, sample_mask, src_pts, src_mask, radius, tile, minor
    ).sum((1, 2))
    if minor == tile:
        return fwd
    bwd = _count_adjacency(
        src_pts, src_mask, sample_pts, sample_mask, radius, tile, minor
    ).sum((1, 2))
    return jnp.maximum(fwd, bwd)


def count_tile_steps(
    sample_pts: Array,
    sample_mask: Array,
    src_pts: Array,
    src_mask: Array,
    radius: float,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
) -> Array:
    """Per-cloud chunked-step demand — the exact lossless value for
    ``tile_mc_conv(..., max_steps=)`` on these inputs: the max over the
    forward (sample majors / source minors) and backward (source majors /
    sample minors) list directions of ``sum_rows ceil(row_pairs / chunk')``
    where ``chunk' = chunk * tile / minor`` keeps the plane height fixed.
    Call on concrete data outside jit."""
    minor = tile_minor(tile)
    gm = chunk * (tile // minor)
    fwd = _count_adjacency(
        sample_pts, sample_mask, src_pts, src_mask, radius, tile, minor
    )
    bwd = (
        jnp.swapaxes(fwd, 1, 2)
        if minor == tile
        else _count_adjacency(
            src_pts, src_mask, sample_pts, sample_mask, radius, tile, minor
        )
    )
    return jnp.maximum(_needed_steps(fwd, gm), _needed_steps(bwd, gm))


# ----------------------------------------------------------------------------
# Packed minor records (positions + bf16 payload in one DMA)
# ----------------------------------------------------------------------------


def _pack_rows(tile_m: int, c: int) -> int:
    """Rows per packed minor record: Tm position rows + the bf16 payload
    bitcast-packed into f32 sublane pairs (c/128 lane-chunks stacked)."""
    return tile_m + (c // LANE) * tile_m // 2


def _pack_minor(rows_m: Array, payload: Array, tile_m: int) -> Array:
    """Fuse minor-layout position rows (B, nt1*Tm, LANE) f32 and a bf16
    payload (B, nt1*Tm, C) into (B, nt1*R, LANE) f32 records, one contiguous
    block per minor tile. Payload rows 2s/2s+1 of each lane chunk pair into
    one f32 row (little-endian, matching ``pltpu.bitcast``'s sublane
    packing — round-trip probed on-chip 2026-08-19)."""
    B, total, C = payload.shape
    nt1 = total // tile_m
    nc = C // LANE
    f = payload.reshape(B, nt1, tile_m, nc, LANE)
    f = jnp.swapaxes(f, 2, 3)  # (B, nt1, nc, Tm, LANE)
    f = f.reshape(B, nt1, nc, tile_m // 2, 2, LANE)
    f = jnp.swapaxes(f, 4, 5)  # (..., Tm/2, LANE, 2)
    f32 = jax.lax.bitcast_convert_type(f, jnp.float32)
    f32 = f32.reshape(B, nt1, nc * tile_m // 2, LANE)
    pos = rows_m.reshape(B, nt1, tile_m, LANE)
    out = jnp.concatenate([pos, f32], axis=2)
    return out.reshape(B, nt1 * _pack_rows(tile_m, C), LANE)


def _unpack_minor(blk, tile_m: int, c: int):
    """(R, LANE) packed record -> ((Tm, LANE) f32 positions, (Tm, c) bf16
    payload)."""
    cand = blk[:tile_m]
    bf = pltpu.bitcast(blk[tile_m:], FEAT_DTYPE)  # (nc*Tm, LANE)
    nc = c // LANE
    if nc == 1:
        return cand, bf
    return cand, jnp.concatenate(
        [bf[k * tile_m : (k + 1) * tile_m] for k in range(nc)], axis=1
    )


# ----------------------------------------------------------------------------
# Kernels
# ----------------------------------------------------------------------------


def _fwd_kernel(
    spec: _TSpec,
    *refs,
):
    """``refs`` layout (G = spec.G, minors of Tm points):

      i_ref (B, S) SMEM — sample-tile id per step (non-decreasing),
      j_ref (B, G, S) SMEM — candidate source-MINOR ids (NTp_m = sentinel),
      smp_t_ref (1, 8, T), then the candidate blocks — packed mode
      (spec.pack): G x record (1, R, LANE) carrying positions + bitcast bf16
      features; else G x cand_pos (1, Tm, LANE) + G x cand_feat (1, Tm, C)
      bf16 — then w1 (8, H), b1 (H, 1), w2, b2, _out_init/_cnt_init (aliased
      zeros), out_ref (1, T, C'), cnt_ref (1, T, 1) — accumulated across the
      tile's consecutive steps.
    """
    G = spec.G
    i_ref, j_ref, smp_t_ref = refs[0], refs[1], refs[2]
    n_min = G if spec.pack else 2 * G
    (w1_ref, b1_ref, w2_ref, b2_ref, _out_init, _cnt_init, out_ref,
     cnt_ref) = refs[3 + n_min :]
    step = pl.program_id(0)
    S = jnp.int32(spec.S)
    b, k = jax.lax.div(step, S), jax.lax.rem(step, S)
    i_cur = i_ref[b, k]
    i_prev = i_ref[b, jnp.maximum(k - 1, 0)]
    first = (k == 0) | (i_cur != i_prev)

    smp_t = smp_t_ref[0]  # (8, T)
    if spec.pack:
        Tm = spec.Tm or spec.T
        parts = [_unpack_minor(r[0], Tm, spec.C) for r in refs[3 : 3 + G]]
        cand = jnp.concatenate([p for p, _ in parts], axis=0)  # (G*Tm, 128)
        fz_all = jnp.concatenate([f for _, f in parts], axis=0)
    else:
        pos_refs = refs[3 : 3 + G]
        feat_refs = refs[3 + G : 3 + 2 * G]
        if G == 1:
            cand = pos_refs[0][0]  # (T, 128)
            fz_all = feat_refs[0][0]
        else:
            cand = jnp.concatenate([r[0] for r in pos_refs], axis=0)
            fz_all = jnp.concatenate([r[0] for r in feat_refs], axis=0)
    d2 = _pair_d2(cand, smp_t)  # (G*T, T): candidates x samples
    maskb = d2 <= spec.radius * spec.radius
    maskf = maskb.astype(jnp.float32)
    cnt = jnp.sum(maskf, axis=0)  # (T,)
    pen = jnp.where(maskb, 0.0, _NEG)  # additive penalty: no per-h multiply

    CO = spec.C if spec.CO is None else spec.CO
    fz = fz_all  # (G*T, C) bf16
    if spec.probe == "noop":  # grid + DMA + d2/cnt only (ROOFLINE probe)
        acc = jnp.zeros((spec.T, CO), jnp.float32)
    elif spec.probe == "planes":  # + plane generation, no feature matmuls
        acc = jnp.zeros((spec.T, CO), jnp.float32)
        cw = (
            jnp.dot(cand[:, :W1_ROWS], w1_ref[:],
                    preferred_element_type=jnp.float32)
            / spec.radius
        )
        swT = (
            jax.lax.dot_general(
                w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / spec.radius
        )
        for h in range(spec.H):
            pre = cw[:, h : h + 1] - swT[h : h + 1, :] + b1_ref[h, 0] + pen
            a_h = jnp.maximum(pre, 0.0)
            acc += jnp.sum(a_h, axis=0)[:, None]  # keep a_h live, no MXU
    elif spec.probe == "mm":  # d2 + the 9 feature matmuls, no plane VPU
        acc = jnp.zeros((spec.T, CO), jnp.float32)
        for h in range(spec.H):
            g_h = _mm(d2, fz, ((0,), (0,)))  # (T, C)
            if spec.CO is None:
                acc += g_h * w2_ref[h : h + 1, :]
            else:
                acc += jnp.dot(g_h, w2_ref[h],
                               preferred_element_type=jnp.float32)
        g_0 = _mm(maskf, fz, ((0,), (0,)))
        if spec.CO is None:
            acc += g_0 * b2_ref[:]
        else:
            acc += jnp.dot(g_0, b2_ref[:], preferred_element_type=jnp.float32)
    else:
        inv_r = 1.0 / spec.radius
        cw = (
            jnp.dot(cand[:, :W1_ROWS], w1_ref[:],
                    preferred_element_type=jnp.float32)
            * inv_r
        )  # (T, H)
        swT = (
            jax.lax.dot_general(
                w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_r
        )  # (H, T)

        acc = jnp.zeros((spec.T, CO), jnp.float32)
        for h in range(spec.H):
            pre = cw[:, h : h + 1] - swT[h : h + 1, :] + b1_ref[h, 0] + pen
            a_h = jnp.maximum(pre, 0.0)  # (G*T, T); penalty zeroes masked pairs
            g_h = _mm(a_h, fz, ((0,), (0,)))  # (T, C)
            if spec.CO is None:
                acc += g_h * w2_ref[h : h + 1, :]
            else:
                acc += jnp.dot(g_h, w2_ref[h],
                               preferred_element_type=jnp.float32)
        g_0 = _mm(maskf, fz, ((0,), (0,)))
        if spec.CO is None:
            acc += g_0 * b2_ref[:]
        else:
            acc += jnp.dot(g_0, b2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(first)
    def _init():
        out_ref[0] = acc
        cnt_ref[0] = cnt[:, None]

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[0] += acc
        cnt_ref[0] += cnt[:, None]


# Additive out-of-radius penalty (same trick as dense_conv v2):
# relu(pre + _NEG) == 0 for any masked pair, so the per-h mask multiply is
# gone AND the relu mask can be recovered from the stored plane (a > 0).
# Magnitude check: |pre| <= 2 * SENTINEL * |w1| / r ~ 4e7 << 1e9.
_NEG = -1.0e9


def _bwd_kernel(
    spec: _TSpec,
    *refs,
):
    """v2 backward: penalty-folded stacked pair planes + Xh matmuls.

    Same ``refs`` layout as :func:`_bwd_kernel_v1` plus two trailing VMEM
    scratch refs: ``abig`` ((H+1)*G*T, T) bf16 — blocks h<H hold
    ``a_h = relu(pre_h + pen)`` (planes COMPUTED in f32, stored bf16 — see
    dense_conv._plane_fill for why the arithmetic must stay f32), block H
    holds the radius mask; ``tbig`` (H*G*T, C) bf16 — per-h cotangent
    copies ``ivd * w2_h`` (depthwise) / ``ivd @ w2_h^T`` (full conv).

    Scheme ported from dense_conv v2 (docs/ROUND3.md item 1):
    ``X_h = a_h^T @ ivd`` serves BOTH dfeat (``X_h * w2_h`` summed over h)
    and dw2_h (``sum_p fz ⊙ X_h``); ``D = tbig @ fz^T`` feeds dw1/db1 via
    ``dpre = D * (abig > 0)`` — the relu mask is recovered from the stored
    plane, so v1's second per-h VPU plane is gone. Backward matmul families:
    3H+2 (v1) -> 2H+1.
    """
    G = spec.G
    Tm = spec.Tm or spec.T
    Q = G * Tm
    CO = spec.C if spec.CO is None else spec.CO
    j_ref, i_ref, src_t_ref, src_feat_ref = refs[:4]
    n_min = G if spec.pack else 2 * G
    (w1_ref, b1_ref, w2_ref, b2_ref, _dfeat_init, dfeat_ref, dw1_ref,
     db1_ref, dw2_ref, db2_ref, abig_ref, tbig_ref) = refs[4 + n_min :]
    step = pl.program_id(0)
    S = jnp.int32(spec.S)
    b, k = jax.lax.div(step, S), jax.lax.rem(step, S)
    j_cur = j_ref[b, k]
    j_prev = j_ref[b, jnp.maximum(k - 1, 0)]
    first = (k == 0) | (j_cur != j_prev)

    @pl.when(step == 0)
    def _zero_params():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    src_t = src_t_ref[0]  # (8, Tp)
    if spec.pack:
        parts = [_unpack_minor(r[0], Tm, CO) for r in refs[4 : 4 + G]]
        q = jnp.concatenate([p for p, _ in parts], axis=0)  # (Q, 128)
        dout_all = jnp.concatenate([f for _, f in parts], axis=0)  # bf16
    else:
        smp_refs = refs[4 : 4 + G]
        dout_refs = refs[4 + G : 4 + 2 * G]
        if G == 1:
            q = smp_refs[0][0]  # (Q, 128)
            dout_all = dout_refs[0][0]
        else:
            q = jnp.concatenate([r[0] for r in smp_refs], axis=0)  # (Q, 128)
            dout_all = jnp.concatenate([r[0] for r in dout_refs], axis=0)
    d2 = _pair_d2(q, src_t)  # (Q, Tp)
    maskb = d2 <= spec.radius * spec.radius
    pen = jnp.where(maskb, 0.0, _NEG)

    if spec.probe == "bwd_noop":  # grid + DMA + d2 only (ROOFLINE probe)
        zero = jnp.sum(pen) * 0.0

        @pl.when(first)
        def _init_probe():
            dfeat_ref[0] = jnp.zeros((spec.T, spec.C), jnp.float32) + zero

        @pl.when(jnp.logical_not(first))
        def _accum_probe():
            dfeat_ref[0] += zero

        return

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
    )  # (H, Tp)
    for h in range(spec.H):
        # offset = src_p - smp_q  =>  pre_h[q, p] = spT[h, p] - cwq[q, h] + b1
        pre = spT[h : h + 1, :] - cwq[:, h : h + 1] + b1_ref[h, 0] + pen
        abig_ref[h * Q : (h + 1) * Q, :] = jnp.maximum(pre, 0.0).astype(
            FEAT_DTYPE
        )
    abig_ref[spec.H * Q :, :] = maskb.astype(FEAT_DTYPE)

    ivd = dout_all.astype(FEAT_DTYPE)  # (Q, CO')
    fz = src_feat_ref[0]  # (Tp, C) bf16
    fzf = fz.astype(jnp.float32)
    for h in range(spec.H):
        if spec.CO is None:
            tbig_ref[h * Q : (h + 1) * Q, :] = ivd * w2_ref[
                h : h + 1, :
            ].astype(FEAT_DTYPE)
        else:
            tbig_ref[h * Q : (h + 1) * Q, :] = jax.lax.dot_general(
                ivd, w2_ref[h].astype(FEAT_DTYPE), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(FEAT_DTYPE)

    A = abig_ref[:]  # ((H+1)Q, Tp) bf16
    acc = jnp.zeros((spec.T, spec.C), jnp.float32)  # dfeat for this src tile
    for h in range(spec.H + 1):
        blk = A[h * Q : (h + 1) * Q, :]  # (Q, Tp) bf16
        X = jax.lax.dot_general(
            blk, ivd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tp, CO')
        if spec.CO is None:
            row = w2_ref[h : h + 1, :] if h < spec.H else b2_ref[:]
            acc += X * row
            s = jnp.sum(fzf * X, axis=0, keepdims=True)  # (1, C)
            if h < spec.H:
                dw2_ref[h : h + 1, :] += s
            else:
                db2_ref[:] += s
        else:
            wmat = w2_ref[h] if h < spec.H else b2_ref[:]  # (C, CO)
            acc += jax.lax.dot_general(
                X, wmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Tp, C)
            g = jax.lax.dot_general(
                fzf, X, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, CO)
            if h < spec.H:
                dw2_ref[h] += g
            else:
                db2_ref[:] += g

    D = _mm(tbig_ref[:], fz, ((1,), (1,)))  # (HQ, Tp)
    # relu mask recovered from the stored plane; the compare runs in f32
    # (Mosaic rejects bf16 cmpf — CLAUDE.md)
    relu_on = A[: spec.H * Q, :].astype(jnp.float32) > 0.0
    dpre = D * relu_on.astype(jnp.float32)
    d3 = dpre.reshape(spec.H, Q, spec.T)
    rq = jnp.sum(d3, axis=2)  # (H, Q)
    rp = jnp.sum(d3, axis=1)  # (H, Tp)
    q8 = q[:, :W1_ROWS]  # (Q, 8); sentinel rows pair with zero rq
    t_smp = jax.lax.dot_general(
        q8, rq, (((0,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )  # (8, H)
    t_src = jax.lax.dot_general(
        src_t, rp, (((1,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )  # (8, H)
    dw1_ref[:] += (t_src - t_smp) * inv_r
    db1_ref[:] += jnp.sum(rp, axis=1, keepdims=True)  # (H, 1)

    @pl.when(first)
    def _init():
        dfeat_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        dfeat_ref[0] += acc


def _bwd_kernel_v1(
    spec: _TSpec,
    *refs,
):
    """``refs`` layout (G = spec.G):

      j_ref (B, S) SMEM — source-tile id per step (non-decreasing),
      i_ref (B, G, S) SMEM — candidate sample-tile ids (NTs = sentinel),
      src_t_ref (1, 8, T), src_feat_ref (1, T, C) bf16,
      G x smp_pos (1, T, LANE), G x dout (1, T, C'),
      w1, b1, w2, b2, _dfeat_init (aliased zeros),
      dfeat_ref (1, T, C) — accumulated across the source tile's steps,
      dw1 (8, H), db1 (H, 1), dw2, db2 — accumulated across the whole grid.
    """
    G = spec.G
    j_ref, i_ref, src_t_ref, src_feat_ref = refs[:4]
    smp_refs = refs[4 : 4 + G]
    dout_refs = refs[4 + G : 4 + 2 * G]
    (w1_ref, b1_ref, w2_ref, b2_ref, _dfeat_init, dfeat_ref, dw1_ref,
     db1_ref, dw2_ref, db2_ref) = refs[4 + 2 * G :]
    step = pl.program_id(0)
    S = jnp.int32(spec.S)
    b, k = jax.lax.div(step, S), jax.lax.rem(step, S)
    j_cur = j_ref[b, k]
    j_prev = j_ref[b, jnp.maximum(k - 1, 0)]
    first = (k == 0) | (j_cur != j_prev)

    @pl.when(step == 0)
    def _zero_params():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    src_t = src_t_ref[0]  # (8, T)
    if G == 1:
        q = smp_refs[0][0]  # (T, 128) — lanes 3.. zero by construction
        dout_all = dout_refs[0][0]
    else:
        q = jnp.concatenate([r[0] for r in smp_refs], axis=0)  # (G*T, 128)
        dout_all = jnp.concatenate([r[0] for r in dout_refs], axis=0)
    d2 = _pair_d2(q, src_t)  # (G*T_q, T_p)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)

    inv_r = 1.0 / spec.radius
    cwq = (
        jnp.dot(q[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
        * inv_r
    )  # (Tq, H)
    spT = (
        jax.lax.dot_general(
            w1_ref[:], src_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_r
    )  # (H, Tp)
    dout = dout_all  # (G*Tq, C') f32
    fz = src_feat_ref[0]  # (Tp, C) bf16
    q8 = q[:, :W1_ROWS]  # (G*Tq, 8)

    acc = jnp.zeros((spec.T, spec.C), jnp.float32)
    for h in range(spec.H):
        # offset = src_p - smp_q  =>  pre_h[q, p] = spT[h, p] - cwq[q, h] + b1
        pre = spT[h : h + 1, :] - cwq[:, h : h + 1] + b1_ref[h, 0]
        relu_on = (pre > 0.0).astype(jnp.float32) * maskf
        a_h = jnp.maximum(pre, 0.0) * maskf  # (Tq, Tp)
        if spec.CO is None:
            t_h = dout * w2_ref[h : h + 1, :]  # (Tq, C)
        else:
            t_h = jax.lax.dot_general(
                dout, w2_ref[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Tq, C)
        acc += _mm(a_h, t_h, ((0,), (0,)))  # dfeat: (Tp, C)

        g_h = _mm(a_h, fz, ((1,), (0,)))  # (Tq, C)
        if spec.CO is None:
            dw2_ref[h : h + 1, :] += jnp.sum(dout * g_h, axis=0, keepdims=True)
        else:
            dw2_ref[h] += jax.lax.dot_general(
                g_h, dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, CO)
        da_h = _mm(t_h, fz, ((1,), (1,)))  # (Tq, Tp)
        dpre = da_h * relu_on
        rq = jnp.sum(dpre, axis=1, keepdims=True)  # (Tq, 1)
        rp = jnp.sum(dpre, axis=0, keepdims=True)  # (1, Tp)
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
        t_0 = dout * b2_ref[:]
    else:
        t_0 = jax.lax.dot_general(
            dout, b2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += _mm(maskf, t_0, ((0,), (0,)))

    g_0 = _mm(maskf, fz, ((1,), (0,)))  # (Tq, C)
    if spec.CO is None:
        db2_ref[:] += jnp.sum(dout * g_0, axis=0, keepdims=True)
    else:
        db2_ref[:] += jax.lax.dot_general(
            g_0, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first)
    def _init():
        dfeat_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        dfeat_ref[0] += acc


# ----------------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------------


def _fwd_call(spec: _TSpec, B, smp_t, src_pos, src_feat, w1, b1, w2, b2, i_ids, j_ids):
    S, T, G = spec.S, spec.T, spec.G
    Tm = spec.Tm or T
    CO = spec.C if spec.CO is None else spec.CO

    def ix_i(s, i, j):
        b = jax.lax.div(s, jnp.int32(S))
        return (b, i[b, jax.lax.rem(s, jnp.int32(S))], 0)

    def ix_jg(g):
        def ix(s, i, j):
            b = jax.lax.div(s, jnp.int32(S))
            return (b, j[b, g, jax.lax.rem(s, jnp.int32(S))], 0)

        return ix

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    if spec.pack:  # src_pos IS the packed record buffer; src_feat unused
        R = _pack_rows(Tm, spec.C)
        minor_specs = [vm((1, R, LANE), ix_jg(g)) for g in range(G)]
        minor_ops = [src_pos] * G
    else:
        minor_specs = [vm((1, Tm, LANE), ix_jg(g)) for g in range(G)] + [
            vm((1, Tm, spec.C), ix_jg(g)) for g in range(G)
        ]
        minor_ops = [src_pos] * G + [src_feat] * G
    n_in = 2 + len(minor_ops) + 4 + 2  # prefetch + blocks + params + inits
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * S,),
            in_specs=[vm((1, 8, T), ix_i)]
            + minor_specs
            + [vm(), vm(), vm(), vm()]
            + [
                vm((1, T, CO), ix_i),  # zero init for out (aliased)
                vm((1, T, 1), ix_i),  # zero init for cnt (aliased)
            ],
            out_specs=[vm((1, T, CO), ix_i), vm((1, T, 1), ix_i)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, spec.NTs * T, CO), jnp.float32),
            jax.ShapeDtypeStruct((B, spec.NTs * T, 1), jnp.float32),
        ],
        # zero inits -> never-visited tiles keep exact zeros
        input_output_aliases={n_in - 1: 0, n_in: 1},
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        i_ids, j_ids, smp_t,
        *minor_ops,
        w1, b1, w2, b2,
        jnp.zeros((B, spec.NTs * T, CO), jnp.float32),
        jnp.zeros((B, spec.NTs * T, 1), jnp.float32),
    )


def _bwd_call(
    spec: _TSpec, B, src_t, src_feat, smp_pos, dout, w1, b1, w2, b2, jb_ids, ib_ids
):
    S, T, G = spec.S, spec.T, spec.G
    Tm = spec.Tm or T
    CO = spec.C if spec.CO is None else spec.CO

    def ix_j(s, j, i):
        b = jax.lax.div(s, jnp.int32(S))
        return (b, j[b, jax.lax.rem(s, jnp.int32(S))], 0)

    def ix_ig(g):
        def ix(s, j, i):
            b = jax.lax.div(s, jnp.int32(S))
            return (b, i[b, g, jax.lax.rem(s, jnp.int32(S))], 0)

        return ix

    const2 = lambda s, j, i: (0, 0)
    const3 = lambda s, j, i: (0, 0, 0)
    w2_shape = (spec.H, spec.C) if spec.CO is None else (spec.H, spec.C, spec.CO)
    b2_shape = (1, spec.C) if spec.CO is None else (spec.C, spec.CO)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    use_v1 = os.environ.get("MCCNN_TILE_BWD_V1") == "1"
    assert not (use_v1 and spec.pack), "v1 backward has no packed-operand path"
    if spec.pack:  # smp_pos IS the packed (positions + bf16 dout) buffer
        R = _pack_rows(Tm, CO)
        minor_specs = [vm((1, R, LANE), ix_ig(g)) for g in range(G)]
        minor_ops = [smp_pos] * G
    else:
        minor_specs = [vm((1, Tm, LANE), ix_ig(g)) for g in range(G)] + [
            vm((1, Tm, CO), ix_ig(g)) for g in range(G)
        ]
        minor_ops = [smp_pos] * G + [dout] * G
    dfeat_init_idx = 4 + len(minor_ops) + 4  # index of the aliased zeros
    Q = G * Tm
    scratch = (
        []
        if use_v1
        else [
            pltpu.VMEM(((spec.H + 1) * Q, T), FEAT_DTYPE),  # abig planes
            pltpu.VMEM((spec.H * Q, spec.C), FEAT_DTYPE),  # tbig copies
        ]
    )
    dfeat, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel_v1 if use_v1 else _bwd_kernel, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * S,),
            in_specs=[
                vm((1, 8, T), ix_j),
                vm((1, T, spec.C), ix_j),
            ]
            + minor_specs
            + [vm(), vm(), vm(), vm()]
            + [vm((1, T, spec.C), ix_j)],  # zero init for dfeat (aliased)
            out_specs=[
                vm((1, T, spec.C), ix_j),
                vm((W1_ROWS, spec.H), const2),
                vm((spec.H, 1), const2),
                vm(w2_shape, const2 if spec.CO is None else const3),
                vm(b2_shape, const2),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, spec.NTp * T, spec.C), jnp.float32),
            jax.ShapeDtypeStruct((W1_ROWS, spec.H), jnp.float32),
            jax.ShapeDtypeStruct((spec.H, 1), jnp.float32),
            jax.ShapeDtypeStruct(w2_shape, jnp.float32),
            jax.ShapeDtypeStruct(b2_shape, jnp.float32),
        ],
        input_output_aliases={dfeat_init_idx: 0},
        interpret=spec.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        jb_ids, ib_ids, src_t, src_feat,
        *minor_ops,
        w1, b1, w2, b2,
        jnp.zeros((B, spec.NTp * T, spec.C), jnp.float32),
    )
    return dfeat, dw1, db1, dw2, db2


# ----------------------------------------------------------------------------
# custom VJP core
# ----------------------------------------------------------------------------


def _ids(x):
    return x.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tile_conv_core(
    spec: _TSpec, w1, b1, w2, b2, smp_t, smp_pos_m, src_pos_m, src_t,
    src_feat_m, src_feat_M, i_f, j_f, jb_f, ib_f,
):
    """``_m`` operands are MINOR-layout row buffers (the candidate side of
    each direction: fwd source minors, bwd sample minors); ``smp_t`` /
    ``src_t`` / ``src_feat_M`` are major-layout (per-major-tile metas,
    backward feature blocks). With Tm == T the two layouts coincide and the
    wrapper passes the same arrays."""
    B = smp_t.shape[0]
    out, cnt = _fwd_call(
        spec, B, smp_t, src_pos_m, src_feat_m, w1, b1, w2, b2,
        _ids(i_f), _ids(j_f),
    )
    return out, cnt


def _core_fwd(
    spec, w1, b1, w2, b2, smp_t, smp_pos_m, src_pos_m, src_t, src_feat_m,
    src_feat_M, i_f, j_f, jb_f, ib_f,
):
    B = smp_t.shape[0]
    out, cnt = _fwd_call(
        spec, B, smp_t, src_pos_m, src_feat_m, w1, b1, w2, b2,
        _ids(i_f), _ids(j_f),
    )
    return (out, cnt), (
        w1, b1, w2, b2, smp_pos_m, src_t, src_feat_M, jb_f, ib_f,
    )


def _core_bwd(spec, res, cts):
    dout, _dcnt = cts  # cnt does not depend on params/features
    w1, b1, w2, b2, smp_pos_m, src_t, src_feat_M, jb_f, ib_f = res
    B = src_t.shape[0]
    Tm = spec.Tm or spec.T
    nts_m = spec.NTs_m or spec.NTs * (spec.T // Tm)
    ntp_m = spec.NTp_m or spec.NTp * (spec.T // Tm)
    # Re-layout the out cotangent to sample-MINOR rows: the sorted sequence
    # is shared, minor rows are a prefix of the (coarser-padded) major rows,
    # and rows past the real sample count carry zero cotangent (unsort reads
    # only the first M rows). Sentinel minor tile appended: zero rows.
    dout_pad = jnp.pad(
        dout[:, : nts_m * Tm], ((0, 0), (0, Tm), (0, 0))
    )
    if spec.pack:
        # bf16 here == the kernel's own ivd cast, just moved before the DMA
        smp_op = _pack_minor(smp_pos_m, dout_pad.astype(FEAT_DTYPE), Tm)
        dout_pad = None
    else:
        smp_op = smp_pos_m
        if os.environ.get("MCCNN_TILE_BWD_V1") != "1":
            # v2 backward consumes the cotangent as bf16 (ivd) anyway:
            # casting before the DMA halves its bytes, value-identical.
            # (v1 keeps f32 — its dw2/dfeat math multiplies dout directly.)
            dout_pad = dout_pad.astype(FEAT_DTYPE)
    dfeat, dw1, db1, dw2, db2 = _bwd_call(
        spec, B, src_t, src_feat_M, smp_op, dout_pad, w1, b1, w2, b2,
        _ids(jb_f), _ids(ib_f),
    )
    # Cotangent of src_feat_M must match its (B, (NTp+1)*T, C) shape; the
    # minor copy src_feat_m gets zeros (the wrapper derives both from the
    # same features, so the full gradient rides the major copy alone).
    dfeat = jnp.pad(dfeat, ((0, 0), (0, spec.T), (0, 0)))
    return (
        dw1,
        db1,
        dw2,
        db2,
        jnp.zeros((B, spec.NTs * 8, spec.T), jnp.float32),  # smp_t
        jnp.zeros_like(smp_pos_m),
        jnp.zeros(
            (
                B,
                (ntp_m + 1)
                * (_pack_rows(Tm, spec.C) if spec.pack else Tm),
                LANE,
            ),
            jnp.float32,
        ),  # src_pos_m (packed records when spec.pack)
        jnp.zeros_like(src_t),
        jnp.zeros(
            (B, (ntp_m + 1) * Tm, spec.C), src_feat_M.dtype
        ),  # src_feat_m
        dfeat.astype(src_feat_M.dtype),
        jnp.zeros_like(jb_f),  # i_f
        jnp.zeros_like(jb_f),  # j_f
        jnp.zeros_like(jb_f),
        jnp.zeros_like(ib_f),
    )


_tile_conv_core.defvjp(_core_fwd, _core_bwd)


# ----------------------------------------------------------------------------
# public entry
# ----------------------------------------------------------------------------


def tile_mc_conv(
    params: MCConvParams,
    sample_pts: Array,
    sample_mask: Array,
    src_pts: Array,
    src_mask: Array,
    features: Array,
    pdf: Array,
    radius: float,
    *,
    max_pairs: int,
    max_steps: int | None = None,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    minor: int | None = None,
    c_out: int | None = None,
    mean_normalize: bool = False,
    interpret: bool = False,
    with_overflow: bool = False,
) -> Array:
    """Monte-Carlo conv via the z-order tile kernel (big-scene path).

    Semantics match ``core.mc_conv`` with unbounded neighbor capacity (all
    in-radius neighbors contribute), like ``bucket_mc_conv``. ``max_pairs``
    is the static per-cloud tile-pair capacity — size it with
    ``count_tile_pairs`` / ``auto_tile_pairs`` (pairs beyond it are dropped).
    ``chunk`` groups that many candidate tiles per grid step ((chunk*T, T)
    pair planes): fewer grid steps and taller MXU operands at the cost of
    <= one partial chunk of padding per output tile.

    ``minor`` (default ``tile_minor()``: DEFAULT_MINOR / env
    ``MCCNN_TILE_MINOR``) sets the CANDIDATE-side sub-tile granularity of
    both list directions: candidate tiles of ``minor`` points carry their own
    tighter AABBs (fewer surviving candidate points; -25 % at 64, -40 % at 32
    on the 32k bench scene) while majors stay ``tile``, so pair-plane shapes
    and per-major output accumulation are unchanged; the per-step chunk
    becomes ``chunk * tile / minor``. ``count_tile_steps`` /
    ``count_tile_pairs`` must see the same minor (they read the same env
    default).

    ``max_steps`` (optional) caps the static chunked-step budget DIRECTLY,
    overriding the worst-case-over-distributions budget derived from
    ``max_pairs`` when tighter. Padding steps cost full kernel compute, so on
    a fixed scene ``count_tile_steps`` here is the exact lossless budget and
    saves the ~1.8x worst-case inflation; steps beyond it are dropped (and
    counted by ``with_overflow``) exactly like pair overflow.

    ``with_overflow=True`` additionally returns the per-cloud DROPPED STEP
    count (int32, (B,)): the number of chunked grid steps (each carrying up
    to ``chunk`` tile pairs) that did not fit the static capacity, maxed
    over the forward/backward list directions. Nonzero means results are
    silently missing neighbor contributions — treat like
    ``BucketGrid.overflow`` and raise the capacity.
    """
    B, M, _ = sample_pts.shape
    N = src_pts.shape[1]
    C = features.shape[-1]
    H = params.w1.shape[1]
    T = tile
    assert T % LANE == 0, "tile must be a multiple of 128"

    Cp = -(-C // LANE) * LANE
    COp = None if c_out is None else -(-c_out // LANE) * LANE

    wf = features / pdf[..., None]
    if Cp != C:
        wf = jnp.pad(wf, ((0, 0), (0, 0), (0, Cp - C)))

    w1 = jnp.pad(params.w1, ((0, W1_ROWS - 3), (0, 0)))
    b1 = params.b1.reshape(H, 1)
    if c_out is None:
        w2 = jnp.pad(params.w2, ((0, 0), (0, Cp - C)))
        b2 = jnp.pad(params.b2.reshape(1, C), ((0, 0), (0, Cp - C)))
    else:
        w2 = jnp.pad(
            params.w2.reshape(H, C, c_out), ((0, 0), (0, Cp - C), (0, COp - c_out))
        )
        b2 = jnp.pad(params.b2.reshape(C, c_out), ((0, Cp - C), (0, COp - c_out)))

    Tm = tile_minor(T) if minor is None else minor
    assert T % Tm == 0 and Tm % 8 == 0, (T, Tm)
    Gm = chunk * (T // Tm)  # minor chunk: plane height stays chunk * T
    nts, ntp = -(-M // T), -(-N // T)
    nts_m, ntp_m = -(-M // Tm), -(-N // Tm)

    order_s = curve_order(sample_pts, sample_mask)
    order_p = curve_order(src_pts, src_mask)
    smp_rows, smp_valid, mn_i, mx_i = _sorted_tiles(
        sample_pts, sample_mask, order_s, T, nts * T
    )
    src_rows, src_valid, mn_j, mx_j = _sorted_tiles(
        src_pts, src_mask, order_p, T, ntp * T
    )
    if Tm == T:  # symmetric: minor layouts are the major ones
        smp_rows_m, src_rows_m = smp_rows, src_rows
        mn_i_m, mx_i_m, mn_j_m, mx_j_m = mn_i, mx_i, mn_j, mx_j
    else:
        smp_rows_m, _, mn_i_m, mx_i_m = _sorted_tiles(
            sample_pts, sample_mask, order_s, Tm, nts_m * Tm
        )
        src_rows_m, _, mn_j_m, mx_j_m = _sorted_tiles(
            src_pts, src_mask, order_p, Tm, ntp_m * Tm
        )

    wf_sorted = jnp.take_along_axis(wf, order_p[..., None], axis=1)
    wf_sorted = jnp.where(src_valid[:, :N, None], wf_sorted, 0.0)
    wf_M = jnp.pad(
        wf_sorted, ((0, 0), (0, (ntp + 1) * T - N), (0, 0))
    ).astype(FEAT_DTYPE)
    wf_m = (
        wf_M
        if Tm == T
        else jnp.pad(
            wf_sorted, ((0, 0), (0, (ntp_m + 1) * Tm - N), (0, 0))
        ).astype(FEAT_DTYPE)
    )

    # fwd direction: sample majors x source minors
    adj_f = _refined_adjacency(
        smp_rows, mn_i, mx_i, src_rows_m, mn_j_m, mx_j_m, T, radius, Tm
    )
    # bwd direction: source majors x sample minors
    adj_b = (
        jnp.swapaxes(adj_f, 1, 2)
        if Tm == T
        else _refined_adjacency(
            src_rows, mn_j, mx_j, smp_rows_m, mn_i_m, mx_i_m, T, radius, Tm
        )
    )
    # one static step count for both kernels; padding steps are
    # (last real major tile, all-sentinel minors)
    cap_f = min(max_pairs, nts * ntp_m)
    cap_b = min(max_pairs, ntp * nts_m)
    S = max(
        _steps_for_pairs(cap_f, Gm, nts, ntp_m),
        _steps_for_pairs(cap_b, Gm, ntp, nts_m),
    )
    if max_steps is not None:
        S = min(S, max(int(max_steps), 1))
    # fwd list: sorted by sample tile
    i_ids, j_ids = _chunked_pair_lists(adj_f, S, Gm, nts - 1, ntp_m)
    # bwd list: sorted by source tile
    jb_ids, ib_ids = _chunked_pair_lists(adj_b, S, Gm, ntp - 1, nts_m)

    smp_t = transposed_tiles(smp_rows[:, : nts * T], T)  # (B, nts*8, T)
    src_t = transposed_tiles(src_rows[:, : ntp * T], T)  # (B, ntp*8, T)

    # OPT-IN (MCCNN_TILE_PACK=1): halves DMA issues and is bitwise-exact,
    # but the packed kernels sent the Mosaic compile into a >25 min tailspin
    # on the 32k bench config (2026-08-19) — unusable as a default until a
    # future Mosaic digests the bitcast+concat pattern.
    pack = (
        os.environ.get("MCCNN_TILE_PACK") == "1"
        and os.environ.get("MCCNN_TILE_BWD_V1") != "1"
        and Tm % 2 == 0
    )
    spec = _TSpec(
        T=T, C=Cp, CO=COp, H=H, radius=radius, S=S, NTs=nts, NTp=ntp,
        interpret=interpret, G=Gm, Tm=Tm, NTs_m=nts_m, NTp_m=ntp_m,
        probe=os.environ.get("MCCNN_TILE_PROBE", ""), pack=pack,
    )
    src_minor_op = _pack_minor(src_rows_m, wf_m, Tm) if pack else src_rows_m

    out_sorted, cnt = _tile_conv_core(
        spec, w1, b1, w2, b2, smp_t, smp_rows_m, src_minor_op, src_t,
        wf_m, wf_M,
        i_ids.astype(jnp.float32), j_ids.astype(jnp.float32),
        jb_ids.astype(jnp.float32), ib_ids.astype(jnp.float32),
    )
    co_real = C if c_out is None else c_out
    out_sorted = out_sorted[..., :co_real]
    if mean_normalize:
        cnt = jax.lax.stop_gradient(cnt)
        out_sorted = out_sorted / jnp.maximum(cnt, 1.0)

    # Un-sort back to the caller's sample order; invalid samples get zeros.
    out_sorted = jnp.where(smp_valid[..., None], out_sorted, 0.0)

    def unsort(o, rows):
        return jnp.zeros((M, co_real), rows.dtype).at[o[:M]].set(rows[:M])

    out = jax.vmap(unsort)(order_s, out_sorted)
    out = jnp.where(sample_mask[..., None], out, 0.0)
    if with_overflow:
        need = jnp.maximum(_needed_steps(adj_f, Gm), _needed_steps(adj_b, Gm))
        return out, jnp.maximum(need - S, 0)
    return out


# ----------------------------------------------------------------------------
# Tile KDE (big-scene exact density — same machinery, no feature path)
# ----------------------------------------------------------------------------


def _kde_kernel(
    spec: _TSpec,
    h2: float,
    i_ref,  # (B, S) SMEM — sample-tile id per step (non-decreasing)
    j_ref,  # (B, G, S) SMEM — candidate meta-tile ids (NTs = sentinel)
    *refs,  # smp_rows (1, T, LANE), G x cand meta (1, 8, T),
    # _dens_init (1, T, 1) zeros aliased, dens_ref (1, T, 1)
):
    G = spec.G
    smp_rows_ref = refs[0]
    meta_refs = refs[1 : 1 + G]
    dens_ref = refs[-1]
    step = pl.program_id(0)
    S = jnp.int32(spec.S)
    b, k = jax.lax.div(step, S), jax.lax.rem(step, S)
    first = (k == 0) | (i_ref[b, k] != i_ref[b, jnp.maximum(k - 1, 0)])

    if G == 1:
        cand = meta_refs[0][0]  # (8, T)
    else:
        cand = jnp.concatenate([r[0] for r in meta_refs], axis=1)  # (8, G*T)
    d2 = _pair_d2(smp_rows_ref[0], cand)  # (T_smp, G*T)
    maskf = (d2 <= spec.radius * spec.radius).astype(jnp.float32)
    kern = jnp.exp(jnp.minimum(-0.5 * d2 / h2, 0.0)) * maskf
    dens = jnp.sum(kern, axis=1)  # (T_smp,) — over candidates

    @pl.when(first)
    def _init():
        dens_ref[0] = dens[:, None]

    @pl.when(jnp.logical_not(first))
    def _accum():
        dens_ref[0] += dens[:, None]


def tile_kde(
    points: Array,
    mask: Array,
    radius: float,
    *,
    max_pairs: int,
    max_steps: int | None = None,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    kde_window: float = 0.25,
    interpret: bool = False,
    with_overflow: bool = False,
) -> Array:
    """Exact Gaussian-KDE density via z-order tiles (big-scene path).

    Same estimator as ``core.pdf.kde_density``'s dense path — per-point sum
    of ``exp(-d^2 / 2h^2)`` over ALL in-radius neighbors (self included),
    ``h = kde_window * radius``, times the 3-D Gaussian normalization;
    masked points get density 1. Replaces the K-capacity tail-corrected
    approximation that the dense/Pallas paths hand off to above N=8192.
    ``max_pairs`` as in ``tile_mc_conv`` (``count_tile_pairs`` on the same
    point set twice); chunked into steps of ``chunk`` candidate tiles each —
    the candidate side rides the 4 KB (8, T) transposed metas, so a step
    moves G*4 KB instead of G*64 KB. ``with_overflow`` returns dropped
    chunked-STEP counts (cf. ``tile_mc_conv``).
    """
    import math

    B, N, _ = points.shape
    T = tile
    assert T % LANE == 0
    h = kde_window * float(radius)
    nt = -(-N // T)
    Tm = tile_minor(T)
    Gm = chunk * (T // Tm)
    nt_m = -(-N // Tm)

    order = curve_order(points, mask)
    rows, valid, mn, mx = _sorted_tiles(points, mask, order, T, nt * T)
    if Tm == T:
        rows_m, mn_m, mx_m = rows, mn, mx
    else:
        rows_m, _, mn_m, mx_m = _sorted_tiles(points, mask, order, Tm, nt_m * Tm)
    adj = _refined_adjacency(rows, mn, mx, rows_m, mn_m, mx_m, T, radius, Tm)
    cap = min(max_pairs, nt * nt_m)
    S = _steps_for_pairs(cap, Gm, nt, nt_m)
    if max_steps is not None:
        S = min(S, max(int(max_steps), 1))
    i_ids, j_ids = _chunked_pair_lists(adj, S, Gm, nt - 1, nt_m)
    G = Gm
    meta = transposed_tiles(rows_m, Tm)  # (B, (nt_m+1)*8, Tm) incl. sentinel

    spec = _TSpec(
        T=T, C=LANE, CO=None, H=0, radius=radius, S=S, NTs=nt, NTp=nt_m,
        interpret=interpret, G=G, Tm=Tm,
    )

    def ix_i(s, i, j):
        b = jax.lax.div(s, jnp.int32(S))
        return (b, i[b, jax.lax.rem(s, jnp.int32(S))], 0)

    def ix_mg(g):
        def ix(s, i, j):
            b = jax.lax.div(s, jnp.int32(S))
            return (b, j[b, g, jax.lax.rem(s, jnp.int32(S))], 0)

        return ix

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    dens = pl.pallas_call(
        functools.partial(_kde_kernel, spec, h * h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * S,),
            in_specs=[vm((1, T, LANE), ix_i)]
            + [vm((1, 8, Tm), ix_mg(g)) for g in range(G)]
            + [vm((1, T, 1), ix_i)],
            out_specs=vm((1, T, 1), ix_i),
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt * T, 1), jnp.float32),
        input_output_aliases={3 + G: 0},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        i_ids, j_ids, rows, *([meta] * G),
        jnp.zeros((B, nt * T, 1), jnp.float32),
    )

    norm = 1.0 / ((h**3) * (2.0 * math.pi) ** 1.5)
    dens = norm * dens[..., 0]

    def unsort(o, d):
        return jnp.zeros((N,), d.dtype).at[o[:N]].set(d[:N])

    out = jax.vmap(unsort)(order, dens)
    out = jnp.where(mask, out, 1.0)
    if with_overflow:
        need = _needed_steps(adj, G)
        return out, jnp.maximum(need - S, 0)
    return out


# ----------------------------------------------------------------------------
# Tile coverage sweep (big-scene Poisson sampler building block)
# ----------------------------------------------------------------------------


# Chunked cover steps carry the candidate side as (8, T) transposed meta
# tiles (4 KB vs the 64 KB position rows) and fold the per-color flag into
# the meta's |p|^2 row: an unflagged candidate gets |p|^2 = _FLAG_OFF, which
# pushes its d2 against ANY sample (real coords <= 1 or SENTINEL = 1e6,
# |cross| <= 6e6 << _FLAG_OFF) far past radius^2 — no flag operand, no
# per-pair flag multiply in the kernel.
_FLAG_OFF = 1.0e14
DEFAULT_COVER_CHUNK = 8


def _cover_kernel(
    spec: _TSpec,
    i_ref,  # (B, S) SMEM — sample-tile id per step (non-decreasing)
    j_ref,  # (B, G, S) SMEM — candidate meta-tile ids (NTs = sentinel)
    *refs,  # smp_rows (1, T, LANE), G x cand meta (1, 8, T),
    # _cov_init (1, T, 1) zeros aliased, cov_ref (1, T, 1)
):
    G = spec.G
    smp_rows_ref = refs[0]
    meta_refs = refs[1 : 1 + G]
    cov_ref = refs[-1]
    step = pl.program_id(0)
    S = jnp.int32(spec.S)
    b, k = jax.lax.div(step, S), jax.lax.rem(step, S)
    first = (k == 0) | (i_ref[b, k] != i_ref[b, jnp.maximum(k - 1, 0)])

    if G == 1:
        cand = meta_refs[0][0]  # (8, T)
    else:
        cand = jnp.concatenate([r[0] for r in meta_refs], axis=1)  # (8, G*T)
    d2 = _pair_d2(smp_rows_ref[0], cand)  # (T_smp, G*T)
    cov = jnp.sum(
        (d2 <= spec.radius * spec.radius).astype(jnp.float32), axis=1
    )  # (T_smp,)

    @pl.when(first)
    def _init():
        cov_ref[0] = cov[:, None]

    @pl.when(jnp.logical_not(first))
    def _accum():
        cov_ref[0] += cov[:, None]


class TileCoverSweep(NamedTuple):
    """Reusable z-order tile machinery for repeated coverage queries on ONE
    point set (the 27-color Poisson sweep runs 27 of them): curve order,
    sorted position rows, the AABB-pruned chunked step list, and the static
    spec. Build once with ``make_cover_sweep``; call ``counts(flags)`` per
    query."""

    order: Array  # (B, N) space-filling-curve argsort
    valid: Array  # (B, nt*T) sorted validity
    rows: Array  # (B, (nt+1)*T, LANE) sorted positions + sentinel tile
    smp_t: Array  # (B, (nt_m+1)*8, Tm) transposed MINOR meta incl. sentinel
    i_ids: Array  # (B, S) step-major sample-tile ids
    j_ids: Array  # (B, G, S) chunked candidate-MINOR ids (nt_m = sentinel)
    spec: _TSpec  # NTp carries the minor-tile count nt_m
    overflow: Array  # (B,) dropped chunked-STEP count (each step carries up
    # to G tile pairs); 0 when max_pairs covers the adjacency

    def counts(self, flags: Array) -> Array:
        """flags (B, nt*T) f32 over SORTED rows -> per-point in-radius
        flagged-neighbor counts (B, nt*T), self included."""
        spec = self.spec
        B = flags.shape[0]
        S, T, nt, G = spec.S, spec.T, spec.NTs, spec.G
        Tm, nt_m = spec.Tm or T, spec.NTp

        meta = self.smp_t.reshape(B, nt_m + 1, 8, Tm)
        f = jnp.pad(
            flags[:, : nt_m * Tm].reshape(B, nt_m, Tm) > 0.0,
            ((0, 0), (0, 1), (0, 0)),
        )
        s2 = jnp.where(f[:, :, None, :], meta[:, :, 3:4, :], _FLAG_OFF)
        meta = jnp.concatenate([meta[:, :, :3, :], s2, meta[:, :, 4:, :]], 2)
        meta = meta.reshape(B, (nt_m + 1) * 8, Tm)

        def ix_i(s, i, j):
            b = jax.lax.div(s, jnp.int32(S))
            return (b, i[b, jax.lax.rem(s, jnp.int32(S))], 0)

        def ix_mg(g):
            def ix(s, i, j):
                b = jax.lax.div(s, jnp.int32(S))
                return (b, j[b, g, jax.lax.rem(s, jnp.int32(S))], 0)

            return ix

        vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
        cov = pl.pallas_call(
            functools.partial(_cover_kernel, spec),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B * S,),
                in_specs=[vm((1, T, LANE), ix_i)]
                + [vm((1, 8, Tm), ix_mg(g)) for g in range(G)]
                + [vm((1, T, 1), ix_i)],
                out_specs=vm((1, T, 1), ix_i),
            ),
            out_shape=jax.ShapeDtypeStruct((B, nt * T, 1), jnp.float32),
            input_output_aliases={3 + G: 0},
            interpret=spec.interpret,
            compiler_params=_COMPILER_PARAMS,
        )(
            self.i_ids, self.j_ids, self.rows, *([meta] * G),
            jnp.zeros((B, nt * T, 1), jnp.float32),
        )
        return cov[..., 0]


def make_cover_sweep(
    points: Array,
    mask: Array,
    radius: float,
    *,
    max_pairs: int,
    max_steps: int | None = None,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_COVER_CHUNK,
    order: Array | None = None,
    interpret: bool = False,
) -> TileCoverSweep:
    """Build the reusable tile machinery for ``TileCoverSweep.counts``.

    ``order`` overrides the point ordering (default: ``curve_order``) — the
    big-scene sampler passes a CELL-Hilbert order so same-cell points form
    contiguous runs (core/sampling.py ``_poisson_tiles``). ``max_pairs`` is
    a tile-PAIR capacity; it is converted to chunked steps of ``chunk``
    candidate tiles each, with ``max_steps`` optionally capping the step
    budget directly (cf. ``tile_mc_conv``)."""
    B, N, _ = points.shape
    T = tile
    assert T % LANE == 0
    nt = -(-N // T)
    Tm = tile_minor(T)
    Gm = chunk * (T // Tm)
    nt_m = -(-N // Tm)
    if order is None:
        order = curve_order(points, mask)
    rows, valid, mn, mx = _sorted_tiles(points, mask, order, T, nt * T)
    if Tm == T:
        rows_m, mn_m, mx_m = rows, mn, mx
    else:
        rows_m, _, mn_m, mx_m = _sorted_tiles(points, mask, order, Tm, nt_m * Tm)
    adj = _refined_adjacency(rows, mn, mx, rows_m, mn_m, mx_m, T, radius, Tm)
    cap = min(max_pairs, nt * nt_m)
    S = _steps_for_pairs(cap, Gm, nt, nt_m)
    if max_steps is not None:
        S = min(S, max(int(max_steps), 1))
    i_ids, j_ids = _chunked_pair_lists(adj, S, Gm, nt - 1, nt_m)
    smp_t = transposed_tiles(rows_m, Tm)  # (B, (nt_m+1)*8, Tm) incl. sentinel
    spec = _TSpec(
        T=T, C=LANE, CO=None, H=0, radius=radius, S=S, NTs=nt, NTp=nt_m,
        interpret=interpret, G=Gm, Tm=Tm,
    )
    need = _needed_steps(adj, Gm)
    return TileCoverSweep(
        order=order, valid=valid, rows=rows, smp_t=smp_t, i_ids=i_ids,
        j_ids=j_ids, spec=spec, overflow=jnp.maximum(need - S, 0),
    )
