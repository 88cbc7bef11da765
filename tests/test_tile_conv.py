"""Parity tests: the z-order tile Pallas kernel vs the jnp reference conv
(which itself is oracle-tested). Run in interpret mode on CPU; the compiled
TPU path is exercised by bench_suite / the verify drive.

The tile kernel is the big-scene path (SURVEY §2.1 spatial_conv at scene
scale); these tests use small clouds with several tiles so the pair-list
machinery (adjacency, padding entries, sentinel tiles, accumulation across
candidate steps) is fully exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccnn_tpu.core import init_mcconv_params, mc_conv, radius_neighbors
from mccnn_tpu.ops.pallas import count_tile_pairs, tile_mc_conv

TILE = 128  # smallest legal tile (lane width) — maximizes tiles per test


def setup(rng, B=2, N=400, M=180, c_in=8, radius=0.25):
    src = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    smp = rng.uniform(0, 1, size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, c_in)).astype(np.float32)
    smask = np.ones((B, N), bool)
    smask[0, -50:] = False
    qmask = np.ones((B, M), bool)
    qmask[-1, -20:] = False
    pdf = rng.uniform(0.5, 2.0, size=(B, N)).astype(np.float32)
    return (
        jnp.asarray(src),
        jnp.asarray(smp),
        jnp.asarray(feats),
        jnp.asarray(smask),
        jnp.asarray(qmask),
        jnp.asarray(pdf),
    )


def reference(src, smp, feats, smask, qmask, pdf, radius, c_out, params, **kw):
    nbh = radius_neighbors(smp, qmask, src, smask, radius, src.shape[1])
    out = mc_conv(params, smp, nbh, src, feats, pdf, c_out=c_out, **kw)
    return jnp.where(qmask[..., None], out, 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _max_pairs(smp, qmask, src, smask, radius):
    return int(count_tile_pairs(smp, qmask, src, smask, radius, TILE).max())


@pytest.mark.parametrize("c_out", [None, 48])
def test_tile_conv_matches_reference(rng, c_out):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], c_out)
    S = _max_pairs(smp, qmask, src, smask, radius)

    got = tile_mc_conv(
        params, smp, qmask, src, smask, feats, pdf, radius,
        max_pairs=S, tile=TILE, c_out=c_out, interpret=True,
    )
    want = reference(src, smp, feats, smask, qmask, pdf, radius, c_out, params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )


@pytest.mark.parametrize("minor", [64, 32])
def test_tile_conv_minor_granularity_cross_set(rng, minor):
    """Minor-granularity candidate sub-tiles (round 5): cross-set (M != N,
    masked both sides) forward AND grads must match the symmetric kernel —
    the bwd direction runs its own (source-major x sample-minor) adjacency
    and the feature cotangent rides the major-layout copy."""
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], None)
    S = _max_pairs(smp, qmask, src, smask, radius)

    def loss(p, f, m):
        o = tile_mc_conv(
            p, smp, qmask, src, smask, f, pdf, radius,
            max_pairs=S if m is None else 1 << 30, tile=TILE, minor=m,
            interpret=True,
        )
        return jnp.sum(o * o), o

    (_, ref), (_, got) = loss(params, feats, None), loss(params, feats, minor)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5,
        atol=1e-5 * float(jnp.abs(ref).max()),
    )
    gp_m, gf_m = jax.grad(lambda p, f: loss(p, f, minor)[0], (0, 1))(
        params, feats
    )
    gp_r, gf_r = jax.grad(lambda p, f: loss(p, f, None)[0], (0, 1))(
        params, feats
    )
    np.testing.assert_allclose(
        np.asarray(gf_m), np.asarray(gf_r), rtol=1e-5,
        atol=1e-5 * float(jnp.abs(gf_r).max()),
    )
    for a, b in zip(jax.tree.leaves(gp_m), jax.tree.leaves(gp_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5,
            atol=1e-5 * float(jnp.abs(b).max()),
        )


def test_tile_conv_packed_records_bitwise(rng, monkeypatch):
    """Opt-in packed minor records (MCCNN_TILE_PACK=1): one f32 record per
    candidate fusing positions + bitcast-bf16 payload. Forward and grads
    must be BITWISE equal to the unpacked kernel (the bf16 cotangent cast is
    the kernel's own ivd cast moved before the DMA)."""
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], None)

    def loss(f):
        o = tile_mc_conv(
            params, smp, qmask, src, smask, f, pdf, radius,
            max_pairs=1 << 30, tile=TILE, minor=32, interpret=True,
        )
        return jnp.sum(o * o), o

    (_, ref), gref = loss(feats), jax.grad(lambda f: loss(f)[0])(feats)
    monkeypatch.setenv("MCCNN_TILE_PACK", "1")
    (_, got), gpack = loss(feats), jax.grad(lambda f: loss(f)[0])(feats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(gpack), np.asarray(gref))


@pytest.mark.parametrize("chunk", [1, 3])
def test_tile_conv_grads_match_reference(rng, chunk):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], None)
    S = _max_pairs(smp, qmask, src, smask, radius)

    def loss_tile(p, f):
        o = tile_mc_conv(
            p, smp, qmask, src, smask, f, pdf, radius,
            max_pairs=S, tile=TILE, chunk=chunk, interpret=True,
        )
        return jnp.sum(o * o)

    def loss_ref(p, f):
        return jnp.sum(
            reference(src, smp, f, smask, qmask, pdf, radius, None, p) ** 2
        )

    gp_t, gf_t = jax.grad(loss_tile, argnums=(0, 1))(params, feats)
    gp_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(params, feats)
    scale = float(jnp.abs(gf_r).max())
    np.testing.assert_allclose(
        np.asarray(gf_t), np.asarray(gf_r), rtol=2e-2, atol=2e-2 * scale
    )
    for a, b in zip(jax.tree.leaves(gp_t), jax.tree.leaves(gp_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=2e-2, atol=2e-2 * float(jnp.abs(b).max()),
        )


def test_tile_conv_mean_normalize(rng):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(2), feats.shape[-1], None)
    S = _max_pairs(smp, qmask, src, smask, radius)
    got = tile_mc_conv(
        params, smp, qmask, src, smask, feats, pdf, radius,
        max_pairs=S, tile=TILE, mean_normalize=True, interpret=True,
    )
    want = reference(
        src, smp, feats, smask, qmask, pdf, radius, None, params,
        mean_normalize=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )


def test_tile_conv_generous_capacity_is_identical(rng):
    """Padding pair entries (sentinel tiles) must contribute exactly zero:
    max_pairs = exact count and max_pairs = way more must agree bitwise."""
    src, smp, feats, smask, qmask, pdf = setup(rng, B=1, N=300, M=300)
    radius = 0.2
    params = init_mcconv_params(jax.random.PRNGKey(3), feats.shape[-1], None)
    S = _max_pairs(smp, qmask, src, smask, radius)

    def run(cap):
        def loss(p, f):
            o = tile_mc_conv(
                p, smp, qmask, src, smask, f, pdf, radius,
                max_pairs=cap, tile=TILE, interpret=True,
            )
            return jnp.sum(o * o), o

        (_, out), (gp, gf) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(params, feats)
        return out, gp, gf

    out_a, gp_a, gf_a = run(S)
    out_b, gp_b, gf_b = run(S + 5)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(gf_a), np.asarray(gf_b))
    for a, b in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_kde_matches_dense_exact(rng):
    """tile_kde (z-order tiles, f32 VPU) vs the dense exact KDE path."""
    from mccnn_tpu.core import kde_density
    from mccnn_tpu.ops.pallas import tile_kde

    B, N, r = 2, 600, 0.18
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool)).at[0, 550:].set(False)
    S = int(count_tile_pairs(pts, mask, pts, mask, r, TILE).max())
    got = tile_kde(pts, mask, r, max_pairs=S, tile=TILE, interpret=True)
    want = kde_density(pts, mask, r)  # dense exact path on CPU at this N
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3
    )
    # masked points must report density 1 exactly
    np.testing.assert_array_equal(np.asarray(got[0, 550:]), 1.0)


def test_tile_conv_fully_masked_cloud(rng):
    src, smp, feats, smask, qmask, pdf = setup(rng, B=2, N=256, M=128)
    smask = smask.at[0].set(False)
    qmask = qmask.at[0].set(False)
    params = init_mcconv_params(jax.random.PRNGKey(4), feats.shape[-1], None)
    S = max(_max_pairs(smp, qmask, src, smask, 0.25), 1)
    out = tile_mc_conv(
        params, smp, qmask, src, smask, feats, pdf, 0.25,
        max_pairs=S, tile=TILE, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out[0]).sum()) == 0.0


def test_tile_conv_overflow_reported(rng):
    """Undersized static pair capacity must REPORT dropped work (nonzero
    per-cloud overflow); an exactly-sized capacity must report zero (VERDICT
    r2 item 3 — the one silent-wrongness edge of the stack)."""
    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(3), feats.shape[-1], None)
    full = _max_pairs(smp, qmask, src, smask, radius)

    def run(max_pairs, chunk=1):
        return tile_mc_conv(
            params, smp, qmask, src, smask, feats, pdf, radius,
            max_pairs=max_pairs, tile=TILE, chunk=chunk, interpret=True,
            with_overflow=True,
        )

    out_ok, ovf_ok = run(full)
    assert int(jnp.max(ovf_ok)) == 0
    out_low, ovf_low = run(max(full // 4, 1))
    assert int(jnp.max(ovf_low)) > 0
    # and the undersized outputs really are different (the thing the counter
    # exists to catch)
    assert not np.allclose(np.asarray(out_ok), np.asarray(out_low))


def test_tile_kde_overflow_reported(rng):
    from mccnn_tpu.ops.pallas import tile_kde

    src, _, _, smask, _, _ = setup(rng)
    radius = 0.25
    full = int(count_tile_pairs(src, smask, src, smask, radius, TILE).max())
    _, ovf = tile_kde(
        src, smask, radius, max_pairs=full, tile=TILE, interpret=True,
        with_overflow=True,
    )
    assert int(jnp.max(ovf)) == 0
    # chunked capacity carries one partial chunk of slack per sample tile, so
    # at this 4-tile scene a quartered pair budget still fits at G=8 (and
    # that is CORRECT — nothing is dropped); force G=1, where steps == pairs
    # and the quartered budget genuinely drops work.
    _, ovf_low = tile_kde(
        src, smask, radius, max_pairs=max(full // 4, 1), tile=TILE, chunk=1,
        interpret=True, with_overflow=True,
    )
    assert int(jnp.max(ovf_low)) > 0


def test_auto_tile_pairs_covers_batch(rng):
    """The auto-sized capacity (now derived from MEASURED chunked-step
    demand, not the worst-case pair-distribution bound) must still cover the
    sizing batch's own demand: the conv it configures drops zero steps."""
    from mccnn_tpu.ops.pallas import auto_tile_pairs

    src, _, feats, smask, _, pdf = setup(rng)
    radius = 0.25
    cap = auto_tile_pairs(src, smask, radius, tile=TILE, headroom=1.0)
    assert cap % 256 == 0
    params = init_mcconv_params(jax.random.PRNGKey(5), feats.shape[-1], None)
    _, ovf = tile_mc_conv(
        params, src, smask, src, smask, feats, pdf, radius,
        max_pairs=cap, tile=TILE, interpret=True, with_overflow=True,
    )
    assert int(jnp.max(ovf)) == 0


def test_tile_conv_exact_max_steps_is_identical(rng):
    """``max_steps=count_tile_steps`` is the tight lossless budget: outputs
    and grads bitwise-match the generous worst-case budget (the ~1.8x step
    inflation it removes was pure padding), and one step less genuinely
    drops work (reported by the overflow counter)."""
    from mccnn_tpu.ops.pallas import count_tile_steps

    src, smp, feats, smask, qmask, pdf = setup(rng)
    radius = 0.25
    params = init_mcconv_params(jax.random.PRNGKey(4), feats.shape[-1], None)
    steps = int(
        count_tile_steps(smp, qmask, src, smask, radius, TILE).max()
    )

    def run(**kw):
        def loss(p, f):
            o, ovf = tile_mc_conv(
                p, smp, qmask, src, smask, f, pdf, radius,
                tile=TILE, interpret=True, with_overflow=True, **kw,
            )
            return jnp.sum(o * o), (o, ovf)

        (_, (out, ovf)), (gp, gf) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(params, feats)
        return out, ovf, gp, gf

    out_a, ovf_a, gp_a, gf_a = run(max_pairs=1 << 30, max_steps=steps)
    out_b, ovf_b, gp_b, gf_b = run(
        max_pairs=_max_pairs(smp, qmask, src, smask, radius)
    )
    assert int(jnp.max(ovf_a)) == 0 and int(jnp.max(ovf_b)) == 0
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(gf_a), np.asarray(gf_b))
    for a, b in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_low, ovf_low, gp_low, gf_low = run(
        max_pairs=1 << 30, max_steps=steps - 1
    )
    assert int(jnp.max(ovf_low)) > 0
    # the binding direction may be the forward (by-sample) or backward
    # (by-source) list — dropping its last step must change SOME result
    changed = not np.allclose(np.asarray(out_a), np.asarray(out_low))
    changed = changed or not np.allclose(np.asarray(gf_a), np.asarray(gf_low))
    for a, b in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_low)):
        changed = changed or not np.allclose(np.asarray(a), np.asarray(b))
    assert changed


def test_hilbert_order_matches_skilling_reference(rng):
    """jnp Hilbert index agrees with a scalar numpy Skilling transform, is a
    permutation, and sorts masked points last."""
    from mccnn_tpu.ops.pallas.tile_conv import MORTON_BITS, hilbert_order

    def skilling(c, bits):
        X = [int(c[0]), int(c[1]), int(c[2])]
        n, M = 3, 1 << (bits - 1)
        Q = M
        while Q > 1:
            P = Q - 1
            for i in range(n):
                if X[i] & Q:
                    X[0] ^= P
                else:
                    t = (X[0] ^ X[i]) & P
                    X[0] ^= t
                    X[i] ^= t
            Q >>= 1
        for i in range(1, n):
            X[i] ^= X[i - 1]
        t, Q = 0, M
        while Q > 1:
            if X[n - 1] & Q:
                t ^= Q - 1
            Q >>= 1
        X = [x ^ t for x in X]
        code = 0
        for b in range(bits - 1, -1, -1):
            for i in range(n):
                code = (code << 1) | ((X[i] >> b) & 1)
        return code

    B, N = 2, 96
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[1, -10:] = False
    order = np.asarray(hilbert_order(jnp.asarray(pts), jnp.asarray(mask)))
    res = 1 << MORTON_BITS
    cells = np.clip((pts * res).astype(np.int64), 0, res - 1)
    for b in range(B):
        assert sorted(order[b].tolist()) == list(range(N))
        codes = np.array(
            [
                skilling(cells[b, i], MORTON_BITS) if mask[b, i] else 2**30
                for i in range(N)
            ]
        )
        assert np.array_equal(order[b], np.argsort(codes, kind="stable"))


def test_hilbert_order_cuts_tile_pairs(rng):
    """The reason Hilbert is the default: on a surface-like scene it yields
    tighter tile AABBs than Morton, so fewer tile pairs survive pruning."""
    import os

    n = 4096
    u = rng.uniform(0, 1, size=(1, n, 2)).astype(np.float32)
    z = 0.5 + 0.05 * np.sin(6 * u[..., 0]) * np.cos(6 * u[..., 1])
    pts = jnp.asarray(np.concatenate([u, z[..., None]], -1).astype(np.float32))
    mask = jnp.ones((1, n), bool)
    hil = int(count_tile_pairs(pts, mask, pts, mask, 0.1, TILE).max())
    os.environ["MCCNN_TILE_ORDER"] = "morton"
    try:
        mor = int(count_tile_pairs(pts, mask, pts, mask, 0.1, TILE).max())
    finally:
        del os.environ["MCCNN_TILE_ORDER"]
    assert hil < mor
