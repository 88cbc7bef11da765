"""Parity tests: the fused bucket Pallas kernel vs the jnp reference conv
(which itself is oracle-tested). Run in interpret mode on CPU; the compiled
TPU path is exercised by bench.py / the verify drive."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccnn_tpu.core import init_mcconv_params, mc_conv, radius_neighbors
from mccnn_tpu.core.buckets import build_buckets
from mccnn_tpu.ops.pallas import bucket_mc_conv


def setup(rng, B=2, N=64, M=48, c_in=8, radius=0.3):
    src = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    smp = rng.uniform(0, 1, size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, c_in)).astype(np.float32)
    smask = np.ones((B, N), bool)
    smask[:, -5:] = False
    qmask = np.ones((B, M), bool)
    qmask[:, -4:] = False
    pdf = rng.uniform(0.5, 2.0, size=(B, N)).astype(np.float32)
    return (
        jnp.asarray(src),
        jnp.asarray(smp),
        jnp.asarray(feats),
        jnp.asarray(smask),
        jnp.asarray(qmask),
        jnp.asarray(pdf),
    )


def reference(src, smp, feats, smask, qmask, pdf, radius, c_out, params):
    # jnp path with K >= any possible true count -> exact (no truncation)
    nbh = radius_neighbors(smp, qmask, src, smask, radius, src.shape[1])
    out = mc_conv(params, smp, nbh, src, feats, pdf, c_out=c_out)
    return jnp.where(qmask[..., None], out, 0.0)


def pallas_out(src, smp, feats, smask, qmask, pdf, radius, c_out, params):
    sg = build_buckets(smp, qmask, radius, cap=64)
    gg = build_buckets(src, smask, radius, cap=64)
    return bucket_mc_conv(
        params, sg, qmask, gg, feats, pdf, c_out=c_out, interpret=True
    )


@pytest.mark.parametrize("c_out", [None, 4], ids=["depthwise", "full"])
def test_forward_parity(rng, c_out):
    src, smp, feats, smask, qmask, pdf, radius = *setup(rng), 0.3
    params = init_mcconv_params(jax.random.PRNGKey(0), feats.shape[-1], c_out)
    want = np.asarray(
        reference(src, smp, feats, smask, qmask, pdf, radius, c_out, params)
    )
    got = np.asarray(
        pallas_out(src, smp, feats, smask, qmask, pdf, radius, c_out, params)
    )
    # the kernel runs its feature path in bf16 (f32 accumulation) by design
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


@pytest.mark.parametrize("c_out", [None, 4], ids=["depthwise", "full"])
def test_gradient_parity(rng, c_out):
    src, smp, feats, smask, qmask, pdf, radius = *setup(rng), 0.3
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], c_out)

    def loss_ref(p, f, d):
        return jnp.sum(reference(src, smp, f, smask, qmask, d, radius, c_out, p) ** 2)

    def loss_pal(p, f, d):
        return jnp.sum(pallas_out(src, smp, f, smask, qmask, d, radius, c_out, p) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, feats, pdf)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(params, feats, pdf)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 feature path: compare at bf16-appropriate tolerance
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2 * np.abs(a).max() + 1e-6)


def test_gradients_deterministic(rng):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    params = init_mcconv_params(jax.random.PRNGKey(2), feats.shape[-1], None)

    def loss(p, f):
        return jnp.sum(pallas_out(src, smp, f, smask, qmask, pdf, 0.3, None, p) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1))(params, feats)
    g2 = jax.grad(loss, argnums=(0, 1))(params, feats)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_small_grid_radius(rng):
    # radius 0.6 -> R=2: windows cover the whole grid; exercises ghost edges
    src, smp, feats, smask, qmask, pdf = setup(rng, N=32, M=24)
    params = init_mcconv_params(jax.random.PRNGKey(3), feats.shape[-1], None)
    want = np.asarray(reference(src, smp, feats, smask, qmask, pdf, 0.6, None, params))
    got = np.asarray(pallas_out(src, smp, feats, smask, qmask, pdf, 0.6, None, params))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_mean_normalize_parity(rng):
    # the reference's usePDF=False mode through the bucket kernel
    src, smp, feats, smask, qmask, pdf = setup(rng)
    ones = jnp.ones_like(pdf)
    params = init_mcconv_params(jax.random.PRNGKey(5), feats.shape[-1], None)
    nbh = radius_neighbors(smp, qmask, src, smask, 0.3, src.shape[1])
    want = jnp.where(
        qmask[..., None],
        mc_conv(params, smp, nbh, src, feats, ones, mean_normalize=True),
        0.0,
    )
    sg = build_buckets(smp, qmask, 0.3, cap=64)
    gg = build_buckets(src, smask, 0.3, cap=64)
    got = bucket_mc_conv(
        params, sg, qmask, gg, feats, ones,
        mean_normalize=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )


def test_active_brick_skip_matches_dense_sweep(rng):
    """Active-brick iteration (max_active_bricks via scalar prefetch) must be
    numerically IDENTICAL to the dense brick sweep — fwd, dfeat, and param
    grads — when the capacity covers all occupied bricks."""
    src, smp, feats, smask, qmask, pdf = setup(rng, B=2, N=96, M=80)
    radius = 0.18  # small radius -> several bricks, many empty
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], None)

    def run(nba):
        sg = build_buckets(smp, qmask, radius, cap=16)
        gg = build_buckets(src, smask, radius, cap=16)

        def loss(p, f):
            out = bucket_mc_conv(
                p, sg, qmask, gg, f, pdf, interpret=True,
                max_active_bricks=nba,
            )
            return jnp.sum(out * out), out

        (val, out), (gp, gf) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(params, feats)
        return out, gp, gf

    out_d, gp_d, gf_d = run(None)
    # capacity: number of bricks is small at this radius; 64 covers all
    out_a, gp_a, gf_a = run(64)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_a), np.asarray(gf_d), rtol=1e-6)
    for a, d in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=1e-6)
