import numpy as np
import jax
import jax.numpy as jnp

from mccnn_tpu.core import (
    init_mcconv_params,
    kde_density,
    mc_conv,
    radius_neighbors,
)
from oracles import oracle_kde, oracle_mcconv


def setup(rng, B=2, N=50, M=20, c_in=6, radius=0.35, k=64):
    src = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    smp = rng.uniform(0, 1, size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, c_in)).astype(np.float32)
    smask = np.ones((B, N), bool)
    qmask = np.ones((B, M), bool)
    pdf = np.stack([oracle_kde(src[b], smask[b], radius, 0.25) for b in range(B)]).astype(
        np.float32
    )
    nbh = radius_neighbors(
        jnp.asarray(smp), jnp.asarray(qmask), jnp.asarray(src), jnp.asarray(smask), radius, k
    )
    return src, smp, feats, smask, qmask, pdf, nbh


def run_and_compare(rng, c_out, **kw):
    src, smp, feats, smask, qmask, pdf, nbh = setup(rng, **kw)
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], c_out)
    out = np.asarray(
        mc_conv(
            params,
            jnp.asarray(smp),
            nbh,
            jnp.asarray(src),
            jnp.asarray(feats),
            jnp.asarray(pdf),
            c_out=c_out,
        )
    )
    w1, b1, w2, b2 = map(np.asarray, params)
    for b in range(src.shape[0]):
        ref = oracle_mcconv(
            w1, b1, w2, b2, smp[b], qmask[b], src[b], feats[b], pdf[b],
            kw.get("radius", 0.35), c_out=c_out,
        )
        np.testing.assert_allclose(out[b], ref, rtol=2e-4, atol=1e-5)


def test_depthwise_matches_oracle(rng):
    run_and_compare(rng, c_out=None)


def test_full_conv_matches_oracle(rng):
    run_and_compare(rng, c_out=4)


def test_chunked_matches_unchunked(rng):
    src, smp, feats, smask, qmask, pdf, nbh = setup(rng, M=33)
    params = init_mcconv_params(jax.random.PRNGKey(2), feats.shape[-1], 4)
    args = (params, jnp.asarray(smp), nbh, jnp.asarray(src), jnp.asarray(feats), jnp.asarray(pdf))
    a = mc_conv(*args, c_out=4)
    b = mc_conv(*args, c_out=4, sample_chunk=7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_gradients_finite_diff(rng):
    src, smp, feats, smask, qmask, pdf, nbh = setup(rng, B=1, N=20, M=8, c_in=3)
    params = init_mcconv_params(jax.random.PRNGKey(3), 3, 2)

    def loss(p, f):
        out = mc_conv(
            p, jnp.asarray(smp), nbh, jnp.asarray(src), f, jnp.asarray(pdf), c_out=2
        )
        return jnp.sum(out**2)

    from jax.test_util import check_grads

    check_grads(loss, (params, jnp.asarray(feats)), order=1, modes=["rev"], rtol=2e-2)


def test_gradients_deterministic(rng):
    # The reference backward used CUDA atomics (nondeterministic); ours must be
    # bitwise reproducible (SURVEY §5.2).
    src, smp, feats, smask, qmask, pdf, nbh = setup(rng, B=1)
    params = init_mcconv_params(jax.random.PRNGKey(4), feats.shape[-1], None)

    def loss(p, f):
        return jnp.sum(
            mc_conv(p, jnp.asarray(smp), nbh, jnp.asarray(src), f, jnp.asarray(pdf)) ** 2
        )

    g1 = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(feats))
    g2 = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(feats))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unbiased_under_nonuniform_sampling(rng):
    """The paper's central claim (SURVEY §4 'estimator tests'): the 1/pdf
    correction makes the MC estimate of a smooth integrand far more stable
    across sampling densities. Integrate f(y)*g(y-x) over a ball with uniform
    vs center-biased sampling; the corrected estimates must agree much better
    than the uncorrected ones (exact invariance is limited by the KDE's
    finite bandwidth under steep density gradients)."""
    N, radius = 4000, 0.5
    center = np.zeros(3)

    def draw(biased):
        v = rng.normal(size=(N * 4, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        if biased:
            # bounded angular bias (density ratio ~6:1 across the ball) —
            # the realistic sensor-like case; divergent radial densities are
            # beyond any fixed-bandwidth KDE
            w = 1.0 + 5.0 * np.clip(v[:, 2], 0, 1)
            keep = rng.choice(len(v), N, replace=False, p=w / w.sum())
        else:
            keep = rng.choice(len(v), N, replace=False)
        v = v[keep]
        u = rng.uniform(0, 1, size=(N, 1))
        return (center + v * (u ** (1 / 3)) * radius).astype(np.float32)

    def estimate(pts, use_pdf):
        mask = np.ones((1, N), bool)
        feats = (pts[..., :1] + 0.5).astype(np.float32)  # smooth f
        pdf = (
            kde_density(jnp.asarray(pts), jnp.asarray(mask), radius)
            if use_pdf
            else jnp.ones((1, N))
        )
        smp = jnp.asarray(center[None, None].astype(np.float32))
        nbh = radius_neighbors(
            smp, jnp.ones((1, 1), bool), jnp.asarray(pts), jnp.asarray(mask),
            radius, N,
        )
        params = init_mcconv_params(jax.random.PRNGKey(5), 1, None)
        out = mc_conv(
            params, smp, nbh, jnp.asarray(pts), jnp.asarray(feats), pdf,
            mean_normalize=not use_pdf,
        )
        return float(np.asarray(out)[0, 0, 0])

    uni, bia = draw(False)[None], draw(True)[None]

    def gap(use_pdf):
        a, b = estimate(uni, use_pdf), estimate(bia, use_pdf)
        return abs(a - b) / (abs(a) + 1e-9)

    g_with, g_without = gap(True), gap(False)
    assert g_with < 0.2, (g_with, g_without)
    assert g_with < 0.7 * g_without, (g_with, g_without)
