"""Parity tests for the dense Pallas MC-conv (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccnn_tpu.core import init_mcconv_params, mc_conv, radius_neighbors
from mccnn_tpu.ops.pallas import dense_mc_conv


def setup(rng, B=2, N=80, M=50, c_in=8, radius=0.3):
    src = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    smp = rng.uniform(0, 1, size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, c_in)).astype(np.float32)
    smask = np.ones((B, N), bool)
    smask[:, -7:] = False
    qmask = np.ones((B, M), bool)
    qmask[:, -5:] = False
    pdf = rng.uniform(0.5, 2.0, size=(B, N)).astype(np.float32)
    return tuple(map(jnp.asarray, (src, smp, feats, smask, qmask, pdf)))


def reference(src, smp, feats, smask, qmask, pdf, radius, c_out, params):
    nbh = radius_neighbors(smp, qmask, src, smask, radius, src.shape[1])
    out = mc_conv(params, smp, nbh, src, feats, pdf, c_out=c_out)
    return jnp.where(qmask[..., None], out, 0.0)


def dense(src, smp, feats, smask, qmask, pdf, radius, c_out, params):
    return dense_mc_conv(
        params, smp, qmask, src, smask, feats, pdf, radius,
        c_out=c_out, interpret=True,
    )


@pytest.mark.parametrize("c_out", [None, 4], ids=["depthwise", "full"])
def test_forward_parity(rng, c_out):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    params = init_mcconv_params(jax.random.PRNGKey(0), feats.shape[-1], c_out)
    want = np.asarray(reference(src, smp, feats, smask, qmask, pdf, 0.3, c_out, params))
    got = np.asarray(dense(src, smp, feats, smask, qmask, pdf, 0.3, c_out, params))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


@pytest.mark.parametrize("c_out", [None, 4], ids=["depthwise", "full"])
def test_gradient_parity(rng, c_out):
    src, smp, feats, smask, qmask, pdf = setup(rng)
    params = init_mcconv_params(jax.random.PRNGKey(1), feats.shape[-1], c_out)

    def loss_ref(p, f, d):
        return jnp.sum(reference(src, smp, f, smask, qmask, d, 0.3, c_out, p) ** 2)

    def loss_dn(p, f, d):
        return jnp.sum(dense(src, smp, f, smask, qmask, d, 0.3, c_out, p) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, feats, pdf)
    g_dn = jax.grad(loss_dn, argnums=(0, 1, 2))(params, feats, pdf)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dn)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2 * np.abs(a).max() + 1e-6)


def test_global_radius(rng):
    # the "global conv" case: radius covering the whole cube, one sample
    src, smp, feats, smask, qmask, pdf = setup(rng, M=8)
    params = init_mcconv_params(jax.random.PRNGKey(2), feats.shape[-1], None)
    r = 3.0**0.5 + 0.1
    want = np.asarray(reference(src, smp, feats, smask, qmask, pdf, r, None, params))
    got = np.asarray(dense(src, smp, feats, smask, qmask, pdf, r, None, params))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_padding_boundaries(rng):
    # M and N deliberately not multiples of the 128 tile
    src, smp, feats, smask, qmask, pdf = setup(rng, N=130, M=129)
    params = init_mcconv_params(jax.random.PRNGKey(3), feats.shape[-1], None)
    want = np.asarray(reference(src, smp, feats, smask, qmask, pdf, 0.3, None, params))
    got = np.asarray(dense(src, smp, feats, smask, qmask, pdf, 0.3, None, params))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_mean_normalize_parity(rng):
    # the reference's usePDF=False mode
    src, smp, feats, smask, qmask, pdf = setup(rng)
    ones = jnp.ones_like(pdf)
    params = init_mcconv_params(jax.random.PRNGKey(4), feats.shape[-1], None)
    nbh = radius_neighbors(smp, qmask, src, smask, 0.3, src.shape[1])
    want = jnp.where(
        qmask[..., None],
        mc_conv(params, smp, nbh, src, feats, ones, mean_normalize=True),
        0.0,
    )
    got = dense_mc_conv(
        params, smp, qmask, src, smask, feats, ones, 0.3,
        mean_normalize=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )

    def loss_d(p, f):
        return jnp.sum(
            dense_mc_conv(p, smp, qmask, src, smask, f, ones, 0.3,
                          mean_normalize=True, interpret=True) ** 2
        )

    def loss_r(p, f):
        o = mc_conv(p, smp, nbh, src, f, ones, mean_normalize=True)
        return jnp.sum(jnp.where(qmask[..., None], o, 0.0) ** 2)

    gd = jax.grad(loss_d, argnums=(0, 1))(params, feats)
    gr = jax.grad(loss_r, argnums=(0, 1))(params, feats)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gd)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2 * np.abs(a).max() + 1e-6)


def test_dense_fits_vmem_envelope():
    """Round-4 dispatch fix: the v2 backward holds ~14.8 KiB of VMEM per
    sample row (abig + D + tbig scratches), so big-sample decoder sites must
    not pick dense — an 8192-sample conv failed Mosaic with a 122.89 MiB
    stack allocation before this bound."""
    from mccnn_tpu.ops.dispatch import dense_fits

    assert dense_fits(1024, 128, None, n_samples=1024)  # bench config
    assert dense_fits(2048, 64, None, n_samples=2048)
    # the soak's failing site: 2k sources -> 8k samples
    assert not dense_fits(2048, 128, None, n_samples=8192)
    assert not dense_fits(2048, 128, None, n_samples=4096)
    # source-side bounds unchanged
    assert not dense_fits(4096, 128, None, n_samples=1024)
