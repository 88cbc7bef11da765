"""The z-order tile backend wired through the model layer stack: an MCConv
flax module with ``SpatialCache(tile_pairs=...)`` + the forced ``tile``
backend must match the jnp backend (reference path) bit-for-tolerance.

The tile kernel itself is parity-tested in test_tile_conv.py; this covers the
dispatch plumbing (SpatialCache knob, layers.py routing, pdf tile path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mccnn_tpu.models.layers as layers_mod
from mccnn_tpu.api import SpatialCache, build_hierarchy
from mccnn_tpu.models.layers import MCConv
from mccnn_tpu.ops.pallas import count_tile_pairs
from mccnn_tpu.ops.pallas.tile_conv import tile_mc_conv


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_mcconv_layer_tile_backend_matches_jnp(rng, monkeypatch):
    B, N = 2, 300
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool)).at[0, 260:].set(False)
    feats = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    radius = 0.25

    hier = build_hierarchy(pts, mask, [0.2], neighbor_k=24)
    S = int(
        count_tile_pairs(
            hier.levels[1].points, hier.levels[1].mask,
            hier.levels[0].points, hier.levels[0].mask, radius, 128,
        ).max()
    )

    conv = MCConv(c_in=16, c_out=None)

    def run(backend, cache):
        monkeypatch.setenv("MCCNN_TPU_CONV_BACKEND", backend)
        v = conv.init(jax.random.PRNGKey(0), cache, 0, 1, radius, feats)
        return conv.apply(v, cache, 0, 1, radius, feats)

    # interpret-mode pallas for the CPU test run; tile=128 keeps several
    # tiles in play at this N
    monkeypatch.setattr(
        layers_mod,
        "tile_mc_conv",
        lambda *a, **kw: tile_mc_conv(
            *a, **{**kw, "interpret": True, "tile": 128}
        ),
    )

    cache_tile = SpatialCache(hier, neighbor_k=N, tile_pairs=S)
    got = run("tile", cache_tile)
    want = run("jnp", SpatialCache(hier, neighbor_k=N))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )


def test_mcconv_layer_tile_backend_requires_capacity(rng, monkeypatch):
    B, N = 1, 200
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    feats = jnp.asarray(rng.normal(size=(B, N, 8)).astype(np.float32))
    hier = build_hierarchy(pts, mask, [0.2], neighbor_k=16)
    monkeypatch.setenv("MCCNN_TPU_CONV_BACKEND", "tile")
    conv = MCConv(c_in=8, c_out=None)
    with pytest.raises(ValueError, match="tile_pairs"):
        conv.init(
            jax.random.PRNGKey(0), SpatialCache(hier, neighbor_k=N),
            0, 1, 0.25, feats,
        )


def test_spatial_cache_pdf_tile_path(rng, monkeypatch):
    """SpatialCache.pdf routes to the exact tile KDE above DENSE_KDE_MAX_N
    when tile_pairs is configured."""
    import mccnn_tpu.core.pdf as pdf_mod

    B, N = 1, 300
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    radius = 0.2
    hier = build_hierarchy(pts, mask, [0.15], neighbor_k=24)
    # pretend this N is "big" so the tile path triggers
    monkeypatch.setattr(pdf_mod, "DENSE_KDE_MAX_N", 100)
    from mccnn_tpu.ops.pallas.tile_conv import tile_kde as real_tile_kde
    import mccnn_tpu.ops.pallas.tile_conv as tc_mod

    monkeypatch.setattr(
        tc_mod,
        "tile_kde",
        lambda *a, **kw: real_tile_kde(*a, **{**kw, "interpret": True}),
    )
    # count with the DEFAULT tile — tile_kde uses it too (counts are per-tile)
    S = int(count_tile_pairs(pts, mask, pts, mask, radius).max())
    cache = SpatialCache(hier, neighbor_k=N, tile_pairs=S)
    got = cache.pdf(0, radius)
    want = pdf_mod.kde_density(pts, mask, radius)  # dense exact on CPU
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3
    )


def test_runner_auto_sizes_tile_pairs(rng):
    """Library-level tile auto-dispatch (VERDICT r3 #3): a big-N MCSeg with
    no tile_pairs flag entering the task boundary gets the capacity sized
    from the example batch; small-N and pre-sized models pass untouched."""
    from mccnn_tpu.models import MCSeg
    from mccnn_tpu.tasks.common import maybe_auto_tile_pairs

    B, N = 1, 4096
    batch = {
        "points": rng.uniform(0, 1, (B, N, 3)).astype(np.float32),
        "mask": np.ones((B, N), bool),
    }
    model = MCSeg(n_classes=4, grow=8, radii=(0.05, 0.15))
    sized = maybe_auto_tile_pairs(model, batch)
    assert sized.tile_pairs is not None and sized.tile_pairs > 0
    # consistency: the STEP budget the kernel derives from the sized
    # capacity covers the measured chunked-step demand with headroom
    # (auto_tile_pairs sizes from demand, not the worst-case pair count)
    from mccnn_tpu.ops.pallas import count_tile_steps
    from mccnn_tpu.ops.pallas.tile_conv import (
        DEFAULT_CHUNK,
        DEFAULT_TILE,
        _steps_for_pairs,
        tile_minor,
    )

    pts = jnp.asarray(batch["points"])
    msk = jnp.asarray(batch["mask"])
    need = int(count_tile_steps(pts, msk, pts, msk, 0.1).max())
    gm = DEFAULT_CHUNK * (DEFAULT_TILE // tile_minor(DEFAULT_TILE))
    nt = -(-N // DEFAULT_TILE)
    nt_m = -(-N // tile_minor(DEFAULT_TILE))
    s_budget = _steps_for_pairs(sized.tile_pairs, gm, nt, nt_m)
    assert s_budget >= need
    assert sized.tile_pairs % 256 == 0

    # small N: untouched
    small = {
        "points": batch["points"][:, :512], "mask": batch["mask"][:, :512]
    }
    assert maybe_auto_tile_pairs(model, small).tile_pairs is None
    # pre-sized: untouched
    pre = model.clone(tile_pairs=1024)
    assert maybe_auto_tile_pairs(pre, batch).tile_pairs == 1024
    # no knob (classifier): untouched
    from mccnn_tpu.models import MCClassS

    clf = MCClassS(n_classes=4, grow=8)
    assert maybe_auto_tile_pairs(clf, batch) is clf
