"""Per-site tile step budgets (round 4).

The one ``tile_pairs`` knob is sized for the worst level-0 site; measured
per-site ``max_steps`` budgets (``tasks.common.auto_tile_steps``) remove the
1.5-2x step padding at every other site. These tests pin the contract that
makes that safe:

  * every tile-kernel site MCSeg actually executes FINDS its budget in the
    dict (a key mismatch would silently fall back to the worst case — no
    crash, just the perf regression coming back), and
  * every budget covers the site's exact measured demand (with headroom), so
    the example batch itself can never overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mccnn_tpu.api.builder as builder_mod
import mccnn_tpu.models.layers as layers_mod
from mccnn_tpu.api.hierarchy import build_hierarchy
from mccnn_tpu.models import MCSeg
from mccnn_tpu.ops.pallas.tile_conv import count_tile_steps
from mccnn_tpu.tasks.common import auto_tile_steps


def _scene(n=768, b=1, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    return pts, jnp.ones((b, n), bool)


RADII = (0.12, 0.25)


def _model(**kw):
    return MCSeg(
        n_classes=4, grow=4, radii=RADII, neighbor_k=8, tile_pairs=4096, **kw
    )


def test_auto_tile_steps_covers_every_executed_site(monkeypatch):
    """Run the real MCSeg forward with the tile backend forced, with the
    tile kernels replaced by recorders: every conv/kde tile site must find a
    non-None max_steps in the auto-sized budget dict."""
    pts, mask = _scene()
    model = _model()
    budgets = auto_tile_steps(model, pts, mask)
    model = model.clone(tile_steps=budgets)

    conv_calls, kde_calls = [], []

    def fake_tile_conv(params, dpts, dmask, spts, smask, feats, pdf, radius,
                       *, max_pairs, max_steps=None, c_out=None,
                       mean_normalize=False, with_overflow=False, **kw):
        conv_calls.append((spts.shape[1], dpts.shape[1], radius, max_steps))
        c = feats.shape[-1] if c_out is None else c_out
        out = jnp.zeros(dpts.shape[:2] + (c,), feats.dtype)
        return (out, jnp.zeros((dpts.shape[0],), jnp.int32))

    def fake_kde(points, mask_, radius, *, kde_window=0.25, tile_pairs=None,
                 max_steps=None, with_overflow=False, **kw):
        if tile_pairs is not None:
            kde_calls.append((points.shape[1], radius, max_steps))
            d = jnp.ones(points.shape[:2], points.dtype)
            return (d, jnp.zeros((points.shape[0],), jnp.int32))
        return jnp.ones(points.shape[:2], points.dtype)

    import mccnn_tpu.api.hierarchy as hier_mod

    sweep_calls = []
    real_poisson = hier_mod.poisson_disk

    def spy_poisson(pts_, mask_, r, cap, *, max_steps=None, **kw):
        sweep_calls.append((pts_.shape[1], r, max_steps))
        return real_poisson(pts_, mask_, r, cap, max_steps=max_steps, **kw)

    monkeypatch.setattr(hier_mod, "poisson_disk", spy_poisson)
    monkeypatch.setattr(layers_mod, "tile_mc_conv", fake_tile_conv)
    monkeypatch.setattr(builder_mod, "kde_density", fake_kde)
    monkeypatch.setenv("MCCNN_TPU_CONV_BACKEND", "tile")
    # force the pdf tile path at this small N too
    import mccnn_tpu.core.pdf as pdf_mod

    monkeypatch.setattr(pdf_mod, "DENSE_KDE_MAX_N", 0)

    model.init(jax.random.PRNGKey(0), pts, mask)

    # stem + enc/dec per encoder level
    assert len(conv_calls) == 1 + 2 * (len(RADII))
    for n_src, n_dst, radius, max_steps in conv_calls:
        assert max_steps is not None, (n_src, n_dst, radius)
    assert kde_calls, "pdf tile path never exercised"
    for n, radius, max_steps in kde_calls:
        assert max_steps is not None, (n, radius)
    # every Poisson sampling site finds its sweep budget too
    assert len(sweep_calls) == len(RADII)
    for n, radius, max_steps in sweep_calls:
        assert max_steps is not None, (n, radius)


def test_auto_tile_steps_budgets_cover_exact_demand():
    pts, mask = _scene()
    model = _model()
    budgets = auto_tile_steps(model, pts, mask)
    h = build_hierarchy(
        pts, mask, RADII, neighbor_k=8, global_level=False, tile_pairs=4096
    )
    from mccnn_tpu.core.sampling import count_poisson_sweep_steps

    for site, budget in budgets.items():
        if site[0] == "conv":
            _, i, o, r = site
            dst, src = h.levels[o], h.levels[i]
            counts = count_tile_steps(
                dst.points, dst.mask, src.points, src.mask, float(r)
            )
        elif site[0] == "sweep":
            _, lvl, r = site
            src = h.levels[lvl]
            counts = count_poisson_sweep_steps(src.points, src.mask, float(r))
        else:
            _, lvl, r = site
            src = h.levels[lvl]
            counts = count_tile_steps(
                src.points, src.mask, src.points, src.mask, float(r)
            )
        need = int(np.asarray(counts).max())
        assert budget >= need, (site, budget, need)
        assert budget % 16 == 0


def test_poisson_tile_sweep_exact_under_measured_budget(monkeypatch):
    """The tile sampler with the MEASURED step budget selects bitwise the
    same subset as the dense oracle (the budget is lossless on the scene it
    was measured on)."""
    import mccnn_tpu.core.sampling as samp

    pts, mask = _scene(n=384)
    r = 0.15
    oracle = samp.poisson_disk(pts, mask, r, 256)
    need = int(np.asarray(samp.count_poisson_sweep_steps(pts, mask, r)).max())
    # Force the tile cover-sweep branch at this small N (production routes
    # N <= TILE_SAMPLER_MIN_N to the dense sweep — the r5 mid-band A/B).
    monkeypatch.setattr(samp, "TILE_SAMPLER_MIN_N", 0)
    got = samp.poisson_disk(
        pts, mask, r, 256, tile_pairs=1 << 30, max_steps=need, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got.selected), np.asarray(oracle.selected)
    )
    assert int(np.asarray(got.overflow).max()) == 0


def test_site_steps_lookup_rounds_radius():
    pts, mask = _scene(n=256)
    h = build_hierarchy(
        pts, mask, RADII, neighbor_k=8, global_level=False
    )
    cache = builder_mod.SpatialCache(
        h, tile_steps={("conv", 0, 0, round(0.12, 6)): 128}
    )
    # trace-time float jitter must not miss the key
    assert cache.site_steps("conv", 0, 0, 0.12 + 1e-9) == 128
    assert cache.site_steps("conv", 0, 1, 0.12) is None
    assert builder_mod.SpatialCache(h).site_steps("conv", 0, 0, 0.12) is None


def test_cover_sweep_counts_invariant_across_major_tile():
    """``TileCoverSweep.counts`` is exact at ANY major tile size: in-radius
    flagged-candidate counts are integer-identical between tile=128 and
    tile=256 (the round-5 major-tile A/B relied on this invariance —
    tools/exp_cover_tile.py; candidates ride Tm minors independent of T)."""
    from mccnn_tpu.ops.pallas.tile_conv import make_cover_sweep

    pts, mask = _scene(n=512)
    r = 0.2
    fl = jnp.asarray(
        np.random.default_rng(3).random(512) < 0.1, jnp.float32
    )[None]
    counts = {}
    for tile in (128, 256):
        sweep = make_cover_sweep(
            pts, mask, r, max_pairs=1 << 30, tile=tile, interpret=True
        )
        # compare in the ORIGINAL point domain (sorted domains differ per T
        # only by padding; order itself is shared)
        c_sorted = np.asarray(sweep.counts(
            jnp.take_along_axis(fl, sweep.order, axis=1)))
        order = np.asarray(sweep.order)[0]
        c = np.zeros(512, np.float32)
        c[order[:512]] = c_sorted[0, :512]
        counts[tile] = c
    np.testing.assert_array_equal(counts[128], counts[256])
    assert counts[128].max() >= 1.0  # non-degenerate flags
