"""Learnability tests: each model family trains on a tiny synthetic task it
must be able to solve, and the metrics must actually move.

The reference has no tests at all (SURVEY §4); its verification was "the
training scripts converge to paper accuracy". Real-dataset parity is blocked
on data in this environment (VERDICT r2 missing #1), so these are the
convergence guards against the silent-semantics failure class — a sign error,
a BN bug, a dead gradient, or an estimator regression shows up here as a
model that cannot learn even a trivially separable task.

Kept small so the suite stays fast: one jit compile per test, then dozens of
cheap steps on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.train import (
    accuracy,
    classification_loss,
    init_state,
    make_train_step,
    masked_accuracy,
    normal_loss,
    segmentation_loss,
)

import optax


def _train(model, batch, loss_fn, steps, lr=5e-3):
    tx = optax.adam(lr)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, tx, loss_fn))
    hist = []
    for _ in range(steps):
        state, m = step(state, batch)
        hist.append({k: float(v) for k, v in m.items()})
    return state, hist


def test_mcclass_s_learns_separable_classes():
    """MCClassS must overfit a 2-class task separated by global shape: class 0
    clouds are squashed into a thin z-slab, class 1 fills the unit cube."""
    from mccnn_tpu.models import MCClassS

    rng = np.random.default_rng(0)
    B, N = 16, 96
    pts = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
    labels = (np.arange(B) % 2).astype(np.int32)
    pts[labels == 0, :, 2] *= 0.15  # flat pancakes vs full cubes
    batch = {
        "points": jnp.asarray(pts),
        "mask": jnp.ones((B, N), bool),
        "labels": jnp.asarray(labels),
    }

    def loss_fn(logits, batch):
        return classification_loss(logits, batch["labels"]), {
            "acc": accuracy(logits, batch["labels"])
        }

    model = MCClassS(n_classes=2, grow=8, neighbor_k=8, radii=(0.2, 0.4))
    _, hist = _train(model, batch, loss_fn, steps=60)
    assert hist[-1]["loss"] < 0.5 * hist[0]["loss"]
    assert hist[-1]["acc"] >= 0.9, [h["acc"] for h in hist[-5:]]


def test_mcseg_learns_halfspace_labels():
    """MCSeg must learn per-point labels that are a pure function of position
    (x > 0.5) — the simplest segmentation a point network can express."""
    from mccnn_tpu.models import MCSeg

    rng = np.random.default_rng(1)
    B, N = 4, 256
    pts = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
    labels = (pts[..., 0] > 0.5).astype(np.int32)
    batch = {
        "points": jnp.asarray(pts),
        "mask": jnp.ones((B, N), bool),
        "labels": jnp.asarray(labels),
    }

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    model = MCSeg(
        n_classes=2, grow=8, neighbor_k=8, radii=(0.1, 0.3), drop_rate=0.0
    )
    _, hist = _train(model, batch, loss_fn, steps=60)
    assert hist[-1]["loss"] < 0.5 * hist[0]["loss"]
    assert hist[-1]["acc"] >= 0.9, [h["acc"] for h in hist[-5:]]


def test_mcnorm_learns_plane_normals():
    """MCNormS on points sampled from random planes must drive the angular
    loss well below its start (a dead decoder or broken upsampling conv
    leaves it flat)."""
    from mccnn_tpu.models import MCNormS

    rng = np.random.default_rng(2)
    B, N = 8, 128
    pts = np.zeros((B, N, 3), np.float32)
    nrm = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        # orthonormal basis of the plane
        a = np.cross(n, [1.0, 0.0, 0.0])
        if np.linalg.norm(a) < 1e-3:
            a = np.cross(n, [0.0, 1.0, 0.0])
        a /= np.linalg.norm(a)
        bvec = np.cross(n, a)
        uv = rng.uniform(-0.5, 0.5, (N, 2))
        pts[b] = 0.5 + uv[:, :1] * a + uv[:, 1:] * bvec
        nrm[b] = n
    batch = {
        "points": jnp.asarray(pts),
        "mask": jnp.ones((B, N), bool),
        "normals": jnp.asarray(nrm),
    }

    def loss_fn(pred, batch):
        loss = normal_loss(pred, batch["normals"], batch["mask"])
        return loss, {}

    model = MCNormS(grow=8, neighbor_k=8, radius=0.25)
    _, hist = _train(model, batch, loss_fn, steps=60)
    # normal_loss is sign-invariant angular distance; planes are exactly
    # learnable, so an untrained ~random output must improve a lot
    assert hist[-1]["loss"] < 0.4 * hist[0]["loss"], [
        h["loss"] for h in hist[::10]
    ]


def test_remat_train_step_matches_plain():
    """remat=True (jax.checkpoint around the forward) must change memory, not
    math: one step from identical state/batch produces the same loss and the
    same updated parameters as the plain step."""
    from mccnn_tpu.models import MCSeg

    rng = np.random.default_rng(4)
    B, N = 2, 128
    batch = {
        "points": jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32)),
        "mask": jnp.ones((B, N), bool),
        "labels": jnp.asarray((rng.uniform(size=(B, N)) > 0.5).astype(np.int32)),
    }

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    model = MCSeg(n_classes=2, grow=8, neighbor_k=8, radii=(0.1, 0.3))
    tx = optax.adam(1e-3)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)

    plain = jax.jit(make_train_step(model, tx, loss_fn))
    remat = jax.jit(make_train_step(model, tx, loss_fn, remat=True))
    s_plain, m_plain = plain(state, batch)
    s_remat, m_remat = remat(state, batch)
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_remat["loss"]), rtol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        s_plain.params, s_remat.params,
    )


def test_mcclass_h_learns_separable_classes():
    """MCClassH (two-path hierarchical classifier) on the same separable
    2-class task: the joint loss must fall and joint accuracy must rise."""
    from mccnn_tpu.models import MCClassH
    from mccnn_tpu.train.losses import classh_loss

    rng = np.random.default_rng(3)
    B, N = 16, 96
    pts = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
    labels = (np.arange(B) % 2).astype(np.int32)
    pts[labels == 0, :, 2] *= 0.15
    batch = {
        "points": jnp.asarray(pts),
        "mask": jnp.ones((B, N), bool),
        "labels": jnp.asarray(labels),
    }

    def loss_fn(out, batch):
        loss = classh_loss(out, batch["labels"])
        joint = out[0] if isinstance(out, tuple) else out
        return loss, {"acc": accuracy(joint, batch["labels"])}

    model = MCClassH(n_classes=2, grow=8, neighbor_k=8)
    _, hist = _train(model, batch, loss_fn, steps=60)
    assert hist[-1]["loss"] < 0.6 * hist[0]["loss"]
    assert hist[-1]["acc"] >= 0.9, [h["acc"] for h in hist[-5:]]
