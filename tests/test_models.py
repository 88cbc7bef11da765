import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccnn_tpu.models import MCClass, MCClassH, MCClassS, MCNorm, MCNormS, MCSeg


def cloud(rng, B=2, N=96):
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, -8:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


SMALL = dict(grow=8, neighbor_k=16)


@pytest.mark.parametrize(
    "model,out_check",
    [
        (MCClassS(n_classes=10, **SMALL), lambda o, B, N: o.shape == (B, 10)),
        (MCClass(n_classes=10, **SMALL), lambda o, B, N: o.shape == (B, 10)),
        (
            MCClassH(n_classes=10, **SMALL),
            lambda o, B, N: len(o) == 3 and all(x.shape == (B, 10) for x in o),
        ),
        (MCNorm(**SMALL), lambda o, B, N: o.shape == (B, N, 3)),
        (MCNormS(**SMALL), lambda o, B, N: o.shape == (B, N, 3)),
        (
            MCSeg(n_classes=7, radii=(0.1, 0.3), **SMALL),
            lambda o, B, N: o.shape == (B, N, 7),
        ),
    ],
    ids=["mcclass_s", "mcclass", "mcclass_h", "mcnorm", "mcnorm_s", "mcseg"],
)
def test_forward_shapes_finite(rng, model, out_check):
    B, N = 2, 96
    pts, mask = cloud(rng, B, N)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    out = model.apply(variables, pts, mask, train=False)
    assert out_check(out, B, N)
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.isfinite(leaf).all())


def test_train_mode_updates_batch_stats(rng):
    pts, mask = cloud(rng)
    model = MCClassS(n_classes=5, **SMALL)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    out, updates = model.apply(
        variables,
        pts,
        mask,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in updates
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_mcseg_category_onehot(rng):
    pts, mask = cloud(rng)
    cat = jnp.asarray(np.eye(16, dtype=np.float32)[[3, 7]])
    model = MCSeg(n_classes=7, radii=(0.1, 0.3), **SMALL)
    v = model.init(jax.random.PRNGKey(0), pts, mask, None, cat, train=False)
    out = model.apply(v, pts, mask, None, cat, train=False)
    assert out.shape == (2, 96, 7)


def test_grads_flow_end_to_end(rng):
    pts, mask = cloud(rng, B=1, N=64)
    model = MCClassS(n_classes=4, **SMALL)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    labels = jnp.asarray([2])

    def loss_fn(params):
        logits = model.apply({**variables, "params": params}, pts, mask, train=False)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(1), labels]
        )

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_bn_decaying_momentum_schedule():
    """TF1-style BN decay schedule: early steps average fast (momentum 0.5),
    the step counter advances, and running stats move much more per step than
    with the late-training momentum (VERDICT r1 #5 / SURVEY §7 hard parts)."""
    import jax
    import jax.numpy as jnp
    from mccnn_tpu.models.layers import MaskedBatchNorm

    bn = MaskedBatchNorm(schedule_steps=100)
    x = jnp.ones((4, 16, 8)) * 3.0
    mask = jnp.ones((4, 16), bool)
    variables = bn.init(jax.random.PRNGKey(0), x, mask, True)
    assert float(variables["batch_stats"]["count"]) == 1.0

    vars2 = variables
    for _ in range(3):
        _, upd = bn.apply(vars2, x, mask, True, mutable=["batch_stats"])
        vars2 = {**vars2, "batch_stats": upd["batch_stats"]}
    assert float(vars2["batch_stats"]["count"]) == 4.0
    # momentum at step ~0 is 0.5: mean moves halfway toward 3.0 per step
    m = float(vars2["batch_stats"]["mean"][0])
    assert 2.0 < m < 3.0, m

    # fixed-momentum module has no counter and moves slowly
    bn_fixed = MaskedBatchNorm(momentum=0.99)
    vf = bn_fixed.init(jax.random.PRNGKey(0), x, mask, True)
    assert "count" not in vf["batch_stats"]
    assert float(vf["batch_stats"]["mean"][0]) < 0.1
