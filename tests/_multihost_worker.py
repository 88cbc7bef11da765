"""Subprocess worker for tests/test_multihost.py (not collected by pytest).

Runs one process of a multi-process CPU jax.distributed group (Gloo
collectives across processes — the same code path a TPU pod uses over DCN,
SURVEY §5.8) and trains MCClassS for two steps on its host-local slice of a
deterministic global batch. Role "oracle" runs the identical computation
single-process on 8 local devices; the test asserts the losses and final
parameters agree across the process boundary.

Usage: python _multihost_worker.py {<process_id>|oracle} <nprocs> <port> <out.json> [dp|spatial|dpspatial]

Case "dp": data-parallel MCClassS training (global batch from host-local
slices). Case "spatial": the sharded-hierarchy halo U-Net under shard_map
with slab shards spanning the process boundary — ``ppermute`` halos cross
DCN (here: Gloo) between the two middle shards. Case "dpspatial": TWO
composed train steps on a 2-D ('data', 'spatial') mesh whose data rows are
the two processes — halo exchange stays intra-process ("ICI") while the
gradient all-reduce crosses the process boundary ("DCN"), the layout a real
pod would use (parallel/dp_spatial.py).
"""

import json
import os
import sys


def run_dp_spatial(role, nprocs):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mccnn_tpu.parallel.dp_spatial import (
        dp_spatial_mesh,
        group_scenes,
        make_dp_spatial_step,
    )
    from mccnn_tpu.parallel.sharded_mcseg import SpatialMCSegConfig
    from mccnn_tpu.parallel.spatial import shard_points_by_slab
    from mccnn_tpu.train.state import TrainState

    D, S, cap, n_cls = 2, 4, 384, 5
    rng = np.random.default_rng(3)  # identical scenes in every process
    scenes = []
    for _ in range(D):
        n = 1024
        pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        lab = rng.integers(0, n_cls, size=n).astype(np.int32)
        sp, sm, sidx = shard_points_by_slab(pts, np.ones(n, bool), S, cap)
        sf = np.ones((S, cap, 1), np.float32)
        sl = np.zeros((S, cap), np.int32)
        for s in range(S):
            v = sidx[s] >= 0
            sl[s, v] = lab[sidx[s][v]]
        scenes.append((sp, sm, sf, sl))
    (group,) = group_scenes(scenes, D)  # (D, S, cap, ...)

    mesh = dp_spatial_mesh(D, S)
    sh = NamedSharding(mesh, P("data", "spatial"))
    if role == "oracle":
        def glob(x):
            return jax.device_put(x, sh)
    else:  # each process feeds ONLY its data row (its own scene)
        per = D // int(nprocs)
        lo = int(role) * per

        def glob(x):
            return jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x[lo : lo + per])
            )

    batch = tuple(glob(x) for x in group)
    # the REAL flax MCSeg under composed dp x spatial sharding (round 4):
    # the BN-moment psums over the 'data' axis cross the process boundary
    cfg = SpatialMCSegConfig(
        n_classes=n_cls, grow=8, radii=(0.06, 0.12), neighbor_k=8,
        drop_rate=0.0,
    )
    model = cfg.model()
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(np.random.default_rng(9).uniform(0, 1, (1, 96, 3)),
                    jnp.float32),
        jnp.ones((1, 96), bool), jnp.ones((1, 96, 1), jnp.float32),
        train=False,
    )
    tx = optax.adam(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(4),
    )
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    step_build, step_reuse = make_dp_spatial_step(
        mesh, tx, cfg, halo_cap=cap
    )
    with mesh:
        state, l0, _, ovf0, lms = step_build(state, *batch)
        state, l1, _, ovf1, _ = step_reuse(state, *batch, *lms)
    checksum = float(
        sum(
            jnp.sum(jnp.abs(p))
            for p in jax.tree.leaves((state.params, state.batch_stats))
        )
    )
    return {
        "losses": [float(l0), float(l1)],
        "checksum": checksum,
        "overflow": int(ovf0) + int(ovf1),
    }


def run_spatial(role, nprocs):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mccnn_tpu.parallel.sharded_mcseg import (
        SpatialMCSegConfig,
        sharded_mcseg_apply_flax,
    )
    from mccnn_tpu.parallel.spatial import shard_points_by_slab

    # conv radii 0.08 (halo/ppermute path — crosses the process boundary
    # between shards 3|4) and 0.4 (compacted all-gather path — crosses it in
    # the gather collective): both cross-process source mechanisms covered.
    N_SHARDS, cap, radii = 8, 512, (0.04, 0.2)
    rng = np.random.default_rng(7)
    n = 2048
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    cfg = SpatialMCSegConfig(
        n_classes=5, grow=8, radii=radii, neighbor_k=16, drop_rate=0.0
    )
    model = cfg.model()
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(np.random.default_rng(9).uniform(0, 1, (1, 96, 3)),
                    jnp.float32),
        jnp.ones((1, 96), bool), jnp.ones((1, 96, 8), jnp.float32),
        train=False,
    )
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 8), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    shx = NamedSharding(mesh, P("x"))
    if role == "oracle":
        def glob(x):
            return jax.device_put(x, shx)
    else:  # feed only this process's slab shards of the global scene
        per = N_SHARDS // int(nprocs)
        lo = int(role) * per

        def glob(x):
            return jax.make_array_from_process_local_data(
                shx, np.ascontiguousarray(x[lo : lo + per])
            )

    gp, gm, gf = glob(sp), glob(sm), glob(sf)

    def fn(p, m, f):
        logits, _, ovf, _ = sharded_mcseg_apply_flax(
            variables, cfg, p[0], m[0], f[0], halo_cap=512,
            axis_name="x", n_shards=N_SHARDS, train=False,
        )
        return logits[None], ovf[None]

    smapped = shard_map(
        fn, mesh=mesh, in_specs=(P("x"),) * 3,
        out_specs=(P("x"), P("x")), check_vma=False,
    )

    @jax.jit
    def run(p, m, f):
        logits, ovf = smapped(p, m, f)
        w = m[..., None].astype(jnp.float32)
        return (
            jnp.sum(jnp.abs(logits) * w),
            jnp.sum(logits * w),
            jnp.sum(ovf),
        )

    a, s, ovf = run(gp, gm, gf)
    return {"abs_sum": float(a), "sum": float(s), "overflow": int(ovf)}


def main():
    role, nprocs, port, outfile = sys.argv[1:5]
    case = sys.argv[5] if len(sys.argv) > 5 else "dp"
    import jax

    # The axon sitecustomize pins the TPU platform; force CPU before any
    # backend-initializing call (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    # num_cpu_devices must be set before ANY jax op runs — importing the
    # package below executes some, so configure first, import after.
    n_dev = 8 if role == "oracle" else 8 // int(nprocs)
    jax.config.update("jax_num_cpu_devices", n_dev)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from mccnn_tpu.parallel.multihost import initialize_distributed

    if role == "oracle":
        initialize_distributed()  # single-process no-op path
    else:
        # The helper real pods call (covers parallel/multihost.py:22).
        initialize_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=int(nprocs),
            process_id=int(role),
        )
    if case in ("spatial", "dpspatial"):
        from mccnn_tpu.parallel.multihost import process_info

        runner = run_spatial if case == "spatial" else run_dp_spatial
        out = {**runner(role, nprocs), **process_info()}
        with open(outfile, "w") as f:
            json.dump(out, f)
        print("done", role, case, out, flush=True)
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mccnn_tpu.models import MCClassS
    from mccnn_tpu.parallel import replicate
    from mccnn_tpu.parallel.multihost import (
        global_data_mesh,
        host_local_batch_to_global,
        process_info,
    )
    from mccnn_tpu.train import init_state, make_optimizer, make_train_step
    from mccnn_tpu.train.losses import accuracy, classification_loss

    mesh = global_data_mesh()
    B, N = 8, 64
    rng = np.random.default_rng(42)
    full = {
        "points": rng.uniform(0, 1, (B, N, 3)).astype(np.float32),
        "mask": np.ones((B, N), bool),
        "labels": rng.integers(0, 4, size=(B,)).astype(np.int32),
    }
    if role == "oracle":
        local = full
    else:  # this process feeds only its host-local slice of the global batch
        per = B // int(nprocs)
        lo = int(role) * per
        local = {k: v[lo : lo + per] for k, v in full.items()}
    gbatch = host_local_batch_to_global(local, mesh)

    model = MCClassS(n_classes=4, grow=8, neighbor_k=8)
    tx = make_optimizer(lr=1e-2)
    state = init_state(model, tx, jax.random.PRNGKey(0), gbatch)
    state = replicate(state, mesh)

    def loss_fn(logits, batch):
        return classification_loss(logits, batch["labels"]), {
            "acc": accuracy(logits, batch["labels"])
        }

    repl = NamedSharding(mesh, P())
    step = jax.jit(
        make_train_step(model, tx, loss_fn), out_shardings=(repl, repl)
    )
    losses = []
    for _ in range(2):
        state, m = step(state, gbatch)
        losses.append(float(m["loss"]))
    checksum = float(
        sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(state.params))
    )
    out = {"losses": losses, "checksum": checksum, **process_info()}
    with open(outfile, "w") as f:
        json.dump(out, f)
    print("done", role, out, flush=True)


if __name__ == "__main__":
    main()
