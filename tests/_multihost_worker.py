"""Subprocess worker for tests/test_multihost.py (not collected by pytest).

Runs one process of a multi-process CPU jax.distributed group (Gloo
collectives across processes — the same code path a TPU pod uses over DCN,
SURVEY §5.8) and trains MCClassS for two steps on its host-local slice of a
deterministic global batch. Role "oracle" runs the identical computation
single-process on 8 local devices; the test asserts the losses and final
parameters agree across the process boundary.

Usage: python _multihost_worker.py {<process_id>|oracle} <nprocs> <port> <out.json>
"""

import json
import os
import sys


def main():
    role, nprocs, port, outfile = sys.argv[1:5]
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
