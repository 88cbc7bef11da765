"""On-chip A/B: AABB-only vs point-refined tile adjacency on the 32k line.

Runs bench.py's `_bench_big_scene` (chain-difference, full fwd+bwd) twice
in one process: MCCNN_TILE_ADJ=aabb (round-3 behavior) then the refined
default. The env var is read at trace time, and the differing auto-sized
``max_pairs`` forces a fresh jit entry per mode, so both runs are honest
compiles. Run: PYTHONPATH=/root/repo:/root/.axon_site python
tools/exp_tile_adj_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for mode in ("aabb", "ptbox"):
        if mode == "aabb":
            os.environ["MCCNN_TILE_ADJ"] = "aabb"
        else:
            os.environ.pop("MCCNN_TILE_ADJ", None)
        out = bench._bench_big_scene(jax, jnp)
        print(json.dumps({"mode": mode, **out}))


if __name__ == "__main__":
    main()
