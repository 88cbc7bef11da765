"""Batch-folded Poisson sweep A/B (VERDICT r4 #4) — run on the real TPU.

v2 (MXU) and v3 (window slicing) pinned the v1 sweep as per-op ISSUE-latency
bound (~1.35 us/color-step/batch-item). v4 folds SB batch items into each
color step's ops ((SB, N, N) stacked planes, sublane-domain state, width-1
swapaxes relayouts) so the loop issues ~B/SB times fewer ops. Success bar
(VERDICT): sweep <= 0.15 ms at B=8/N=1024 and MCClassS step <= 0.9 ms.

Usage: python tools/exp_poisson_v4.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.core.grid import (
        cell_color27,
        cell_coords,
        grid_res_for_radius,
        linear_cell_ids,
    )
    from mccnn_tpu.ops.pallas.poisson_kernel import poisson_sweep_pallas

    rng = np.random.default_rng(0)

    def bench_sweep(B, N, radius, variant, long=192, short=48, reps=3):
        pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
        mask = jnp.ones((B, N), bool)
        ce = radius / np.sqrt(3.0)
        res = grid_res_for_radius(radius, cell_scale=1.0 / np.sqrt(3.0))
        coords = cell_coords(pts, ce, res)
        cids = linear_cell_ids(coords, res)
        colors = cell_color27(coords)
        os.environ["MCCNN_POISSON_SWEEP"] = variant

        @functools.partial(jax.jit, static_argnums=1)
        def chain(p, n):
            def body(c, _):
                sel = poisson_sweep_pallas(c, mask, cids, colors, radius)
                return c + 1e-30 * jnp.sum(sel.astype(jnp.float32)), 0

            out, _ = jax.lax.scan(body, p, None, length=n)
            return out.sum()

        def best_of(n):
            float(chain(pts, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(pts, n))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (best_of(long) - best_of(short)) / (long - short)
        os.environ.pop("MCCNN_POISSON_SWEEP", None)
        return dt

    for B, N, r in [(8, 1024, 0.1), (8, 512, 0.2)]:
        # check selections agree on-chip first (cheap single calls)
        pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
        mask = jnp.ones((B, N), bool)
        ce = r / np.sqrt(3.0)
        res = grid_res_for_radius(r, cell_scale=1.0 / np.sqrt(3.0))
        coords = cell_coords(pts, ce, res)
        cids = linear_cell_ids(coords, res)
        colors = cell_color27(coords)
        ref = np.asarray(poisson_sweep_pallas(pts, mask, cids, colors, r))
        for v in ("v42", "v44"):
            os.environ["MCCNN_POISSON_SWEEP"] = v
            try:
                out = np.asarray(
                    poisson_sweep_pallas(pts, mask, cids, colors, r)
                )
                ok = np.array_equal(ref, out)
                print(f"B={B} N={N} r={r} {v}: selections equal={ok}",
                      flush=True)
            except Exception as e:
                print(f"B={B} N={N} r={r} {v}: check FAILED {e!r}", flush=True)
            finally:
                os.environ.pop("MCCNN_POISSON_SWEEP", None)

        for v in ("v1", "v42", "v44"):
            try:
                dt = bench_sweep(B, N, r, v)
                print(f"B={B} N={N} r={r} {v}: {dt*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"B={B} N={N} r={r} {v}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
