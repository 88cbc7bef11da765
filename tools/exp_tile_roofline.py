"""Tile-kernel roofline at the CURRENT config (VERDICT r4 #1).

Re-derives the 32k tile line's limit analysis at T=128/G=8/refined-adjacency/
measured-step-budget (the round-4 numbers obsoleted docs/ROOFLINE.md's T=256
accounting) by measuring, fresh on-chip with chain-difference timing:

  * fwd-only and fwd+bwd full kernels (the bench line),
  * stripped probe bodies (MCCNN_TILE_PROBE): "noop" = grid + pipeline DMAs +
    d2/cnt, "planes" = + the H pair-plane VPU loop, "mm" = + the 9 feature
    matmuls (no plane VPU), "bwd_noop" = backward stripped the same way,

plus the counted work: steps, slots, candidate pairs vs true in-radius pairs
(the geometric overcompute), analytic MXU FLOPs and VPU ops per slot.

Usage: python tools/exp_tile_roofline.py [n_points]
"""
import functools
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
RB, CB, H = 0.05, 128, 8
T, G = 128, 8


def surface_scene(rng, n):
    face = rng.integers(0, 5, size=n)
    u, v = rng.uniform(0, 1, (2, n))
    p = np.zeros((n, 3), np.float32)
    for f_, arr in [(0, np.stack([u, v, np.zeros_like(u)], -1)),
                    (1, np.stack([np.zeros_like(u), u, v], -1)),
                    (2, np.stack([np.ones_like(u), u, v], -1)),
                    (3, np.stack([u, np.zeros_like(u), v], -1)),
                    (4, np.stack([u, np.ones_like(u), v], -1))]:
        p[face == f_] = arr[face == f_]
    p += rng.normal(0, 0.01, size=p.shape)
    return np.clip(p, 0.0, 0.999).astype(np.float32)


def true_pairs(p, r):
    """Exact in-radius pair count (numpy, chunked)."""
    n = len(p)
    total = 0
    for i in range(0, n, 2048):
        d2 = ((p[i : i + 2048, None, :] - p[None, :, :]) ** 2).sum(-1)
        total += int((d2 <= r * r).sum())
    return total


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.core import init_mcconv_params
    from mccnn_tpu.ops.pallas import count_tile_steps, tile_mc_conv
    from mccnn_tpu.ops.pallas.tile_conv import _count_adjacency

    from mccnn_tpu.ops.pallas.tile_conv import tile_minor

    rng = np.random.default_rng(1)  # bench.py's scene
    p_np = surface_scene(rng, NB)
    pts = jnp.asarray(p_np)[None]
    mask = jnp.ones((1, NB), bool)
    feats = jnp.asarray(rng.normal(size=(1, NB, CB)).astype(np.float32))
    pdf = jnp.ones((1, NB), jnp.float32)
    params = init_mcconv_params(jax.random.PRNGKey(0), CB, None)

    Tm = tile_minor(T)
    Gm = G * (T // Tm)
    steps = int(count_tile_steps(pts, mask, pts, mask, RB).max())
    adj = np.asarray(_count_adjacency(pts, mask, pts, mask, RB, T, Tm))
    pairs = int(adj.sum())
    slots = steps * Gm
    cand_pairs = slots * Tm * T
    tp = true_pairs(p_np, RB)
    print(f"N={NB} r={RB} T={T} Tm={Tm} G={Gm}: steps={steps} "
          f"tile_pairs={pairs} slots={slots} cand_pairs={cand_pairs/1e6:.0f}M "
          f"true_pairs={tp/1e6:.2f}M overcompute={cand_pairs/tp:.1f}x",
          flush=True)

    def timed(grad, probe, long=24, short=8, reps=3):
        os.environ["MCCNN_TILE_PROBE"] = probe

        def fwd(f):
            return jnp.sum(
                tile_mc_conv(params, pts, mask, pts, mask, f, pdf, RB,
                             max_pairs=1 << 30, max_steps=steps) ** 2
            )

        if grad:
            gf = jax.grad(fwd, argnums=0)

            def body(c, _):
                g = gf(c)
                return c + 1e-6 * g, 0
        else:
            def body(c, _):
                return c + 1e-9 * fwd(c), 0

        @functools.partial(jax.jit, static_argnums=1)
        def chain(f, n):
            out, _ = jax.lax.scan(body, f, None, length=n)
            return out.sum()

        def best_of(n):
            float(chain(feats, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(feats, n))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (best_of(long) - best_of(short)) / (long - short)
        os.environ.pop("MCCNN_TILE_PROBE", None)
        return dt

    rows = []
    for label, grad, probe in [
        ("fwd noop (grid+DMA+d2)", False, "noop"),
        ("fwd planes (no MXU)", False, "planes"),
        ("fwd mm (no plane VPU)", False, "mm"),
        ("fwd full", False, ""),
        ("fwd+bwd, bwd noop", True, "bwd_noop"),
        ("fwd+bwd full", True, ""),
    ]:
        dt = timed(grad, probe)
        rows.append((label, dt))
        print(f"  {label:28s} {dt * 1e3:7.2f} ms", flush=True)

    d = dict(rows)
    fwd = d["fwd full"]
    fb = d["fwd+bwd full"]
    print("\n--- derived ---")
    print(f"fwd {fwd*1e3:.2f} ms  bwd {(fb-fwd)*1e3:.2f} ms  "
          f"total {fb*1e3:.2f} ms = {NB/fb/1e6:.2f} Mpts/s")
    print(f"per-step {fb/steps*1e6:.2f} us, per-slot {fb/slots*1e6:.2f} us")
    noop = d["fwd noop (grid+DMA+d2)"]
    print(f"fwd overhead+DMA+d2: {noop*1e3:.2f} ms "
          f"({noop/fwd:.0%} of fwd)")
    print(f"fwd plane VPU: {(d['fwd planes (no MXU)']-noop)*1e3:.2f} ms; "
          f"fwd matmuls: {(d['fwd mm (no plane VPU)']-noop)*1e3:.2f} ms; "
          f"sum+noop vs full: "
          f"{(d['fwd planes (no MXU)']+d['fwd mm (no plane VPU)']-noop)*1e3:.2f}"
          f" vs {fwd*1e3:.2f} ms")
    bwd_noop = d["fwd+bwd, bwd noop"] - fwd
    print(f"bwd overhead+DMA+d2: {bwd_noop*1e3:.2f} ms")
    # analytic floors at measured unit rates (ROOFLINE.md: 165 TFLOP/s bf16
    # measured; VPU ~3.8 TOPS f32); per-slot plane is (Tm, T)
    mxu_fwd = slots * (9 * 2 * Tm * T * CB) / 165e12
    mxu_bwd = slots * ((9 + 8) * 2 * Tm * T * CB + 8 * 2 * Tm * T * CB) / 165e12
    vpu_fwd = slots * Tm * T * (8 + 4 * H) / 3.8e12
    vpu_bwd = slots * Tm * T * (8 + 5 * H + 6) / 3.8e12
    print(f"analytic serialized floor: fwd {(mxu_fwd+vpu_fwd)*1e3:.2f} ms "
          f"(mxu {mxu_fwd*1e3:.2f} + vpu {vpu_fwd*1e3:.2f}), "
          f"bwd {(mxu_bwd+vpu_bwd)*1e3:.2f} ms "
          f"(mxu {mxu_bwd*1e3:.2f} + vpu {vpu_bwd*1e3:.2f})")
    floor = mxu_fwd + vpu_fwd + mxu_bwd + vpu_bwd
    print(f"fwd+bwd floor {floor*1e3:.2f} ms -> measured = "
          f"{fb/floor:.0%} of floor")


if __name__ == "__main__":
    main()
