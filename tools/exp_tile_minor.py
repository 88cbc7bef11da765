"""Minor-tile granularity A/B on the 32k bench scene (VERDICT r4 #1 attack).

Candidate-side sub-tiles (fwd source minors / bwd sample minors) carry their
own AABBs while majors stay T=128, so pair planes keep their (1024, 128)
shape and only the candidate sets shrink. Host-counted candidate work on the
bench scene: Tm=64 -> -25 %, Tm=32 -> -40 %. This measures the actual
fwd+bwd chain-diff per layer for Tm in {128, 64, 32} and checks outputs
agree (f32-reassociation tolerance).

Usage: python tools/exp_tile_minor.py [n_points]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
RB, CB = 0.05, 128


def main():
    import jax
    import jax.numpy as jnp

    from bench import _surface_scene
    from mccnn_tpu.core import init_mcconv_params
    from mccnn_tpu.ops.pallas import count_tile_steps, tile_mc_conv

    rng = np.random.default_rng(1)
    pts = jnp.asarray(_surface_scene(rng, NB))[None]
    mask = jnp.ones((1, NB), bool)
    feats = jnp.asarray(rng.normal(size=(1, NB, CB)).astype(np.float32))
    pdf = jnp.ones((1, NB), jnp.float32)
    params = init_mcconv_params(jax.random.PRNGKey(0), CB, None)

    import os

    ref = None
    for Tm in (128, 64, 32):
        os.environ["MCCNN_TILE_MINOR"] = str(Tm)
        steps = int(count_tile_steps(pts, mask, pts, mask, RB).max())

        def fwd(f):
            return tile_mc_conv(
                params, pts, mask, pts, mask, f, pdf, RB,
                max_pairs=1 << 30, max_steps=steps, minor=Tm,
            )

        out = np.asarray(fwd(feats))
        if ref is None:
            ref = out
        diff = np.abs(out - ref).max()

        def loss(pp, f):
            return jnp.sum(
                tile_mc_conv(
                    pp, pts, mask, pts, mask, f, pdf, RB,
                    max_pairs=1 << 30, max_steps=steps, minor=Tm,
                )
                ** 2
            )

        grad_fn = jax.grad(loss, argnums=(0, 1))

        @functools.partial(jax.jit, static_argnums=1)
        def chain(f, n):
            def body(c, _):
                gp, g = grad_fn(params, c)
                g = g + 1e-12 * jnp.sum(gp.w1) + 1e-12 * jnp.sum(gp.w2)
                return c + 1e-6 * g, 0

            out, _ = jax.lax.scan(body, f, None, length=n)
            return out.sum()

        def best_of(n, reps=3):
            float(chain(feats, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(feats, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per_layer = (best_of(24) - best_of(8)) / 16.0
        print(
            f"Tm={Tm:4d}: steps={steps:5d} {per_layer*1e3:6.2f} ms/layer "
            f"fwd+bwd = {NB/per_layer/1e6:5.2f} Mpts/s  (|out-ref|max "
            f"{diff:.2e})",
            flush=True,
        )
    os.environ.pop("MCCNN_TILE_MINOR", None)


if __name__ == "__main__":
    main()
