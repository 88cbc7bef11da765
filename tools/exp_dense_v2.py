"""Quick on-chip probe of the batched (v2) dense kernel vs v1.

Chain-difference timing at the bench.py config. Run on the real TPU:
    python tools/exp_dense_v2.py [--fwd-only]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.core import init_mcconv_params
from mccnn_tpu.ops.pallas import dense_mc_conv

B, N, M, C = 8, 1024, 1024, 128
RADIUS = 0.2
SHORT, LONG = 64, 320


def timed(conv_fn, params, feats, fwd_only=False):
    def loss(p, f):
        return jnp.sum(conv_fn(p, f) ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, f, n):
        def body(carry, _):
            if fwd_only:
                g = conv_fn(p, carry)[..., : C]
            else:
                gp, g = grad_fn(p, carry)
                g = g + 1e-12 * jnp.sum(gp.w1) + 1e-12 * jnp.sum(gp.w2)
            return carry + 1e-6 * g, 0

        out, _ = jax.lax.scan(body, f, None, length=n)
        return out.sum()

    def best_of(n, reps=4):
        float(chain(params, feats, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params, feats, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(LONG) - best_of(SHORT)) / (LONG - SHORT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--c-out", type=int, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    pdf = jnp.asarray(np.ones((B, N), np.float32))
    params = init_mcconv_params(jax.random.PRNGKey(0), C, args.c_out)

    fn = lambda p, f: dense_mc_conv(
        p, pts, mask, pts, mask, f, pdf, RADIUS, c_out=args.c_out
    )
    t = timed(fn, params, feats, fwd_only=args.fwd_only)
    kind = "fwd" if args.fwd_only else "fwd+bwd"
    print(
        f"dense {kind} c_out={args.c_out}: {t * 1e3:.3f} ms/layer "
        f"= {B * M / t / 1e6:.1f} Mpts/s on {jax.devices()[0]}"
    )


if __name__ == "__main__":
    main()
