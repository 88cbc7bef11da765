import time, sys
import numpy as np, jax, jax.numpy as jnp
from mccnn_tpu.core import init_mcconv_params
from mccnn_tpu.core.buckets import build_buckets
from mccnn_tpu.ops.pallas import bucket_mc_conv

cap = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nba = int(sys.argv[2]) if len(sys.argv) > 2 else 0
nba = nba or None
B, N, C, radius = 1, 32768, 128, 0.05
rng = np.random.default_rng(0)
n = N
face = rng.integers(0, 5, size=n)
u, v = rng.uniform(0, 1, (2, n))
p = np.zeros((n, 3), np.float32)
p[face == 0] = np.stack([u, v, np.zeros_like(u)], -1)[face == 0]
p[face == 1] = np.stack([np.zeros_like(u), u, v], -1)[face == 1]
p[face == 2] = np.stack([np.ones_like(u), u, v], -1)[face == 2]
p[face == 3] = np.stack([u, np.zeros_like(u), v], -1)[face == 3]
p[face == 4] = np.stack([u, np.ones_like(u), v], -1)[face == 4]
p += rng.normal(0, 0.01, size=p.shape)
pts = jnp.asarray(np.clip(p, 0.0, 0.999).astype(np.float32))[None]
mask = jnp.asarray(np.ones((B, N), bool))
feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
pdf = jnp.asarray(np.ones((B, N), np.float32))
params = init_mcconv_params(jax.random.PRNGKey(0), C, None)

grid = build_buckets(pts, mask, radius, cap=cap)
jax.block_until_ready(grid.positions)
# active bricks (host-side check that nba covers the data)
from mccnn_tpu.ops.pallas.mcconv_kernel import _brick_activity, pick_bz
R = grid.res
BZ = pick_bz(R, cap)
ids, ranks = _brick_activity(grid, cap, R, BZ, 10**6)
occ_cnt = int((np.asarray(ranks) < 10**9).sum())  # noop; compute properly:
import numpy as _np
perm_occ = None
bm = np.asarray(grid.slot_mask)[:, :-1]
print(f"cap={cap} overflow={int(grid.overflow.sum())} R={R} BZ={BZ} "
      f"n_blocks={(R//2)**2*(R//BZ)}", flush=True)
# count active bricks from ids monotonicity: ids lists active first
from mccnn_tpu.ops.pallas.mcconv_kernel import _block_perm
permv = np.asarray(_block_perm(R, cap, BZ))
occ = bm[:, permv].reshape(B, -1, 4*BZ*cap).any(-1)
print(f"active bricks: {occ.sum(axis=-1)}", flush=True)

kw = dict(max_active_bricks=nba) if nba else {}
g = jax.jit(jax.grad(lambda p_, f: jnp.sum(bucket_mc_conv(p_, grid, mask, grid, f, pdf, **kw)**2), argnums=(0,1)))
t0 = time.perf_counter(); jax.block_until_ready(g(params, feats)[1])
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(6):
    t0 = time.perf_counter(); jax.block_until_ready(g(params, feats)[1])
    best = min(best, time.perf_counter()-t0)
t = best - 0.030
print(f"nba={nba} full fwd+bwd: {best*1e3:.1f} ms raw; ~{t*1e3:.1f} ms net -> {N/t/1e6:.2f} Mpts/s", flush=True)
