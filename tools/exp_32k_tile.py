"""32k surface-scene bench for the z-order tile kernel (run on real TPU)."""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from mccnn_tpu.core import init_mcconv_params
from mccnn_tpu.ops.pallas.tile_conv import tile_mc_conv, count_tile_pairs

T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
G = int(sys.argv[2]) if len(sys.argv) > 2 else 1
B, N, C, radius = 1, 32768, 128, 0.05
rng = np.random.default_rng(0)
n = N
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
pts = jnp.asarray(np.clip(p, 0.0, 0.999).astype(np.float32))[None]
mask = jnp.asarray(np.ones((B, N), bool))
feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
pdf = jnp.asarray(np.ones((B, N), np.float32))
params = init_mcconv_params(jax.random.PRNGKey(0), C, None)

S = int(count_tile_pairs(pts, mask, pts, mask, radius, tile=T).max())
print(f"T={T} G={G} pairs={S}", flush=True)

g = jax.jit(jax.grad(
    lambda p_, f: jnp.sum(tile_mc_conv(
        p_, pts, mask, pts, mask, f, pdf, radius, max_pairs=S, tile=T,
        chunk=G) ** 2),
    argnums=(0, 1)))
t0 = time.perf_counter(); jax.block_until_ready(g(params, feats)[1])
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(6):
    t0 = time.perf_counter(); jax.block_until_ready(g(params, feats)[1])
    best = min(best, time.perf_counter()-t0)
t = best - 0.030
print(f"T={T} G={G} full fwd+bwd: {best*1e3:.1f} ms raw; ~{t*1e3:.1f} ms net"
      f" -> {N/t/1e6:.2f} Mpts/s", flush=True)

# exact big-scene KDE via the same tile machinery
from mccnn_tpu.ops.pallas import tile_kde

kd = jax.jit(lambda: tile_kde(pts, mask, radius, max_pairs=S, tile=T))
t0 = time.perf_counter(); jax.block_until_ready(kd())
print(f"tile_kde compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(6):
    t0 = time.perf_counter(); jax.block_until_ready(kd())
    best = min(best, time.perf_counter()-t0)
t = best - 0.030
print(f"T={T} tile_kde: {best*1e3:.1f} ms raw; ~{t*1e3:.1f} ms net", flush=True)
