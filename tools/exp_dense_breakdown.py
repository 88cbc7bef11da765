"""Experiment: where does dense MC-conv time go? (run on real TPU)

Variants, all at B=8, N=1024, M=1024, C=128, H=8, TILE=256:
  fwd        — current dense fwd path (replica via dense_mc_conv fwd-only)
  layer      — current fwd+bwd (the bench number)
  mm_only    — same grid/schedule, matmuls only (no d2/pre/relu planes)
  vpu_only   — same grid, planes only + 1 matmul (isolate VPU cost)
  h1         — H=1 fwd (slope test)
"""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.core import init_mcconv_params
from mccnn_tpu.ops.pallas.dense_conv import dense_mc_conv, TILE
from mccnn_tpu.ops.pallas.mcconv_kernel import _pair_d2, _mm, W1_ROWS, LANE

B, N, M, C, H = 8, 1024, 1024, 128, 8
RADIUS = 0.2
CHAIN = 300

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
mask = jnp.asarray(np.ones((B, N), bool))
feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
pdf = jnp.asarray(np.ones((B, N), np.float32))


def timed(fn, *args):
    @functools.partial(jax.jit, static_argnums=())
    def chain(f):
        def body(carry, _):
            o = fn(carry, *args)
            return carry + 1e-6 * o, 0
        out, _ = jax.lax.scan(body, f, None, length=CHAIN)
        return out.sum()
    float(chain(feats))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(feats))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


# --- current path -----------------------------------------------------------
params = init_mcconv_params(jax.random.PRNGKey(0), C, None)

def fwd_cur(f):
    return dense_mc_conv(params, pts, mask, pts, mask, f, pdf, RADIUS)

def layer_cur(f):
    return jax.grad(lambda ff: jnp.sum(fwd_cur(ff) ** 2))(f)

params1 = init_mcconv_params(jax.random.PRNGKey(0), C, None, hidden=1) if False else None

# --- schedule-matched variants ----------------------------------------------
def _prep():
    p = jnp.pad(pts, ((0, 0), (0, 0), (0, LANE - 3)))
    sq = jnp.sum(pts * pts, -1, keepdims=True)
    t = jnp.concatenate([pts, sq, jnp.zeros_like(pts), jnp.zeros_like(sq)], -1)
    t = jnp.swapaxes(t.reshape(B, N // TILE, TILE, 8), -1, -2).reshape(B, N // TILE * 8, TILE)
    return p, t

src_pos, smp_t = _prep()
w1 = jnp.asarray(rng.normal(size=(W1_ROWS, H)).astype(np.float32))
b1 = jnp.asarray(rng.normal(size=(H, 1)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32))
b2 = jnp.asarray(rng.normal(size=(1, C)).astype(np.float32))

n_tiles = M // TILE

def _ix(s):
    n = jnp.int32(n_tiles)
    return (jax.lax.div(s, n), jax.lax.rem(s, n), 0)

def _full(s):
    return (_ix(s)[0], 0, 0)

vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

def call(kernel, f):
    fz = f.astype(jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=(B * n_tiles,),
        in_specs=[vm((1, 8, TILE), _ix), vm((1, N, LANE), _full),
                  vm((1, N, C), _full), vm(), vm(), vm(), vm()],
        out_specs=vm((1, TILE, C), _ix),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
    )(smp_t, src_pos, fz, w1, b1, w2, b2)


def k_mm_only(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """Matmul schedule floor: (H+1) matmuls with a fixed bf16 plane."""
    a = (src_pos_ref[0][:, 0:1] * jnp.ones((1, TILE), jnp.float32)).astype(
        jnp.bfloat16
    )  # (N, TILE) plane stand-in (one broadcast, hoisted out of the loop)
    fz = fz_ref[0]
    acc = jnp.zeros((TILE, C), jnp.float32)
    for h in range(H + 1):
        g = jax.lax.dot_general(a, fz, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc += g * w2_ref[h % H][None, :]
    out_ref[0] = acc


def k_vpu_only(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """Plane generation only (d2 + H x (pre,relu,mask,cast)) + ONE matmul."""
    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]
    d2 = _pair_d2(cand, smp_t)
    maskf = (d2 <= RADIUS * RADIUS).astype(jnp.float32)
    inv_r = 1.0 / RADIUS
    cw = jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32) * inv_r
    swT = jax.lax.dot_general(w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * inv_r
    fz = fz_ref[0]
    acc_plane = jnp.zeros((N, TILE), jnp.bfloat16)
    for h in range(H):
        pre = cw[:, h:h+1] - swT[h:h+1, :] + b1_ref[h, 0]
        a_h = (jnp.maximum(pre, 0.0) * maskf).astype(jnp.bfloat16)
        acc_plane += a_h
    g = jax.lax.dot_general(acc_plane, fz, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[0] = g


def k_fwd_replica(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """Replica of the current fwd kernel body (sanity check)."""
    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]
    d2 = _pair_d2(cand, smp_t)
    maskf = (d2 <= RADIUS * RADIUS).astype(jnp.float32)
    inv_r = 1.0 / RADIUS
    cw = jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32) * inv_r
    swT = jax.lax.dot_general(w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * inv_r
    fz = fz_ref[0]
    acc = jnp.zeros((TILE, C), jnp.float32)
    for h in range(H):
        pre = cw[:, h:h+1] - swT[h:h+1, :] + b1_ref[h, 0]
        a_h = jnp.maximum(pre, 0.0) * maskf
        g = _mm(a_h, fz, ((0,), (0,)))
        acc += g * w2_ref[h:h+1, :]
    g0 = _mm(maskf, fz, ((0,), (0,)))
    acc += g0 * b2_ref[:]
    out_ref[0] = acc


def k_h1(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]
    d2 = _pair_d2(cand, smp_t)
    maskf = (d2 <= RADIUS * RADIUS).astype(jnp.float32)
    inv_r = 1.0 / RADIUS
    cw = jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32) * inv_r
    swT = jax.lax.dot_general(w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * inv_r
    fz = fz_ref[0]
    acc = jnp.zeros((TILE, C), jnp.float32)
    for h in range(1):
        pre = cw[:, h:h+1] - swT[h:h+1, :] + b1_ref[h, 0]
        a_h = jnp.maximum(pre, 0.0) * maskf
        g = _mm(a_h, fz, ((0,), (0,)))
        acc += g * w2_ref[h:h+1, :]
    out_ref[0] = acc


VARIANTS = {
    "fwd": fwd_cur,
    "layer": layer_cur,
    "replica": lambda f: call(k_fwd_replica, f),
    "mm_only": lambda f: call(k_mm_only, f),
    "vpu_only": lambda f: call(k_vpu_only, f),
    "h1": lambda f: call(k_h1, f),
}


def k_noop(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    out_ref[0] = jnp.zeros((TILE, C), jnp.float32) + w2_ref[0, 0]


def call_big(kernel, f):
    fz = f.astype(jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vm((1, 8, TILE), lambda s: (s, 0, 0)),
                  vm((1, N, LANE), lambda s: (s, 0, 0)),
                  vm((1, N, C), lambda s: (s, 0, 0)),
                  vm(), vm(), vm(), vm()],
        out_specs=vm((1, M, C), lambda s: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
    )(smp_t, src_pos, fz, w1, b1, w2, b2)


def k_mm_big(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """One grid step per cloud: 9 matmuls of (M, N) @ (N, C)."""
    a = (src_pos_ref[0][:, 0:1] * jnp.ones((1, M), jnp.float32)).astype(
        jnp.bfloat16
    )  # (N, M)
    fz = fz_ref[0]
    acc = jnp.zeros((M, C), jnp.float32)
    for h in range(H + 1):
        g = jax.lax.dot_general(a, fz, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc += g * w2_ref[h % H][None, :]
    out_ref[0] = acc


def xla_equiv(f):
    """Pure-XLA 9-matmul equivalent (no pallas)."""
    fz = f.astype(jnp.bfloat16)  # (B, N, C)
    a = (pts[..., 0:1] * jnp.ones((1, 1, M), jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.zeros((B, M, C), jnp.float32)
    for h in range(H + 1):
        g = jax.lax.dot_general(a, fz, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        acc += g * w2[h % H][None, None, :]
    return acc


VARIANTS.update(
    noop=lambda f: call(k_noop, f),
    mm_big=lambda f: call_big(k_mm_big, f),
    xla_equiv=xla_equiv,
)



def k_fwd_bf16(smp_t_ref, src_pos_ref, fz_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """fwd with bf16 pair planes + additive mask (d2/compare stays f32)."""
    smp_t = smp_t_ref[0]
    cand = src_pos_ref[0]
    d2 = _pair_d2(cand, smp_t)
    inball = d2 <= RADIUS * RADIUS  # f32 compare (bf16 cmp unsupported)
    mtilde = jnp.where(inball, 0.0, -1e9).astype(jnp.bfloat16)
    maskf = inball.astype(jnp.bfloat16)  # for the bias term
    inv_r = 1.0 / RADIUS
    cw = (jnp.dot(cand[:, :W1_ROWS], w1_ref[:], preferred_element_type=jnp.float32)
          * inv_r + b1_ref[:, 0][None, :]).astype(jnp.bfloat16)  # (N, H), b1 folded
    swT = (jax.lax.dot_general(w1_ref[:], smp_t, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * inv_r
           ).astype(jnp.bfloat16)  # (H, TILE)
    fz = fz_ref[0]
    acc = jnp.zeros((TILE, C), jnp.float32)
    for h in range(H):
        pre = (cw[:, h:h+1] - swT[h:h+1, :]) + mtilde  # bf16 plane, 2 ops
        a_h = jnp.maximum(pre, jnp.bfloat16(0.0))      # 1 op, already bf16
        g = jax.lax.dot_general(a_h, fz, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc += g * w2_ref[h:h+1, :]
    g0 = jax.lax.dot_general(maskf, fz, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc += g0 * b2_ref[:]
    out_ref[0] = acc


VARIANTS["fwd_bf16"] = lambda f: call(k_fwd_bf16, f)


# --- correctness check vs replica --------------------------------------------
def check(name_a="replica", name_b="fwd_bf16"):
    oa = jax.jit(VARIANTS[name_a])(feats)
    ob = jax.jit(VARIANTS[name_b])(feats)
    err = float(jnp.max(jnp.abs(oa - ob)) / (jnp.max(jnp.abs(oa)) + 1e-9))
    print(f"rel err {name_a} vs {name_b}: {err:.2e}")

if "--check" in sys.argv:
    sys.argv.remove("--check")
    check()

for name in (sys.argv[1:] or VARIANTS):
    print(f"{name:10s} {timed(VARIANTS[name])*1e3:8.3f} ms", flush=True)
