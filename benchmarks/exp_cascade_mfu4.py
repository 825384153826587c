"""Round-4 experiment 4: per-stage timing of the cascade engine at
B=256 (u dot / w dot / sweeps / output dot), plus a pure-HBM anchor
(big f32 copy and a (2^21,256)@(256,256) HIGHEST dot) to place each
stage against the chip's achievable bandwidth."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
from algodsp_tpu.ops import cascade as cascmod

sr = 48000.0
rng = np.random.default_rng(0)
casc = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
weighting = weighting_chain(WeightingType.A, sr)
sos = np.concatenate([casc.runtime_sos, weighting.runtime_sos])
S = sos.shape[0]
C, N, B = 8, 1 << 24, 256
K = N // B
x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
HI = jax.lax.Precision.HIGHEST

def timeit(fn, *args, reps=5):
    y = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    return (time.time() - t0) / reps

kern = cascmod.cascade_kernels(sos, B)
d = kern.d
LcT, WinT, CoutT = cascmod._dot_consts(
    np.ascontiguousarray(sos).tobytes(), S, B, 1.0)
sw = cascmod._sweep_mats(np.ascontiguousarray(sos).tobytes(), S, B, K)
xb = x.reshape(C, K, B)

dot = lambda a, W: jnp.dot(a.reshape((-1, a.shape[-1])),
                           jnp.asarray(W, jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=HI).reshape(
                               a.shape[:-1] + (np.asarray(W).shape[-1],))

f_u = jax.jit(lambda v: dot(v, LcT))
f_w = jax.jit(lambda v: dot(v, WinT))
def sweeps_fn(w):
    for shift, M in sw:
        Mj = jnp.asarray(M, jnp.float32)
        shifted = jnp.einsum("...kd,ed->...ke", w[..., :-shift, :], Mj,
                             preferred_element_type=jnp.float32, precision=HI)
        w = jnp.concatenate(
            [w[..., :shift, :], w[..., shift:, :] + shifted], axis=-2)
    return w
f_s = jax.jit(sweeps_fn)
f_o = jax.jit(lambda e, u: u + dot(e, CoutT))

w0 = f_w(xb)
e0 = f_s(w0)
u0 = f_u(xb)

t_u = timeit(f_u, xb)
t_w = timeit(f_w, xb)
t_s = timeit(f_s, w0)
t_o = timeit(f_o, e0, u0)
tot = t_u + t_w + t_s + t_o
gb = lambda nbytes, t: nbytes / t / 1e9
print(f"u dot   (x->u, {C*N*4*2/1e6:.0f} MB r+w): {t_u*1e3:7.2f} ms  "
      f"bw={gb(C*N*4*2, t_u):6.1f} GB/s")
print(f"w dot   (x->w): {t_w*1e3:7.2f} ms  "
      f"bw={gb(C*N*4 + C*K*d*4, t_w):6.1f} GB/s")
print(f"sweeps  ({len(sw)} passes over w={C*K*d*4/1e6:.0f} MB): "
      f"{t_s*1e3:7.2f} ms  bw={gb(len(sw)*3*C*K*d*4, t_s):6.1f} GB/s")
print(f"out dot (e,u->y): {t_o*1e3:7.2f} ms  "
      f"bw={gb(C*K*d*4 + 2*C*N*4, t_o):6.1f} GB/s")
print(f"sum {tot*1e3:.2f} ms vs whole-engine:", flush=True)
f_full = jax.jit(lambda v: cascmod.cascade_apply_blocked(v, sos, block=B))
t_f = timeit(f_full, x)
print(f"full engine: {t_f*1e3:.2f} ms  ({C*N/t_f/1e9:.2f} Gsamp/s)")

# anchors
big = jnp.asarray(rng.standard_normal((C * K, B)), jnp.float32)
Wm = jnp.asarray(rng.standard_normal((B, B)), jnp.float32)
f_dot = jax.jit(lambda a, b: jnp.dot(a, b, precision=HI))
t_d = timeit(f_dot, big, Wm)
print(f"anchor (2^19,256)@(256,256) HIGHEST: {t_d*1e3:.2f} ms  "
      f"bw={gb(C*K*B*4*2, t_d):6.1f} GB/s  "
      f"flops={2*C*K*B*B/t_d/1e12:.1f} TFLOP/s")
f_cp = jax.jit(lambda a: a + 1.0)
t_c = timeit(f_cp, x)
print(f"anchor copy {C*N*4/1e6:.0f} MB r+w: {t_c*1e3:.2f} ms  "
      f"bw={gb(C*N*4*2, t_c):6.1f} GB/s")
