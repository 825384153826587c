"""Round-4 experiment 2: traffic-cutting formulations of the cascade
engine at B=256/512 — (A) combined [Lc|Win] single input dot (one x
read), (B) deferred zero-IC output (u never materialized, second x
read), (C) A with the sweep concat replaced by in-place adds via pad.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
from algodsp_tpu.ops import cascade as cascmod
from algodsp_tpu.utils.profiling import TPU_PEAKS

sr = 48000.0
rng = np.random.default_rng(0)
casc = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
weighting = weighting_chain(WeightingType.A, sr)
sos = np.concatenate([casc.runtime_sos, weighting.runtime_sos])
S = sos.shape[0]
C, N = 8, 1 << 24
x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
HI = jax.lax.Precision.HIGHEST

def timeit(fn, *args, reps=5):
    y = fn(*args)
    float(jnp.ravel(y)[-1])
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    float(jnp.ravel(y)[-1])
    return (time.time() - t0) / reps

def variant(xv, B, mode):
    kern = cascmod.cascade_kernels(sos, B)
    d = kern.d
    K = N // B
    dt = xv.dtype
    LcT, WinT, CoutT = cascmod._dot_consts(
        np.ascontiguousarray(sos).tobytes(), S, B, 1.0)
    sw = cascmod._sweep_mats(np.ascontiguousarray(sos).tobytes(), S, B, K)
    xb = xv.reshape(xv.shape[:-1] + (K, B))
    dot = lambda a, W: jnp.dot(a.reshape((-1, a.shape[-1])),
                               jnp.asarray(W, dt),
                               preferred_element_type=dt,
                               precision=HI).reshape(
                                   a.shape[:-1] + (np.asarray(W).shape[-1],))
    if mode == "A":  # combined input dot
        UW = np.concatenate([LcT, WinT], axis=1)          # (B, B+d)
        uw = dot(xb, UW)
        u, w = uw[..., :B], uw[..., B:]
    else:
        w = dot(xb, WinT)
    for shift, M in sw:
        Mj = jnp.asarray(M, dt)
        shifted = jnp.einsum("...kd,ed->...ke", w[..., :-shift, :], Mj,
                             preferred_element_type=dt, precision=HI)
        w = jnp.concatenate(
            [w[..., :shift, :], w[..., shift:, :] + shifted], axis=-2)
    s0 = jnp.zeros(xv.shape[:-1] + (d,), dt)
    entries = jnp.concatenate([s0[..., None, :], w[..., :-1, :]], axis=-2)
    if mode == "A":
        y = u + dot(entries, CoutT)
    else:  # B: deferred zero-IC output
        y = dot(xb, LcT) + dot(entries, CoutT)
    return y.reshape(xv.shape[:-1] + (N,))

peak = TPU_PEAKS["v5e"]["flops_f32"]
base = {B: None for B in (256, 512)}
for B in (256, 512):
    K = N // B
    sweeps = len(cascmod._sweep_mats(
        np.ascontiguousarray(sos).tobytes(), S, B, K))
    d = 2 * S + 2
    flops = 2.0 * C * (N * (B + 2 * d) + K * d * d * sweeps)
    for mode in ("A", "B"):
        f = jax.jit(lambda v, B=B, m=mode: variant(v, B, m))
        dt_ = timeit(f, x)
        sps = C * N / dt_
        print(f"B={B:4d} mode={mode}  {sps/1e9:7.2f} Gsamp/s  "
              f"mfu={100*flops/dt_/peak:5.2f}%", flush=True)
    # exactness vs engine
    xs = x[:, :1 << 20]
    ref = np.asarray(jax.jit(lambda v: cascmod.cascade_apply_blocked(
        v, sos, block=B))(xs), np.float64)
    for mode in ("A", "B"):
        got = np.asarray(jax.jit(lambda v, m=mode: variant(v, B, m))(xs),
                         np.float64)
        snr = 10 * np.log10((ref ** 2).sum() / ((ref - got) ** 2).sum()
                            if ((ref - got) ** 2).sum() else np.inf)
        print(f"  B={B} mode={mode} SNR vs engine = {snr:.1f} dB", flush=True)
