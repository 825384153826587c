"""Round-4 experiment 3: superblock triangular-matmul carry scan.

Replace the log-depth Hillis-Steele sweeps (7 slicing passes over w)
with: reshape w into superblocks of M = 2^sweeps blocks, ONE dot
against a precomputed (M d, M d) block-lower-triangular scan matrix
(e_j = sum_{i<=j} T^{j-i} w_i), then ONE small correction matmul for
the cross-superblock carry (T^M is below the existing truncation tol,
so the carry reaches at most one superblock ahead — same approximation
the sweeps already make).
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

from functools import lru_cache

@lru_cache(maxsize=16)
def scan_consts(B):
    kern = cascmod.cascade_kernels(sos, B)
    d = kern.d
    K = N // B
    sw = cascmod._sweep_mats(np.ascontiguousarray(sos).tobytes(), S, B, K)
    M = 1 << len(sw)
    # T powers 0..M
    P = [np.eye(d)]
    for _ in range(M):
        P.append(kern.T @ P[-1])
    # L such that e_flat = w_flat @ L with w_flat (Md,) row [i*d+df]:
    # e[j,de] = sum_{i<=j} T^{j-i}[de,df] w[i,df] -> L[(i,df),(j,de)]
    L = np.zeros((M * d, M * d))
    for j in range(M):
        for i in range(j + 1):
            L[i*d:(i+1)*d, j*d:(j+1)*d] = P[j - i].T
    # correction: corr_flat = c_prev @ Pc with Pc[(df),(j*d+de)] = T^{j+1}[de,df]
    Pc = np.zeros((d, M * d))
    for j in range(M):
        Pc[:, j*d:(j+1)*d] = P[j + 1].T
    return kern, d, M, L, Pc

def engine_sb(xv, B):
    kern, d, M, L, Pc = scan_consts(B)
    K = N // B
    dt = xv.dtype
    LcT, WinT, CoutT = cascmod._dot_consts(
        np.ascontiguousarray(sos).tobytes(), S, B, 1.0)
    xb = xv.reshape(xv.shape[:-1] + (K, B))
    dot = lambda a, W: jnp.dot(a.reshape((-1, a.shape[-1])),
                               jnp.asarray(W, dt),
                               preferred_element_type=dt,
                               precision=HI).reshape(
                                   a.shape[:-1] + (np.asarray(W).shape[-1],))
    u = dot(xb, LcT)
    w = dot(xb, WinT)                          # (C, K, d)
    G = K // M                                 # assume divisible here
    wf = w.reshape(w.shape[:-2] + (G, M * d))
    e = dot(wf, L)                             # in-superblock inclusive scan
    # cross-superblock carry (reaches ONE superblock, T^M < tol)
    c_prev = e[..., :-1, -d:]                  # (C, G-1, d)
    corr = dot(c_prev, Pc)                     # (C, G-1, M*d)
    e = jnp.concatenate([e[..., :1, :], e[..., 1:, :] + corr], axis=-2)
    e = e.reshape(w.shape)                     # (C, K, d)
    s0 = jnp.zeros(xv.shape[:-1] + (d,), dt)
    entries = jnp.concatenate([s0[..., None, :], e[..., :-1, :]], axis=-2)
    y = u + dot(entries, CoutT)
    return y.reshape(xv.shape[:-1] + (N,))

peak = TPU_PEAKS["v5e"]["flops_f32"]
for B in (128, 256, 512):
    kern, d, M, L, Pc = scan_consts(B)
    K = N // B
    if K % M:
        print(f"B={B}: K%M != 0, skip"); continue
    flops = 2.0 * C * N * (B + 2 * d + (M * d * d) / (2.0 * B) + d * d / B)
    f = jax.jit(lambda v, B=B: engine_sb(v, B))
    dt_ = timeit(f, x)
    sps = C * N / dt_
    print(f"B={B:4d} M={M:3d}  {sps/1e9:7.2f} Gsamp/s  "
          f"mfu={100*flops/dt_/peak:5.2f}%", flush=True)
    # exactness vs current engine (full length, same truncation)
    ref = np.asarray(jax.jit(lambda v: cascmod.cascade_apply_blocked(
        v, sos, block=B))(x[:2, :1 << 22]), np.float64)
    got = np.asarray(jax.jit(lambda v, B=B: engine_sb(
        jnp.pad(v, ((0, 6), (0, N - (1 << 22)))), B))(x[:2, :1 << 22])
        )[:2, :1 << 22].astype(np.float64)
    err = ((ref - got) ** 2).sum()
    snr = 10 * np.log10((ref ** 2).sum() / err) if err else np.inf
    print(f"  SNR vs sweep engine = {snr:.1f} dB", flush=True)
