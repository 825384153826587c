"""Round-4 experiment: cascade-engine block-size / precision / fusion
sweep on the real TPU — the MFU lever hunt (VERDICT item 4).

Measures, for the 15-section bench cascade at 8ch x 2^24:
  - B in {128, 256, 512}, precision HIGHEST vs HIGH (bf16x3)
  - samples/s, achieved FLOP/s vs f32 peak, implied HBM GB/s from the
    engine's minimum traffic model
  - SNR vs the f64-on-CPU oracle for any reduced-precision variant
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

def timeit(fn, *args, reps=5):
    y = fn(*args)
    float(jnp.ravel(y)[-1])
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    float(jnp.ravel(y)[-1])
    return (time.time() - t0) / reps

def model(B, K, sweeps):
    d = 2 * S + 2
    flops = 2.0 * C * (N * (B + 2 * d) + K * d * d * sweeps)
    # min HBM traffic model (f32 bytes/sample):
    # read x twice (u & w dots), write u, write w, sweeps r/w w,
    # read w (entries) + read u + write y
    bps = 4 * (2 + 1 + d / B + sweeps * 2 * d / B + d / B + 1 + 1)
    return flops, bps * C * N

peak = TPU_PEAKS["v5e"]["flops_f32"]
for B in (128, 256, 512):
    K = N // B
    sweeps = len(cascmod._sweep_mats(
        np.ascontiguousarray(sos).tobytes(), S, B, K))
    flops, byts = model(B, K, sweeps)
    for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("HIGH", jax.lax.Precision.HIGH)):
        f = jax.jit(lambda v, B=B, prec=prec: cascmod.cascade_apply_blocked(
            v, sos, block=B, precision=prec))
        try:
            dt = timeit(f, x)
        except Exception as e:
            print(f"B={B} {prec_name}: FAILED {type(e).__name__}", flush=True)
            continue
        sps = C * N / dt
        print(f"B={B:4d} {prec_name:8s} sweeps={sweeps} "
              f"{sps/1e9:7.2f} Gsamp/s  mfu={100*flops/dt/peak:5.2f}%  "
              f"implied_bw={byts/dt/1e9:6.1f} GB/s", flush=True)

# SNR check for HIGH vs HIGHEST at the winning B (done on-device, f32)
for B in (128, 512):
    fh = jax.jit(lambda v: cascmod.cascade_apply_blocked(
        v, sos, block=B, precision=jax.lax.Precision.HIGHEST))
    fl = jax.jit(lambda v: cascmod.cascade_apply_blocked(
        v, sos, block=B, precision=jax.lax.Precision.HIGH))
    xs = x[:, :1 << 20]
    yh = np.asarray(fh(xs), np.float64)
    yl = np.asarray(fl(xs), np.float64)
    snr = 10 * np.log10((yh ** 2).sum() / ((yh - yl) ** 2).sum())
    print(f"B={B}: HIGH-vs-HIGHEST SNR = {snr:.1f} dB", flush=True)
