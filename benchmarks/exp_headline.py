"""Experiments for the headline 8-channel conv-reverb+biquad metric.

Measures each pipeline component at 8 channels under several
formulations to find where the time goes and which variants to adopt:
  - biquad cascade: blocked XLA vs lane-packed folded Pallas
  - partitioned conv: bulk big-FFT vs streaming-FDL formulations at
    several partition sizes
  - full pipeline at N=2^17 and N=2^20 (dispatch amortization)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    y = fn(*args)
    float(jax.numpy.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    _ = float(jax.numpy.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    return (time.time() - t0) / reps


def main():
    from algodsp_tpu.filters import BiquadChain, design
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    from algodsp_tpu.conv import PartitionedConvolver

    sr = 48000.0
    C = 8
    rng = np.random.default_rng(0)
    cascade = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    weighting = weighting_chain(WeightingType.A, sr)
    ir = (rng.standard_normal(1 << 17) *
          np.exp(-np.arange(1 << 17) / 20000.0)).astype(np.float32)

    for n in (1 << 17, 1 << 20):
        x = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)
        print(f"== N = {n} ({C} ch; {C*n/1e6:.2f} Msamples) ==", flush=True)

        f_blocked = jax.jit(lambda v: cascade.process(v, mode="blocked"))
        f_folded = jax.jit(lambda v: cascade.process_folded(v))
        for name, f in [("cascade blocked", f_blocked),
                        ("cascade folded", f_folded)]:
            dt = timeit(f, x)
            print(f"{name:28s} {dt*1e3:8.2f} ms  {C*n/dt/1e6:9.1f} Msamp/s",
                  flush=True)

        for mbo in (10, 11, 12, 13):
            conv = PartitionedConvolver(ir, min_block_order=mbo)
            st = conv.init_state((C,), jnp.float32)
            f_fdl = jax.jit(lambda v, c=conv, s=st: c.process_stream(s, v)[1])
            dt = timeit(f_fdl, x)
            print(f"reverb FDL block=2^{mbo:<2d}        {dt*1e3:8.2f} ms  "
                  f"{C*n/dt/1e6:9.1f} Msamp/s", flush=True)
        conv10 = PartitionedConvolver(ir, min_block_order=10)
        f_bulk = jax.jit(conv10.process)
        dt = timeit(f_bulk, x)
        print(f"reverb bulk big-FFT          {dt*1e3:8.2f} ms  "
              f"{C*n/dt/1e6:9.1f} Msamp/s", flush=True)

        # full pipeline: folded biquads + best FDL
        for mbo in (10, 12):
            conv = PartitionedConvolver(ir, min_block_order=mbo)
            st = conv.init_state((C,), jnp.float32)

            @jax.jit
            def pipe(v, c=conv, s=st):
                y = cascade.process_folded(v)
                y = weighting.process_folded(y)
                return c.process_stream(s, y)[1]

            dt = timeit(pipe, x)
            print(f"pipeline folded+FDL 2^{mbo:<2d}     {dt*1e3:8.2f} ms  "
                  f"{C*n/dt/1e6:9.1f} Msamp/s", flush=True)

        @jax.jit
        def pipe_old(v):
            y = cascade.process(v, mode="blocked")
            y = weighting.process(y, mode="blocked")
            return conv10.process(y)

        dt = timeit(pipe_old, x)
        print(f"pipeline blocked+bulk (r1)   {dt*1e3:8.2f} ms  "
              f"{C*n/dt/1e6:9.1f} Msamp/s", flush=True)


if __name__ == "__main__":
    main()
