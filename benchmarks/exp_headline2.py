"""Headline experiment round 2: long-signal variants only."""

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

    n = 1 << 20
    x = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)
    print(f"== N = {n} ({C} ch) ==", flush=True)

    for mbo in (12, 13, 14):
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

    for mbo in (12, 13):
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


if __name__ == "__main__":
    main()
