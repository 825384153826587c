"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): samples/sec/chip for the 8-channel 48 kHz
conv-reverb (2^17-tap IR) + biquad-chain pipeline:
  10-section Butterworth cascade + A-weighting chain -> partitioned
  frequency-domain conv reverb (latency 1024 samples).

vs_baseline compares against the Go reference's single-core rate for
the same work, estimated from BASELINE.md:
  - biquad: 1.283e8 samples/s per section -> 15 sections,
  - OverlapAdd 4096x64 ~ 1.8e7 samples/s per 64-tap partition pass;
    a 2^17 IR at the reference's UPOLA stage costs is dominated by the
    large-FFT stages; we use the measured OverlapAddReuse-derived
    ~1.76e7 samples/s as the per-core conv rate (BASELINE.md:26).
  Combined serial rate: 1/(15/1.283e8 + 1/1.76e7) ~ 5.8e6 samples/s.

Methodology: one jit callable reused (compile excluded); a scalar fetch
forces completion (on the axon relay block_until_ready returns early).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from algodsp_tpu.filters import BiquadChain, design
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    from algodsp_tpu.conv import PartitionedConvolver

    sr = 48000.0
    channels = 8
    n = 1 << 17  # ~2.7 s per channel
    rng = np.random.default_rng(0)

    cascade = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    weighting = weighting_chain(WeightingType.A, sr)
    ir = (rng.standard_normal(1 << 17) *
          np.exp(-np.arange(1 << 17) / 20000.0)).astype(np.float32)
    reverb = PartitionedConvolver(ir, min_block_order=10)

    @jax.jit
    def pipeline(x):
        y = cascade.process(x)
        y = weighting.process(y)
        return reverb.process(y)

    x = jnp.asarray(rng.standard_normal((channels, n)), jnp.float32)
    float(pipeline(x)[0, -1])  # warm up + compile

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        y = pipeline(x)
    _ = float(y[0, -1])
    dt = (time.time() - t0) / reps

    samples_per_sec = channels * n / dt
    go_rate = 1.0 / (15.0 / 1.283e8 + 1.0 / 1.76e7)
    print(json.dumps({
        "metric": "samples_per_sec_per_chip_convreverb_biquad_8ch",
        "value": samples_per_sec,
        "unit": "samples/s",
        "vs_baseline": samples_per_sec / go_rate,
    }))


if __name__ == "__main__":
    main()
