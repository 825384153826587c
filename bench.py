"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): samples/sec/chip for the 8ch 48 kHz
conv-reverb + biquad-chain pipeline. Until the conv family lands, the
measured pipeline is the biquad part (10-section Butterworth cascade +
A-weighting, 5 sections + gain); the metric name says what was run.

vs_baseline compares against the Go reference's single-core biquad
throughput: 1026 MB/s of float64 = 1.283e8 samples/s *per section*
(BASELINE.md: biquad ProcessBlock N=1024), i.e. 1.283e8 / n_sections
samples/s through an equivalent cascade.

Method notes:
  * one jit callable reused (compile excluded),
  * a scalar of the result is fetched each iteration — on the axon
    relay, block_until_ready() returns before execution completes, so
    only a data fetch gives honest timings.
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

    sr = 48000.0
    channels = 512          # bulk batch to saturate the chip
    n = 96000               # 2 s per channel
    cascade = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    weighting = weighting_chain(WeightingType.A, sr)
    n_sections = cascade.num_sections + weighting.num_sections  # 10/2+5

    @jax.jit
    def pipeline(x):
        return weighting.process(cascade.process(x))

    x = jnp.asarray(np.random.default_rng(0).standard_normal((channels, n)),
                    jnp.float32)
    # warm up + compile
    float(pipeline(x)[0, -1])

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        y = pipeline(x)
    _ = float(y[0, -1])  # force completion (relay-safe)
    dt = (time.time() - t0) / reps

    samples_per_sec = channels * n / dt
    go_cascade_rate = 1.283e8 / n_sections
    print(json.dumps({
        "metric": "samples_per_sec_per_chip_biquad_aweight_pipeline",
        "value": samples_per_sec,
        "unit": "samples/s",
        "vs_baseline": samples_per_sec / go_cascade_rate,
    }))


if __name__ == "__main__":
    main()
