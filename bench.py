"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): samples/sec/chip for the 8-channel 48 kHz
conv-reverb (2^17-tap IR) + biquad-chain pipeline:
  10-section Butterworth cascade + A-weighting chain -> partitioned
  frequency-domain conv reverb.

Formulations (round 3): the pipeline is LTI end to end, so the biquad
chain is FOLDED into the convolution kernel (`conv/ltifold.py`):
h_combined = h_chain (*) ir with the IIR impulse tail truncated below
-150 dB of peak, then ONE fused Pallas FDL pass (ops/fdlconv.py —
matmul FFT + spectral MAC + iFFT in one VMEM pass) computes the whole
pipeline. Exactness of the fold vs the unfused cascade -> reverb path
is asserted in tests/test_ltifold.py and measures ~129 dB SNR at this
exact bench configuration (f32). The signal is 2^26 samples per
channel per dispatch (536 Msamples/dispatch, falling back to 2^24 if
HBM is shared) so the ~3-6 ms axon relay dispatch floor is amortized —
a bulk file-processing workload, the same regime the Go baseline
measures.

vs_baseline compares against the Go reference's single-core rate for
the same work, estimated from BASELINE.md:
  - biquad: 1.283e8 samples/s per section -> 15 sections,
  - OverlapAdd-derived conv rate ~1.76e7 samples/s (BASELINE.md:26).
  Combined serial rate: 1/(15/1.283e8 + 1/1.76e7) ~ 5.8e6 samples/s.
(The reference runs the stages serially; it has no LTI folding.)

roofline_pct is the biquad-cascade engine's achieved f32 FLOP/s (its
actual op count: B + 2d MACs/sample plus carry sweeps) as % of the
v5e 98 TFLOP/s f32 peak — the "scan-kernel roofline %" deliverable,
still measured on the live cascade engine (the folded headline no
longer runs it per sample, but interactive/streaming chains do).

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


def _timeit(fn, *args, reps=10):
    # reps=10: the single completion fetch pays one ~30 ms relay round
    # trip; amortizing it over 10 reps keeps its share under ~2.5% of a
    # 130 ms dispatch (measured 4.13 -> 4.24 Gsamples/s vs reps=5)
    y = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[-1])
    return (time.time() - t0) / reps


def main():
    from algodsp_tpu.filters import BiquadChain, design
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    from algodsp_tpu.conv import folded_convolver
    from algodsp_tpu.utils.profiling import TPU_PEAKS

    sr = 48000.0
    channels = 8
    # ~23 min of audio per channel per dispatch (bulk regime): the
    # larger the dispatch, the better the ~3-6 ms relay floor amortizes
    # (measured: 2^24 -> 2.61-2.77, 2^25 -> 2.73-2.79, 2^26 -> 2.93
    # Gsamples/s unfolded). 2^26 fits one v5e chip alone; fall back if
    # the device is sharing HBM with anything else.
    candidate_n = (1 << 26, 1 << 24)
    rng = np.random.default_rng(0)

    cascade = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    weighting = weighting_chain(WeightingType.A, sr)
    # one combined cascade (cascade of cascades = same LTI system)
    chain = BiquadChain(
        np.concatenate([cascade.runtime_sos, weighting.runtime_sos]),
        gain=cascade.gain * weighting.gain, condition=False)
    ir = (rng.standard_normal(1 << 17) *
          np.exp(-np.arange(1 << 17) / 20000.0)).astype(np.float32)
    # LTI fold: chain + reverb -> one combined-kernel FDL convolver
    reverb = folded_convolver(chain, ir, min_block_order=10)

    @jax.jit
    def pipeline(x):
        return reverb.process(x)

    x = None
    for n in candidate_n:
        try:
            x = jnp.asarray(rng.standard_normal((channels, n)), jnp.float32)
            dt = _timeit(pipeline, x)
            break
        except Exception as exc:  # RESOURCE_EXHAUSTED -> smaller dispatch
            if "RESOURCE_EXHAUSTED" not in str(exc) or n == candidate_n[-1]:
                raise
            x = None  # drop any partial allocation before retrying
    samples_per_sec = channels * n / dt

    # scan-kernel roofline: the cascade block engine alone, with its
    # actual op count (B + 2d MACs/sample + truncated carry sweeps)
    @jax.jit
    def biquads(x):
        return chain.process(x)

    dt_bq = _timeit(biquads, x)
    from algodsp_tpu.ops import cascade as cascmod
    from algodsp_tpu.ops import linrec
    # the bulk one-shot path re-blocks to B=256 (biquad.py:process_cascade),
    # so model the flops of the kernels that actually ran: 256-conditioned
    # SOS, B=256, its own sweep count
    B = 256
    sos_bulk = (linrec.condition_sos(chain.sos, B)
                if chain._condition else chain.sos)
    d = 2 * sos_bulk.shape[0] + 2
    K = n // B
    sweeps = len(cascmod._sweep_mats(
        np.ascontiguousarray(np.asarray(sos_bulk, np.float64)).tobytes(),
        sos_bulk.shape[0], B, K))
    flops = 2.0 * channels * (n * (B + 2 * d) + K * d * d * sweeps)
    roofline_pct = 100.0 * (flops / dt_bq) / TPU_PEAKS["v5e"]["flops_f32"]

    go_rate = 1.0 / (15.0 / 1.283e8 + 1.0 / 1.76e7)
    print(json.dumps({
        "metric": "samples_per_sec_per_chip_convreverb_biquad_8ch",
        "value": samples_per_sec,
        "unit": "samples/s",
        "vs_baseline": samples_per_sec / go_rate,
        "roofline_pct": roofline_pct,
    }))


if __name__ == "__main__":
    main()
