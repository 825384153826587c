"""Benchmark suite: measures the framework's hot paths on the attached
TPU and emits a Markdown table (stdout) for BENCHMARKS.md.

Methodology: one jitted callable per case, compile excluded, scalar
fetch to force completion (the axon relay's block_until_ready returns
early), 5+ reps. Reference numbers from BASELINE.md are single-core Go
on an i7-1255U.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    # fetch ONE scalar via a device-side gather: np.asarray on the full
    # result would drag the whole array through the relay and dominate
    # the measurement
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[-1])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps


def main():
    from algodsp_tpu.filters import BiquadChain, FIRFilter, design
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    from algodsp_tpu.conv import PartitionedConvolver, fftconvolve
    from algodsp_tpu.resample import Resampler
    from algodsp_tpu.effects.dynamics import Compressor
    from algodsp_tpu import window, spectrum
    from algodsp_tpu.spectrum import Goertzel
    from algodsp_tpu.utils.profiling import biquad_cascade_flops

    sr = 48000.0
    rng = np.random.default_rng(0)
    rows = []

    def row(name, t, samples, note=""):
        rows.append((name, t * 1e3, samples / t / 1e6, note))
        print(f"... {name}: {t*1e3:.2f} ms, {samples/t/1e6:.1f} Msamples/s",
              file=sys.stderr)

    # 1. biquad cascade
    bq = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    f_bq = jax.jit(bq.process)
    for ch in (8, 64, 512):
        x = jnp.asarray(rng.standard_normal((ch, 96000)), jnp.float32)
        t = bench(f_bq, x)
        note = ""
        if ch == 512:
            fl = biquad_cascade_flops(ch, 96000, 10)
            note = f"{fl/t/1e12:.1f} TFLOP/s on the Toeplitz matmuls"
        row(f"biquad 10-section cascade, {ch}ch x 96000", t, ch * 96000, note)

    # 2. A-weighting chain
    aw = weighting_chain(WeightingType.A, sr)
    f_aw = jax.jit(aw.process)
    x = jnp.asarray(rng.standard_normal((64, 96000)), jnp.float32)
    row("A-weighting chain (5 sections), 64ch x 96000",
        bench(f_aw, x), 64 * 96000)

    # 3. FIR 128 taps
    fir = FIRFilter(rng.standard_normal(128))
    f_fir = jax.jit(fir.process)
    x = jnp.asarray(rng.standard_normal((64, 48000)), jnp.float32)
    row("FIR 128 taps, 64ch x 48000", bench(f_fir, x), 64 * 48000)

    # 4. conv reverb
    ir = (rng.standard_normal(1 << 17)
          * np.exp(-np.arange(1 << 17) / 20000)).astype(np.float32)
    pc = PartitionedConvolver(ir, min_block_order=10)
    f_pc = jax.jit(pc.process)
    f_ps = jax.jit(pc.process_stream)
    for ch in (8, 64):
        x = jnp.asarray(rng.standard_normal((ch, 1 << 17)), jnp.float32)
        t = bench(f_pc, x, reps=3)
        row(f"partitioned conv reverb 2^17-tap IR, {ch}ch x 2^17 "
            "(bulk one-shot)", t, ch * (1 << 17))
        st = pc.init_state((ch,), jnp.float32)
        t = bench(f_ps, st, x, reps=3)
        row(f"partitioned conv reverb 2^17-tap IR, {ch}ch x 2^17 "
            "(streaming FDL, latency 1024)", t, ch * (1 << 17))
    f_fft = jax.jit(lambda x: fftconvolve(x, jnp.asarray(ir)))
    x8 = jnp.asarray(rng.standard_normal((8, 1 << 17)), jnp.float32)
    row("one-shot fftconvolve 2^17 x 2^17, 8ch", bench(f_fft, x8), 8 * (1 << 17))

    # 5. resampler 147:160
    rs = Resampler.for_rates(44100.0, 48000.0)
    f_rs = jax.jit(rs.process)
    x = jnp.asarray(rng.standard_normal((64, 1 << 17)), jnp.float32)
    row("polyphase resample 44.1k->48k, 64ch x 2^17 in",
        bench(f_rs, x), 64 * (1 << 17))

    # 6. compressor (envelope scan bound)
    comp = Compressor(sr)
    cstate = comp.init_state((64,))
    f_c = jax.jit(lambda s, x: comp.process(s, x))
    x = jnp.asarray(rng.standard_normal((64, 48000)), jnp.float32)
    row("compressor (scan-bound), 64ch x 48000",
        bench(f_c, cstate, x), 64 * 48000)

    # 7. windowed spectrum 4096
    def spec4096(x):
        xw = window.apply(x, window.WindowType.HANN, periodic=True)
        return spectrum.magnitude(jnp.fft.rfft(xw))
    f_s = jax.jit(spec4096)
    x = jnp.asarray(rng.standard_normal((512, 4096)), jnp.float32)
    row("Hann window + rfft + magnitude, 512 x 4096",
        bench(f_s, x), 512 * 4096)

    # 8. goertzel 64 freqs
    g = Goertzel(np.linspace(100, 20000, 64), sr)
    gs = g.init_state((64,))
    f_g = jax.jit(lambda s, x: g.process_block(s, x))
    x = jnp.asarray(rng.standard_normal((64, 48000)), jnp.float32)
    row("Goertzel matmul, 64 freqs x 64ch x 48000",
        bench(f_g, gs, x), 64 * 48000)

    # 9. blocked feedback effects
    from algodsp_tpu.effects.reverb import Freeverb, FDNReverb
    from algodsp_tpu.effects.delay_effect import Delay
    x = jnp.asarray(rng.standard_normal((64, 2048)), jnp.float32)
    fv = Freeverb()
    f_fv = jax.jit(fv.process)
    row("Freeverb (blocked feedback), 64ch x 2048",
        bench(f_fv, fv.init_state((64,)), x), 64 * 2048)
    fdn = FDNReverb(sr)
    f_fdn = jax.jit(fdn.process)
    row("FDN reverb (blocked, modulated), 64ch x 2048",
        bench(f_fdn, fdn.init_state((64,)), x), 64 * 2048)
    dl = Delay(sr)
    f_dl = jax.jit(dl.process)
    row("feedback delay 250ms (blocked), 64ch x 2048",
        bench(f_dl, dl.init_state((64,)), x), 64 * 2048)

    print(f"\nBackend: {jax.default_backend()}, devices: {jax.devices()}\n")
    print("| Benchmark | ms/call | Msamples/s | Notes |")
    print("|---|---:|---:|---|")
    for name, ms, msps, note in rows:
        print(f"| {name} | {ms:.2f} | {msps:.1f} | {note} |")


if __name__ == "__main__":
    main()
