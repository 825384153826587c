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

    # 7b. public STFT roundtrip + mel/MFCC (batched matmul path)
    from algodsp_tpu.spectrum import stft, istft, mfcc
    nstft = 1 << 17
    f_st = jax.jit(lambda v: istft(stft(v, 1024, 256), 256, length=nstft))
    x = jnp.asarray(rng.standard_normal((64, nstft)), jnp.float32)
    row("STFT+WOLA istft roundtrip 1024/256, 64ch x 2^17",
        bench(f_st, x), 64 * nstft)
    f_mf = jax.jit(lambda v: mfcc(v, sr, n_mfcc=13, n_mels=64,
                                  frame_size=1024, hop_size=256))
    row("mel-64 MFCC-13 1024/256, 64ch x 2^17",
        bench(f_mf, x), 64 * nstft)

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

    # 10. multirate octave analyzer + vocoder + WSOLA (round-2 rows)
    from algodsp_tpu.filters.bank import Bank, MultirateOctaveAnalyzer
    bank = Bank.octave(3, sr)
    f_b = jax.jit(bank.process)
    x = jnp.asarray(rng.standard_normal((64, 16384)), jnp.float32)
    row(f"1/3-octave bank ({bank.centers.size} bands), 64ch x 16384",
        bench(f_b, x), 64 * 16384)
    ana = MultirateOctaveAnalyzer(3, sr)
    f_a = jax.jit(ana.process)
    sa = ana.init_state((64,))
    xa = jnp.asarray(rng.standard_normal((64, 16384)), jnp.float32)
    row("1/3-octave analyzer (multirate groups), 64ch x 16384",
        bench(f_a, sa, xa), 64 * 16384)
    # streamed: the dispatch-floor-amortized form (scan over 32 blocks
    # inside one jit; exactness vs block-at-a-time in
    # tests/test_bank_multirate.py). Round 5: batching the decimated
    # groups into one padded banded call was MEASURED SLOWER (padding
    # to a common length 3.3x the band-sample count); the floor, not
    # the group serialization, dominated the round-4 row.
    import functools as _ft
    from algodsp_tpu.streaming import scan_blocks as _scan
    nb_a = 32
    xs_a = jnp.asarray(rng.standard_normal((64, 16384 * nb_a)), jnp.float32)
    f_as = jax.jit(_ft.partial(_scan, ana.process, block_size=16384))
    row(f"1/3-octave analyzer streamed, 64ch x 16384 x {nb_a} blocks",
        bench(f_as, sa, xs_a), 64 * 16384 * nb_a)
    from algodsp_tpu.effects.vocoder import Vocoder
    voc = Vocoder(sr)
    f_v = jax.jit(voc.process)
    sv = voc.init_state((8,))
    xv = jnp.asarray(rng.standard_normal((8, 16384)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((8, 16384)), jnp.float32)
    row(f"vocoder (1/3-octave, {voc.num_bands} bands), 8ch x 16384",
        bench(f_v, sv, xv, cv), 8 * 16384)
    from algodsp_tpu.effects.pitch import WSOLAPitchShifter
    ws = WSOLAPitchShifter(sr, pitch_ratio=2 ** (3 / 12))
    f_w = jax.jit(ws.process)
    xw = jnp.asarray(rng.standard_normal((64, 1 << 16)), jnp.float32)
    row("WSOLA pitch shift +3 st, 64ch x 2^16",
        bench(f_w, xw), 64 * (1 << 16))

    # 11. multi-block single-dispatch streaming (streaming.scan_blocks /
    # Chain.process_blocks): 256 latency blocks of 2048 per dispatch so
    # the ~3-6 ms relay floor amortizes; same per-block state semantics
    # as rows 9 (exactness asserted in tests/test_streaming.py)
    import functools
    import json as _json
    from algodsp_tpu.streaming import scan_blocks
    nb = 256
    xs = jnp.asarray(rng.standard_normal((64, 2048 * nb)), jnp.float32)
    for name, eff in (("Freeverb", fv), ("FDN reverb", fdn),
                      ("feedback delay 250ms", dl)):
        # effects with their own multi-block driver (FDN: single
        # layout conversion + scalar-sweep damping) use it; the rest
        # the generic scan_blocks
        if hasattr(eff, "process_blocks"):
            f_s = jax.jit(functools.partial(eff.process_blocks,
                                            block_size=2048))
        else:
            f_s = jax.jit(functools.partial(scan_blocks, eff.process,
                                            block_size=2048))
        row(f"{name} streamed, 64ch x 2048 x {nb} blocks (one dispatch)",
            bench(f_s, eff.init_state((64,)), xs), 64 * 2048 * nb)
    # streamed modulation effects (round 5): the zero-delay-feedback
    # flank — phaser's affine scan is op-latency-bound (VPU combine
    # landed 34 -> 77 M, reduced 5-dim state 77 -> 137 M; chunked
    # variants don't cut op count)
    from algodsp_tpu.effects.modulation import AutoWah, Chorus, Phaser
    for name, eff in (("chorus", Chorus(sr, mix=0.4)),
                      ("phaser (4 stages)", Phaser(sr, stages=4)),
                      ("auto-wah", AutoWah(sr))):
        f_m = jax.jit(functools.partial(scan_blocks, eff.process,
                                        block_size=2048))
        row(f"{name} streamed, 64ch x 2048 x {nb} blocks (one dispatch)",
            bench(f_m, eff.init_state((64,)), xs), 64 * 2048 * nb)
    from algodsp_tpu.chain import Chain
    c4 = Chain(sr, block_size=2048)
    c4.load_graph(_json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "cho", "type": "chorus", "params": {"mix": 0.4}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.1, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "cho"},
            {"from": "cho", "to": "del"},
            {"from": "del", "to": "_output"},
        ]}))
    f_c4 = jax.jit(c4.process_blocks)
    row(f"config-4 chain streamed, 64ch x 2048 x {nb} blocks (one dispatch)",
        bench(f_c4, c4.init_state((64,)), xs), 64 * 2048 * nb)
    # streamed x sharded (round 5): the same chain under a channel-DP
    # mesh — 1 real chip = mesh of 1 (the shard_map lowering cost on
    # device); width exactness is carried by the 8-device CPU-mesh
    # tests (tests/test_parallel_streamed.py)
    from algodsp_tpu.parallel import make_mesh, scan_blocks_channel_sharded
    mesh_dp1 = make_mesh({"channel": 1})
    f_c4s = jax.jit(functools.partial(
        scan_blocks_channel_sharded, c4.process, mesh=mesh_dp1,
        block_size=2048))
    row(f"config-4 chain streamed + channel-DP shard_map (1-chip mesh), "
        f"64ch x 2048 x {nb}",
        bench(f_c4s, c4.init_state((64,)), xs), 64 * 2048 * nb)
    f_vs = jax.jit(functools.partial(scan_blocks, voc.process,
                                     block_size=2048))
    xvs = jnp.asarray(rng.standard_normal((8, 2048 * nb)), jnp.float32)
    cvs = jnp.asarray(rng.standard_normal((8, 2048 * nb)), jnp.float32)
    row(f"vocoder streamed, 8ch x 2048 x {nb} blocks (one dispatch)",
        bench(f_vs, voc.init_state((8,)), xvs, cvs), 8 * 2048 * nb)
    # width row (round 5). Documented wall: the two banded cascades'
    # zero-IC Toeplitz passes alone cost 2 x 32 bands x 2*128
    # FLOP/sample-channel (~8.4 ms of pure MXU at this shape, a ~1.0 G
    # ceiling); measured-and-rejected: combined analysis+synthesis
    # 64-band call (259 M), banded block sizes 64/256/512 (183/274/208).
    xv64 = jnp.asarray(rng.standard_normal((64, 2048 * nb)), jnp.float32)
    cv64 = jnp.asarray(rng.standard_normal((64, 2048 * nb)), jnp.float32)
    row(f"vocoder streamed, 64ch x 2048 x {nb} blocks (one dispatch)",
        bench(f_vs, voc.init_state((64,)), xv64, cv64), 64 * 2048 * nb)

    print(f"\nBackend: {jax.default_backend()}, devices: {jax.devices()}\n")
    print("| Benchmark | ms/call | Msamples/s | Notes |")
    print("|---|---:|---:|---|")
    for name, ms, msps, note in rows:
        print(f"| {name} | {ms:.2f} | {msps:.1f} | {note} |")


def roofline_main():
    """Per-hot-kernel roofline table (SURVEY §5.1 / BASELINE metric
    mandate): achieved FLOP/s and HBM bandwidth vs the v5e peaks, for
    the fused/blocked kernels that carry the framework's hot loops.

    FLOP counts are analytic (documented per row); bytes are the
    minimal HBM traffic model (operands read + results written once per
    logical pass; intermediates that XLA fuses are not charged). IIR
    scan kernels are *bandwidth*-bound by design — the roofline % that
    matters for them is the HBM column.
    """
    from algodsp_tpu.filters import BiquadChain, design
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    from algodsp_tpu.conv import PartitionedConvolver, fftconvolve
    from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
    from algodsp_tpu.ops.pallas_kernels import envelope_scan_dispatch
    from algodsp_tpu.utils.profiling import (
        measure_op, biquad_cascade_flops, fft_conv_flops)

    sr = 48000.0
    rng = np.random.default_rng(0)
    rows = []

    def row(name, m, note=""):
        rows.append((name, m, note))
        print(f"... {name}: {m.seconds*1e3:.2f} ms, "
              f"{(m.achieved_flops or 0)/1e12:.2f} TFLOP/s "
              f"({m.flops_roofline_pct or 0:.1f}% f32 peak), "
              f"{(m.achieved_gbps or 0)/1e9:.0f} GB/s "
              f"({m.bandwidth_roofline_pct or 0:.1f}% HBM)", file=sys.stderr)

    # 0. measured machine ceilings — what "peak" actually means in this
    #    environment. The nominal v5e table numbers (98 TFLOP/s f32,
    #    819 GB/s HBM) are NOT reachable by a HIGHEST-precision (6-pass
    #    bf16) matmul or a plain stream through the axon relay; these
    #    two anchors are the achievable rooflines the %-columns should
    #    be read against.
    # Each anchor iterates its op inside ONE dispatch (fori_loop with a
    # data dependence XLA cannot fuse away), so the 3-6 ms relay floor
    # is amortized out of the ceiling measurement.
    ITS = 16
    xa = jnp.asarray(rng.standard_normal((8, 1 << 24)), jnp.float32)
    fa = jax.jit(lambda a: jax.lax.fori_loop(
        0, ITS, lambda i, v: jnp.roll(v, 1, axis=-1), a))
    m = measure_op(fa, xa, reps=5, flops=0.0,
                   bytes_accessed=ITS * 2.0 * 4 * 8 * (1 << 24))
    row(f"ANCHOR stream ({ITS}x 537 MB f32 copy, one dispatch)", m,
        "achievable HBM ceiling for the %HBM column")
    bw_ceiling = m.achieved_gbps
    ba = jnp.asarray(rng.standard_normal((1 << 19, 256)), jnp.float32)
    Wa = jnp.asarray(np.linalg.qr(rng.standard_normal((256, 256)))[0],
                     jnp.float32)  # orthonormal: iterates stay finite
    fm = jax.jit(lambda a, b: jax.lax.fori_loop(
        0, ITS, lambda i, v: jnp.dot(
            v, b, precision=jax.lax.Precision.HIGHEST), a))
    m = measure_op(fm, ba, Wa, reps=5,
                   flops=ITS * 2.0 * (1 << 19) * 256 * 256,
                   bytes_accessed=ITS * 2.0 * 4 * (1 << 19) * 256)
    row(f"ANCHOR matmul ({ITS}x (2^19,256)@(256,256) HIGHEST)", m,
        "achievable f32-HIGHEST MXU ceiling for the %f32 column")
    flop_ceiling = m.achieved_flops

    # 1. folded biquad cascade (headline formulation, 8ch folded -> 128
    #    lanes). FLOPs: Toeplitz matmul, 2*B MACs/sample/section.
    #    Bytes: signal read+written once per section pass (f32).
    bq = BiquadChain(design.butterworth_lp(2000.0, 10, sr))
    aw = weighting_chain(WeightingType.A, sr)
    C, n = 8, 1 << 23
    x = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)
    f = jax.jit(lambda x: aw.process_folded(bq.process_folded(x)))
    secs = bq.num_runtime_sections + aw.num_runtime_sections
    m = measure_op(f, x, reps=5,
                   flops=2.0 * biquad_cascade_flops(C, n, secs),
                   bytes_accessed=2.0 * 4 * C * n * secs)
    row(f"folded biquad cascade ({secs} sections), 8ch x 2^23", m,
        "Toeplitz matmul 2B MACs/sample/section")

    # 2. wide biquad cascade (512 ch, lanes full without folding)
    C2 = 512
    x2 = jnp.asarray(rng.standard_normal((C2, 96000)), jnp.float32)
    f2 = jax.jit(bq.process)
    m = measure_op(f2, x2, reps=5,
                   flops=2.0 * biquad_cascade_flops(C2, 96000, 10),
                   bytes_accessed=2.0 * 4 * C2 * 96000 * 10)
    row("blocked biquad cascade (10 sections), 512ch x 96000", m,
        "MXU-bound regime")

    # 3. Pallas envelope follower kernel (1 mul + 2 add/sample => VPU;
    #    bytes: x read, env written)
    C3, n3 = 512, 1 << 18
    x3 = jnp.abs(jnp.asarray(rng.standard_normal((C3, n3)), jnp.float32))
    att = jnp.full((C3,), 0.01, jnp.float32)
    rel = jnp.full((C3,), 0.001, jnp.float32)
    f3 = jax.jit(lambda x: envelope_scan_dispatch(
        x, jnp.zeros((C3,), jnp.float32), att, rel))
    m = measure_op(f3, x3, reps=5, flops=4.0 * C3 * n3,
                   bytes_accessed=2.0 * 4 * C3 * n3)
    row("Pallas envelope scan, 512ch x 2^18", m,
        "sequential scan: latency-bound, not FLOP-bound")

    # 4. fused Pallas Moog ladder (classic: ~36 flops/sample incl tanh)
    mg = MoogFilter(sr, variant=MoogVariant.CLASSIC, cutoff_hz=2000.0,
                    resonance=0.5)
    C4, n4 = 128, 1 << 16
    x4 = jnp.asarray(rng.standard_normal((C4, n4)), jnp.float32)
    st4 = mg.init_state((C4,))
    f4 = jax.jit(lambda s, x: mg.process(s, x))
    m = measure_op(f4, st4, x4, reps=5, flops=36.0 * C4 * n4,
                   bytes_accessed=2.0 * 4 * C4 * n4)
    row("fused Pallas Moog ladder (classic), 128ch x 2^16", m,
        "5 tanh + 4 one-poles/sample in VMEM")

    # 5. FDL conv reverb bulk (FFT MACs on the MXU)
    ir = (rng.standard_normal(1 << 17)
          * np.exp(-np.arange(1 << 17) / 20000)).astype(np.float32)
    pc = PartitionedConvolver(ir, min_block_order=10)
    C5, n5 = 8, 1 << 23
    x5 = jnp.asarray(rng.standard_normal((C5, n5)), jnp.float32)
    f5 = jax.jit(pc.process)
    B = 1 << 13
    P = -(-(1 << 17) // B)
    fl = (fft_conv_flops(C5, n5, 2 * B)          # fwd+inv FFTs + mults
          + 8.0 * C5 * (n5 // B) * P * (B + 1))  # FDL MAC tail
    m = measure_op(f5, x5, reps=3, flops=fl,
                   bytes_accessed=4.0 * 4 * C5 * n5)
    row("FDL conv reverb 2^17-tap IR (bulk), 8ch x 2^23", m,
        "rfft batch + P-tap freq-domain FIR")

    # 6. one-shot fftconvolve (pure FFT roofline anchor)
    f6 = jax.jit(lambda x: fftconvolve(x, jnp.asarray(ir)))
    x6 = jnp.asarray(rng.standard_normal((64, 1 << 17)), jnp.float32)
    m = measure_op(f6, x6, reps=3,
                   flops=fft_conv_flops(64, 1 << 17, 1 << 18),
                   bytes_accessed=4.0 * 4 * 64 * (1 << 18))
    row("fftconvolve 2^17 x 2^17-tap, 64ch", m, "single big rfft pair")

    # 7. whole-cascade block engine (ops/cascade.py) — its ACTUAL op
    #    count: (B + 2d) MACs/sample + d^2 per block per kept sweep.
    #    The bulk one-shot path re-blocks to B=256
    #    (biquad.py:process_cascade), so model THOSE kernels.
    from algodsp_tpu.ops import cascade as cascmod
    sosc = np.concatenate([bq.runtime_sos, aw.runtime_sos])
    chain = BiquadChain(sosc, condition=False)
    Bc = 256
    dd = 2 * chain.num_runtime_sections + 2
    n7 = 1 << 24
    Kc = n7 // Bc
    nsw = len(cascmod._sweep_mats(
        np.ascontiguousarray(chain.runtime_sos).tobytes(),
        chain.num_runtime_sections, Bc, Kc))
    f7 = jax.jit(lambda x: chain.process(x, mode="cascade"))
    x7 = jnp.asarray(rng.standard_normal((C, n7)), jnp.float32)
    m = measure_op(f7, x7, reps=5,
                   flops=2.0 * C * (n7 * (Bc + 2 * dd) + Kc * dd * dd * nsw),
                   bytes_accessed=4.0 * 4 * C * n7)
    row(f"whole-cascade engine ({chain.num_runtime_sections} sections), "
        f"8ch x 2^24", m,
        f"one B=256 Toeplitz pass for all sections; {nsw} carry sweeps")

    # 8. fused Pallas FDL conv kernel — actual matmul op count
    from algodsp_tpu.ops import fdlconv
    Bf = 1 << 14
    Pf = -(-(1 << 17) // Bf)
    hg = fdlconv.kernel_spectra(ir, Bf)
    f8 = jax.jit(lambda x: fdlconv.fdl_conv_fused(x, hg, Bf))
    n1 = 2 * Bf // 128
    per_frame = (2 * (2 * n1) * n1 * 128      # fwd inner (stacked re/im)
                 + 4 * 2 * n1 * 128 * 128     # fwd outer (4 matmuls)
                 + 2 * 8 * n1 * 128 * Pf      # MAC (complex, P taps)
                 + 4 * 2 * n1 * 128 * 128     # inv inner
                 + 2 * 2 * (n1 // 2) * n1 * 128)  # inv outer (real half)
    m = measure_op(f8, x5, reps=5,
                   flops=float(per_frame) * C5 * (n5 // Bf),
                   bytes_accessed=3.0 * 4 * C5 * n5)
    row("fused Pallas FDL (matmul FFT+MAC+iFFT), 8ch x 2^23", m,
        "HIGHEST-precision MXU matmuls; spectra never leave VMEM")

    print(f"\nBackend: {jax.default_backend()}\n")
    print("| Kernel | ms | TFLOP/s | % f32 peak | % mach | GB/s | % HBM "
          "| % mach | Notes |")
    print("|---|---:|---:|---:|---:|---:|---:|---:|---|")
    for name, m, note in rows:
        pm_f = 100.0 * (m.achieved_flops or 0) / flop_ceiling
        pm_b = 100.0 * (m.achieved_gbps or 0) / bw_ceiling
        print(f"| {name} | {m.seconds*1e3:.2f} | "
              f"{(m.achieved_flops or 0)/1e12:.2f} | "
              f"{m.flops_roofline_pct or 0:.1f} | {pm_f:.0f} | "
              f"{(m.achieved_gbps or 0)/1e9:.0f} | "
              f"{m.bandwidth_roofline_pct or 0:.1f} | {pm_b:.0f} | {note} |")
    print("\n'% mach' columns: same numerators divided by the measured "
          "ANCHOR ceilings above (the nominal-peak columns keep the "
          "BASELINE.json definition).")


if __name__ == "__main__":
    if "--roofline" in sys.argv:
        roofline_main()
    else:
        main()
