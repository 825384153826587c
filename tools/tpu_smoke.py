"""On-TPU smoke validation: drive the real device end-to-end.

The pytest suite runs on the CPU backend (tests/conftest.py) where
float64 oracles can assert tight bounds; this tool is the complement —
it runs a curated set of engine-vs-oracle checks ON THE ATTACHED TPU
(f32, jitted, real Pallas kernels, real XLA:TPU lowering), so backend-
specific lowering bugs can't hide behind the CPU suite. The analog of
running the reference's test binary on the deployment target.

Checks (each prints measured SNR vs an independent oracle):
  * biquad cascade, whole-cascade engine, folded path vs C++ golden
  * fused Pallas envelope + Moog ladder vs C++ goldens
  * partitioned FDL conv (incl. fused kernel) vs f64 FFT conv
  * compressor ballistics vs C++ golden
  * resampler, Freeverb, FDN, Hilbert, WSOLA, vocoder vs C++ goldens
  * feedback delay ring tier vs C++-free per-sample recurrence
  * IIR-shelf dither noise shaping sanity + exact code match on device
  * streamed scan_blocks drivers (Freeverb / FDN process_blocks /
    delay / config-4 chain) vs block-at-a-time state carry
  * ALGODSP_FDL_PRECISION=fast bf16x3 SNR floor (>= 100 dB)
  * sharded-wrapper lowerings on a 1-chip mesh (conv / compressor /
    streaming-conv time-SP, channel-DP scan_blocks)
  * round-5 oracle families: lookahead, de-esser, multiband, transient,
    tremolo, ring-mod, frequency shifter, widener, bitcrusher,
    transformer, gate hold, Chebyshev distortion, harmonic bass,
    feedback delay

Exit code 0 iff every check clears its threshold. Thresholds are f32
expectations (90-150 dB depending on the path), far above audibility
and chosen from measured margins; a lowering regression shows up as a
catastrophic drop, not a dB or two.

Run: make smoke-tpu   (or python tools/tpu_smoke.py)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

FAILURES = []


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    denom = (err ** 2).sum()
    if denom == 0:
        return np.inf
    return 10.0 * np.log10((ref ** 2).sum() / denom)


def check(name, snr, threshold):
    ok = snr >= threshold
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {snr:7.1f} dB "
          f"(need >= {threshold})")
    if not ok:
        FAILURES.append(name)


def main():
    from algodsp_tpu import native
    from algodsp_tpu.filters import BiquadChain, design
    from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
    from algodsp_tpu.filters.hilbert import HilbertTransformer
    from algodsp_tpu.effects.dynamics.core import (DetectorMode,
                                                   DynamicsConfig,
                                                   DynamicsCore)
    from algodsp_tpu.effects.reverb import FDNReverb, Freeverb
    from algodsp_tpu.effects.delay_effect import Delay
    from algodsp_tpu.effects.pitch import WSOLAPitchShifter
    from algodsp_tpu.effects.vocoder import Vocoder
    from algodsp_tpu.conv import PartitionedConvolver
    from algodsp_tpu.resample import Resampler
    from algodsp_tpu.ops.envscan import envelope_scan
    from algodsp_tpu.dither import DitherType, Quantizer

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend != "tpu":
        print("WARNING: no TPU attached — smoke runs on", backend)
    if not native.available():
        print("FAIL  native golden library not built (make -C native)")
        sys.exit(1)
    rng = np.random.default_rng(0)
    sr = 48000.0

    # biquad cascade (auto dispatch) vs C++ DF2T golden
    sos = design.butterworth_lp(2000.0, 10, sr)
    chain = BiquadChain(sos)
    x = rng.standard_normal((8, 48000)).astype(np.float32)
    y = np.asarray(jax.jit(chain.process)(jnp.asarray(x)))
    g = np.stack([native.biquad_df2t(chain.runtime_sos,
                                     np.zeros((chain.num_runtime_sections, 2)),
                                     x[c])[1] for c in range(8)])
    check("biquad cascade (auto)", snr_db(g, y), 110)
    yc = np.asarray(jax.jit(
        lambda v: chain.process(v, mode="cascade"))(jnp.asarray(x)))
    check("whole-cascade engine", snr_db(g, yc), 100)

    # fused Pallas envelope kernel vs C++ golden
    xe = np.abs(rng.standard_normal((128, 1 << 14))).astype(np.float32)
    ef, traj = jax.jit(lambda v: envelope_scan(
        v, jnp.zeros((128,), jnp.float32), 0.05, 0.002))(jnp.asarray(xe))
    ge = np.stack([native.envelope(xe[c], 0.05, 0.002)[1]
                   for c in range(128)])
    check("Pallas envelope kernel", snr_db(ge, np.asarray(traj)), 120)

    # fused Pallas Moog (classic + zdf) vs C++ golden
    for variant in (MoogVariant.CLASSIC, MoogVariant.ZDF):
        mf = MoogFilter(sr, variant=variant, cutoff_hz=1500.0, resonance=2.5)
        xm = (rng.standard_normal((128, 1 << 13)) * 0.4).astype(np.float32)
        st = mf.init_state((128,))
        _, ym = jax.jit(mf.process)(st, jnp.asarray(xm))
        gm = np.stack([native.moog(mf, np.zeros(8), xm[c])[1]
                       for c in range(4)])
        check(f"Moog ladder ({variant.value})",
              snr_db(gm, np.asarray(ym)[:4]), 70)

    # partitioned FDL conv vs f64 direct FFT conv
    ir = (rng.standard_normal(1 << 15)
          * np.exp(-np.arange(1 << 15) / 4000.0)).astype(np.float32)
    pc = PartitionedConvolver(ir, min_block_order=10)
    xc = rng.standard_normal((8, 1 << 16)).astype(np.float32)
    yconv = np.asarray(jax.jit(pc.process)(jnp.asarray(xc)))
    ref = np.stack([np.convolve(xc[c].astype(np.float64),
                                ir.astype(np.float64))[:1 << 16]
                    for c in range(2)])
    check("partitioned FDL conv", snr_db(ref, yconv[:2]), 110)

    # compressor ballistics vs C++ golden
    core = DynamicsCore(DynamicsConfig(
        sample_rate=sr, detector_mode=DetectorMode.RMS, rms_window_ms=5.0,
        sidechain_low_cut_hz=100.0, threshold_db=-18.0, ratio=4.0))
    xd = (rng.standard_normal(1 << 14) * 0.5).astype(np.float32)
    st = core.init_state(())
    _, yd, _ = jax.jit(core.process)(st, jnp.asarray(xd))
    _, gd, _ = native.dynamics_feedforward(core, xd)
    check("compressor ballistics", snr_db(gd, np.asarray(yd)), 90)

    # resampler vs C++ polyphase golden
    rs = Resampler(147, 160)
    xr = rng.standard_normal(48000).astype(np.float32)
    yr = np.asarray(jax.jit(rs.process)(jnp.asarray(xr)))
    _, gr = native.resample_polyphase(rs, xr)
    check("polyphase resampler 147:160", snr_db(gr, yr), 110)

    # reverbs vs C++ goldens
    fv = Freeverb()
    st = fv.init_state()
    _, yf = jax.jit(fv.process)(st, jnp.asarray(xd))
    _, _, gf = native.freeverb(fv, xd)
    check("Freeverb blocked engine", snr_db(gf, np.asarray(yf)), 110)
    rv = FDNReverb(sr)
    st = rv.init_state()
    _, yn = jax.jit(rv.process)(st, jnp.asarray(xd))
    _, _, gn = native.fdn(rv, xd)
    check("FDN blocked engine", snr_db(gn, np.asarray(yn)), 90)

    # feedback delay ring tier vs per-sample recurrence (pure NumPy)
    dl = Delay(sr, delay_seconds=0.25, feedback=0.5, mix=0.5)
    st = dl.init_state((2,))
    x2 = (rng.standard_normal((2, 48000)) * 0.3).astype(np.float32)
    _, ydel = jax.jit(dl.process)(st, jnp.asarray(x2))
    L, d = dl.buf_len, dl.delay_samples
    buf = np.zeros((2, L)); exp = np.empty((2, 48000))
    for i in range(48000):
        delayed = buf[:, (i - d) % L]
        buf[:, i % L] = x2[:, i] + delayed * 0.5
        exp[:, i] = x2[:, i] * 0.5 + delayed * 0.5
    check("feedback delay ring tier", snr_db(exp, np.asarray(ydel)), 120)

    # Hilbert / WSOLA / vocoder vs C++ goldens
    ht = HilbertTransformer(8, 0.03)
    xh = rng.standard_normal(8192).astype(np.float32)
    a, b = jax.jit(ht.process)(jnp.asarray(xh))
    _, ga, gb = native.hilbert(ht, xh)
    check("Hilbert polyphase (a)", snr_db(ga, np.asarray(a)), 110)
    check("Hilbert polyphase (b)", snr_db(gb, np.asarray(b)), 110)

    # phaser: guards the affine_scan_nd HIGHEST-precision contract —
    # with default (bf16) einsum lowering this collapses to ~34 dB
    from algodsp_tpu.effects.modulation import Flanger, Phaser
    ph = Phaser(sr, stages=4)
    xp = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    st = ph.init_state(())
    _, yp = jax.jit(ph.process)(st, jnp.asarray(xp))
    _, gp = native.phaser(ph, xp)
    check("phaser affine-scan", snr_db(gp, np.asarray(yp)), 100)
    fl = Flanger(sr)
    st = fl.init_state(())
    _, yfl = jax.jit(fl.process)(st, jnp.asarray(xp))
    _, gfl = native.flanger(fl, xp)
    check("flanger blocked slices", snr_db(gfl, np.asarray(yfl)), 80)
    from algodsp_tpu.effects.modulation import Chorus
    chs = Chorus(sr)
    st = chs.init_state(())
    _, ych = jax.jit(chs.process)(st, jnp.asarray(xp))
    _, gch = native.chorus(chs, xp)
    check("chorus walking-read", snr_db(gch, np.asarray(ych)), 70)

    ws = WSOLAPitchShifter(sr, pitch_ratio=2 ** (3 / 12))
    xw = np.convolve(rng.standard_normal(1 << 15), np.ones(8) / 8,
                     mode="same").astype(np.float32).reshape(1, -1)
    yw = np.asarray(jax.jit(ws.process)(jnp.asarray(xw)))
    gw = native.wsola(ws, xw)
    check("WSOLA pitch shift", snr_db(gw, yw), 90)

    voc = Vocoder(sr)
    mo = (rng.standard_normal(8192) * 0.5).astype(np.float32)
    ca = (rng.standard_normal(8192) * 0.5).astype(np.float32)
    st = voc.init_state(())
    _, yv = jax.jit(voc.process)(st, jnp.asarray(mo), jnp.asarray(ca))
    _, gv = native.vocoder(voc, mo, ca)
    check("vocoder (ISO bands)", snr_db(gv, np.asarray(yv)), 110)

    # IIR-shelf dither: shaped noise sits above flat TPDF in the lows
    xq = rng.uniform(-0.5, 0.5, (1, 1 << 15)).astype(np.float32)
    q1 = Quantizer(sr, bit_depth=8, iir_shelf_freq=4000.0, seed=3)
    q0 = Quantizer(sr, bit_depth=8, dither_type=DitherType.TRIANGULAR,
                   seed=3, shaper_coeffs=[])
    _, y1 = jax.jit(q1.process)(q1.init_state((1,)), jnp.asarray(xq))
    _, y0 = jax.jit(q0.process)(q0.init_state((1,)), jnp.asarray(xq))
    f = np.fft.rfftfreq(1 << 15, 1 / sr)
    low = (f > 100) & (f < 2000)
    p1 = (np.abs(np.fft.rfft(np.asarray(y1) - xq)) ** 2)[0][low].mean()
    p0 = (np.abs(np.fft.rfft(np.asarray(y0) - xq)) ** 2)[0][low].mean()
    ok = p1 < 0.8 * p0
    print(f"{'PASS' if ok else 'FAIL'}  IIR-shelf dither low-band "
          f"suppression: {10 * np.log10(p1 / p0):.1f} dB vs flat")
    if not ok:
        FAILURES.append("iir-shelf dither")

    # ------------------------------------------------------------------
    # round-5 surfaces: streamed scan_blocks drivers, FDL fast mode,
    # sharded-wrapper lowerings, new oracle families
    # ------------------------------------------------------------------
    import functools
    from algodsp_tpu.streaming import scan_blocks

    # streamed drivers: many blocks per dispatch must carry state
    # bit-compatibly with block-at-a-time on THIS device (the scan
    # carry is where a device-only lowering bug would hide)
    def blockwise(process, state, *sigs, bs):
        outs = []
        f = jax.jit(process)
        for b in range(sigs[0].shape[-1] // bs):
            state, yb = f(state, *[s[..., b * bs:(b + 1) * bs]
                                   for s in sigs])
            outs.append(np.asarray(yb))
        return np.concatenate(outs, axis=-1)

    xs8 = (rng.standard_normal((8, 2048 * 8)) * 0.3).astype(np.float32)
    fv2 = Freeverb()
    y_st = np.asarray(jax.jit(functools.partial(
        scan_blocks, fv2.process, block_size=2048))(
            fv2.init_state((8,)), jnp.asarray(xs8))[1])
    y_bw = blockwise(fv2.process, fv2.init_state((8,)), jnp.asarray(xs8),
                     bs=2048)
    check("streamed Freeverb scan_blocks", snr_db(y_bw, y_st), 120)

    rv2 = FDNReverb(sr)
    y_st = np.asarray(jax.jit(functools.partial(
        rv2.process_blocks, block_size=2048))(
            rv2.init_state((8,)), jnp.asarray(xs8))[1])
    y_bw = blockwise(rv2.process, rv2.init_state((8,)), jnp.asarray(xs8),
                     bs=2048)
    check("streamed FDN process_blocks", snr_db(y_bw, y_st), 100)

    dl2 = Delay(sr, delay_seconds=0.05, feedback=0.4, mix=0.4)
    y_st = np.asarray(jax.jit(functools.partial(
        scan_blocks, dl2.process, block_size=2048))(
            dl2.init_state((8,)), jnp.asarray(xs8))[1])
    y_bw = blockwise(dl2.process, dl2.init_state((8,)), jnp.asarray(xs8),
                     bs=2048)
    check("streamed delay scan_blocks", snr_db(y_bw, y_st), 120)

    import json as _json
    from algodsp_tpu.chain import Chain
    c4 = Chain(sr, block_size=2048)
    c4.load_graph(_json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.05, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"}, {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "del"}, {"from": "del", "to": "_output"},
        ]}))
    y_st = np.asarray(jax.jit(c4.process_blocks)(
        c4.init_state((8,)), jnp.asarray(xs8))[1])
    y_bw = blockwise(c4.process, c4.init_state((8,)), jnp.asarray(xs8),
                     bs=2048)
    check("streamed config-4 chain", snr_db(y_bw, y_st), 120)

    # IIR-shelf dither scan vs the C++ golden on identical noise —
    # integer codes must agree exactly on device
    qz = Quantizer(sr, bit_depth=12, iir_shelf_freq=8000.0, seed=7)
    xq2 = np.clip(rng.standard_normal(1 << 14) * 0.3, -1, 1).astype(np.float32)
    stq = qz.init_state((), jnp.float32)
    key, sub = jax.random.split(stq["key"])
    noise = np.asarray(qz._noise(sub, (1 << 14,), jnp.float32))
    _, codes = jax.jit(qz.process_integer)(stq, jnp.asarray(xq2))
    _, gq = native.quantize(qz, xq2.astype(np.float64), noise)
    diff = np.asarray(codes, np.float64) - gq
    exact = int(np.sum(diff != 0))
    # f32 engine vs f64 oracle: floor() decisions within one ulp of an
    # integer may flip (~0.03% observed); a lowering bug shows up as
    # mass mismatches or multi-code jumps, not isolated +-1 flips
    okq = exact <= (1 << 14) // 200 and np.max(np.abs(diff)) <= 1.0
    print(f"{'PASS' if okq else 'FAIL'}  IIR-shelf dither codes on device: "
          f"{exact} / {1 << 14} knife-edge flips (all +-1: "
          f"{np.max(np.abs(diff)) <= 1.0})")
    if not okq:
        FAILURES.append("iir-shelf dither codes")

    # ALGODSP_FDL_PRECISION=fast (bf16x3) SNR floor
    prev = os.environ.get("ALGODSP_FDL_PRECISION")
    os.environ["ALGODSP_FDL_PRECISION"] = "fast"
    try:
        pcf = PartitionedConvolver(ir, min_block_order=10)
        yfast = np.asarray(jax.jit(pcf.process)(jnp.asarray(xc)))
    finally:
        if prev is None:
            os.environ.pop("ALGODSP_FDL_PRECISION", None)
        else:
            os.environ["ALGODSP_FDL_PRECISION"] = prev
    check("FDL fast (bf16x3) SNR floor", snr_db(ref, yfast[:2]), 100)

    # sharded-wrapper lowerings on a 1-chip mesh (the shard_map code
    # path itself; width is carried by the CPU-mesh pytest suite)
    from algodsp_tpu.parallel import (
        make_mesh, conv_time_sharded, compressor_time_sharded,
        scan_blocks_channel_sharded, StreamingConvTimeSharded)
    from algodsp_tpu.effects.dynamics import Compressor
    mesh1 = make_mesh({"channel": 1, "time": 1})
    kern = (rng.standard_normal(700)
            * np.exp(-np.arange(700) / 150.0)).astype(np.float32)
    xsh = rng.standard_normal((4, 8192)).astype(np.float32)
    ysh = np.asarray(jax.jit(functools.partial(
        conv_time_sharded, kernel=kern, mesh=mesh1))(jnp.asarray(xsh)))
    refc = np.stack([np.convolve(xsh[c].astype(np.float64),
                                 kern.astype(np.float64))[:8192]
                     for c in range(4)])
    check("conv_time_sharded lowering", snr_db(refc, ysh), 110)

    comp = Compressor(sr, threshold_db=-18.0, ratio=3.0)
    stc = comp.init_state((4,))
    _, ycs = jax.jit(functools.partial(
        compressor_time_sharded, comp, mesh=mesh1))(stc, jnp.asarray(xsh))
    _, ycr = jax.jit(comp.process)(comp.init_state((4,)), jnp.asarray(xsh))
    check("compressor_time_sharded lowering",
          snr_db(np.asarray(ycr), np.asarray(ycs)), 120)

    sconv = StreamingConvTimeSharded(kern, mesh1)
    _, ysc = jax.jit(functools.partial(sconv.stream, block_size=2048))(
        sconv.init_state((4,)), jnp.asarray(xsh))
    check("StreamingConvTimeSharded lowering", snr_db(refc, np.asarray(ysc)),
          110)

    mesh_c1 = make_mesh({"channel": 1})
    _, ysb = jax.jit(functools.partial(
        scan_blocks_channel_sharded, fv2.process, mesh=mesh_c1,
        block_size=2048))(fv2.init_state((8,)), jnp.asarray(xs8))
    y_ref_sb = np.asarray(jax.jit(functools.partial(
        scan_blocks, fv2.process, block_size=2048))(
            fv2.init_state((8,)), jnp.asarray(xs8))[1])
    check("scan_blocks_channel_sharded lowering",
          snr_db(y_ref_sb, np.asarray(ysb)), 120)

    # round-5 oracle families on device
    from algodsp_tpu.effects.dynamics import (DeEsser, LookaheadLimiter,
                                              MultibandCompressor,
                                              TransientShaper)
    from algodsp_tpu.effects.modulation import (FrequencyShifter,
                                                RingModulator, Tremolo)
    from algodsp_tpu.effects.spatial import StereoWidener
    from algodsp_tpu.effects.waveshape import (BitCrusher,
                                               TransformerSimulation)

    xg = (rng.standard_normal(8192) * 0.5).astype(np.float32)
    ll = LookaheadLimiter(sr, lookahead_ms=3.0, threshold_db=-6.0)
    _, yg = jax.jit(ll.process)(ll.init_state(()), jnp.asarray(xg * 3))
    _, gg = native.lookahead(ll, (xg * 3).astype(np.float64))
    check("lookahead limiter", snr_db(gg, np.asarray(yg)), 90)

    de = DeEsser(sr, threshold_db=-30.0)
    _, yg = jax.jit(de.process)(de.init_state(()), jnp.asarray(xg))
    _, gg = native.deesser(de, xg.astype(np.float64))
    check("de-esser", snr_db(gg, np.asarray(yg)), 90)

    mb = MultibandCompressor([250.0, 3000.0], 4, sr)
    _, yg = jax.jit(mb.process)(mb.init_state(()), jnp.asarray(xg))
    _, gg = native.multiband(mb, xg.astype(np.float64))
    check("multiband compressor", snr_db(gg, np.asarray(yg)), 90)

    ts = TransientShaper(sr, attack_amount=0.6, sustain_amount=-0.4)
    _, yg = jax.jit(ts.process)(ts.init_state(()), jnp.asarray(xg))
    _, gg = native.transient(ts, xg.astype(np.float64))
    check("transient shaper", snr_db(gg, np.asarray(yg)), 100)

    tr = Tremolo(sr, rate_hz=6.5, depth=0.8, smoothing_ms=3.0)
    _, yg = jax.jit(tr.process)(tr.init_state(()), jnp.asarray(xg))
    _, gg = native.tremolo(tr, xg.astype(np.float64))
    check("tremolo", snr_db(gg, np.asarray(yg)), 100)

    rm = RingModulator(sr, carrier_hz=317.0)
    _, yg = jax.jit(rm.process)(rm.init_state(()), jnp.asarray(xg))
    _, gg = native.ringmod(rm, xg.astype(np.float64))
    check("ring modulator", snr_db(gg, np.asarray(yg)), 100)

    fs = FrequencyShifter(sr, shift_hz=150.0)
    _, (up, down) = jax.jit(fs.process)(fs.init_state(()), jnp.asarray(xg))
    _, gup, gdn = native.freqshift(fs, xg.astype(np.float64))
    check("frequency shifter (up)", snr_db(gup, np.asarray(up)), 90)

    wd = StereoWidener(sr, width=1.8, bass_mono_hz=200.0)
    x2w = rng.standard_normal((2, 8192)).astype(np.float32)
    _, yg = jax.jit(wd.process)(wd.init_state(()), jnp.asarray(x2w))
    _, gg = native.widener(wd, x2w.astype(np.float64))
    check("stereo widener", snr_db(gg, np.asarray(yg)), 100)

    bc = BitCrusher(sr, bit_depth=8.3, downsample=5, mix=0.75)
    _, yg = jax.jit(bc.process)(bc.init_state(()), jnp.asarray(xg))
    _, gg = native.bitcrusher(bc, xg.astype(np.float64))
    check("bit crusher", snr_db(gg, np.asarray(yg)), 100)

    tf = TransformerSimulation(sr, drive=2.0, mix=0.8)
    _, yg = jax.jit(tf.process)(tf.init_state(()), jnp.asarray(xg))
    _, gg = native.transformer(tf, xg.astype(np.float64))
    check("transformer simulation (4x OS)", snr_db(gg, np.asarray(yg)), 80)

    from algodsp_tpu.effects.dynamics import Gate
    from algodsp_tpu.effects.waveshape import (Distortion, DistortionMode,
                                               HarmonicBass)
    gt = Gate(sr, threshold_db=-30.0, hold_ms=4.0)
    xgt = xg * np.concatenate([np.full(4096, 1.0), np.full(4096, 0.01)]
                              ).astype(np.float32)
    _, yg = jax.jit(gt.process)(gt.init_state(()), jnp.asarray(xgt))
    _, gg, _ = native.gate_hold(gt, xgt.astype(np.float64))
    check("gate hold timer", snr_db(gg + 1e-30, np.asarray(yg) + 1e-30), 90)

    dst = Distortion(mode=DistortionMode.CHEBYSHEV, chebyshev_order=5,
                     chebyshev_weights=[0.5, 0, 0.3, 0, 0.2], drive=1.5)
    _, yg = jax.jit(dst.process)(dst.init_state(()), jnp.asarray(xg))
    _, gg = native.distortion(dst, xg.astype(np.float64))
    check("distortion (Chebyshev + DC bypass)", snr_db(gg, np.asarray(yg)),
          90)

    hb = HarmonicBass(sr, harmonic_bass_gain=0.8)
    _, yg = jax.jit(hb.process)(hb.init_state(()), jnp.asarray(xg))
    _, gg = native.harmonic_bass(hb, xg.astype(np.float64))
    check("harmonic bass exciter", snr_db(gg, np.asarray(yg)), 90)

    dl5 = Delay(sr, delay_seconds=0.02, feedback=0.5, mix=0.5,
                smooth_ms=5.0)
    _, yg = jax.jit(dl5.process)(dl5.init_state(()), jnp.asarray(xg))
    _, gg = native.delay_effect(dl5, xg.astype(np.float64))
    check("feedback delay vs C++ golden", snr_db(gg, np.asarray(yg)), 100)

    print()
    if FAILURES:
        print(f"{len(FAILURES)} smoke check(s) FAILED: {FAILURES}")
        sys.exit(1)
    print("all TPU smoke checks passed")


if __name__ == "__main__":
    main()
