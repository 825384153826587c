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
  * IIR-shelf dither noise shaping sanity

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

    print()
    if FAILURES:
        print(f"{len(FAILURES)} smoke check(s) FAILED: {FAILURES}")
        sys.exit(1)
    print("all TPU smoke checks passed")


if __name__ == "__main__":
    main()
