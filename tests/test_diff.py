"""Differentiability tests: custom VJPs on the kernel ops and the
traced-coefficient design module.

The reference has no autodiff story at all; gradient support is a
TPU/JAX-native capability on top of reference parity. The contracts
asserted here:

  * `ops.envscan.envelope_scan` carries a custom VJP (so the Pallas
    forward is differentiable too); it must match jax.grad of the plain
    lax.scan formulation exactly (same a.e. branch selections).
  * The fused Pallas biquad cascade and FDL convolution are linear in
    the signal; their VJPs are exact adjoint filters (flip-filter-flip)
    and must match autodiff of the XLA formulations.
  * `algodsp_tpu.diff` designers/filters are differentiable w.r.t.
    design parameters and agree with the host (NumPy f64) designers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import snr_db


def _env_scan_plain(targets, env0, attack, release):
    xs = jnp.moveaxis(targets, -1, 0)
    e0 = jnp.broadcast_to(env0, targets.shape[:-1])

    def step(env, t):
        coeff = jnp.where(t > env, attack, release)
        env = env + coeff * (t - env)
        return env, env

    env_final, ys = jax.lax.scan(step, e0, xs)
    return env_final, jnp.moveaxis(ys, 0, -1)


class TestEnvelopeVJP:
    def test_matches_autodiff_of_scan(self, rng):
        from algodsp_tpu.ops.envscan import envelope_scan
        t = jnp.asarray(rng.standard_normal((3, 64)) ** 2)
        e0 = jnp.asarray(rng.random(3) * 0.1)
        att, rel = jnp.asarray(0.31), jnp.asarray(0.045)
        w = jnp.asarray(rng.standard_normal((3, 64)))
        v = jnp.asarray(rng.standard_normal(3))

        def loss_custom(t, e0, a, r):
            envf, traj = envelope_scan(t, e0, a, r)
            return jnp.sum(traj * w) + jnp.sum(envf * v)

        def loss_plain(t, e0, a, r):
            envf, traj = _env_scan_plain(t, e0, a, r)
            return jnp.sum(traj * w) + jnp.sum(envf * v)

        g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(t, e0, att, rel)
        g_p = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(t, e0, att, rel)
        for gc, gp in zip(g_c, g_p):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gp),
                                       rtol=1e-12, atol=1e-12)

    def test_per_channel_ballistics_and_broadcast_env0(self, rng):
        from algodsp_tpu.ops.envscan import envelope_scan
        t = jnp.asarray(rng.standard_normal((4, 48)) ** 2)
        e0 = jnp.asarray(0.05)                      # scalar, broadcast
        att = jnp.asarray(rng.random(4) * 0.5)      # per-channel
        rel = jnp.asarray(rng.random(4) * 0.1)

        def loss_custom(t, e0, a, r):
            envf, traj = envelope_scan(t, e0, a, r)
            return jnp.sum(traj ** 2) + jnp.sum(envf)

        def loss_plain(t, e0, a, r):
            envf, traj = _env_scan_plain(t, e0, a, r)
            return jnp.sum(traj ** 2) + jnp.sum(envf)

        g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(t, e0, att, rel)
        g_p = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(t, e0, att, rel)
        for gc, gp in zip(g_c, g_p):
            assert gc.shape == gp.shape
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gp),
                                       rtol=1e-12, atol=1e-12)

    def test_finite_difference(self, rng):
        from algodsp_tpu.ops.envscan import envelope_scan
        t = jnp.asarray(rng.standard_normal((2, 24)) ** 2 + 0.5)
        e0 = jnp.asarray(rng.random(2))
        att, rel = jnp.asarray(0.4), jnp.asarray(0.07)

        def loss(att):
            _, traj = envelope_scan(t, e0, att, rel)
            return jnp.sum(jnp.sin(traj))

        g = float(jax.grad(loss)(att))
        eps = 1e-6
        fd = (float(loss(att + eps)) - float(loss(att - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)

    def test_compressor_grad_finite_difference(self, rng):
        """The compressor loss gradient w.r.t. a scalar input gain
        matches central finite differences (checks the whole chain:
        sidechain detector -> envelope custom VJP -> gain computer)."""
        from algodsp_tpu.effects.dynamics import Compressor
        comp = Compressor(48000.0, threshold_db=-12.0, ratio=3.0)
        x = jnp.asarray(rng.standard_normal((2, 200)) * 0.8)
        state = comp.init_state((2,))

        def loss(gain):
            _, y = comp.process(state, gain * x)
            return jnp.mean(y ** 2)

        g = float(jax.grad(loss)(jnp.asarray(1.0)))
        eps = 1e-6
        fd = (float(loss(jnp.asarray(1.0 + eps)))
              - float(loss(jnp.asarray(1.0 - eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)

    def test_compressor_is_differentiable(self, rng):
        """Gradient flows end-to-end through a real dynamics processor."""
        from algodsp_tpu.effects.dynamics import Compressor
        sr = 48000.0
        comp = Compressor(sr, threshold_db=-20.0, ratio=4.0)
        x = jnp.asarray(rng.standard_normal((2, 256)) * 0.5)
        state = comp.init_state((2,))

        def loss(x):
            _, y = comp.process(state, x)
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(x)
        assert g.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0


class TestCascadeVJP:
    def test_adjoint_identity(self, rng):
        """<cascade(x), g> == <x, vjp(g)> — the exact adjoint-filter
        rule on the fused Pallas cascade (interpret mode on CPU)."""
        from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas
        from algodsp_tpu.filters import design
        sos = design.butterworth_lp(2000.0, 4, 48000.0)
        x = jnp.asarray(rng.standard_normal((2, 300)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 300)), jnp.float32)
        y, vjp = jax.vjp(lambda v: biquad_cascade_pallas(v, sos, gain=0.7), x)
        (dx,) = vjp(g)
        lhs = float(jnp.vdot(y, g))
        rhs = float(jnp.vdot(x, dx))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_matches_xla_engine_grad(self, rng):
        """Gradient through the Pallas cascade == gradient through the
        (autodiff-able) XLA blocked engine for the same filter."""
        from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas
        from algodsp_tpu.filters import BiquadChain, design
        sos = design.butterworth_lp(4000.0, 2, 48000.0)
        chain = BiquadChain(sos)
        x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)

        g_pallas = jax.grad(
            lambda v: jnp.sum(biquad_cascade_pallas(v, sos) * w))(x)
        g_xla = jax.grad(
            lambda v: jnp.sum(chain.process(v, mode="blocked") * w))(x)
        assert snr_db(np.asarray(g_xla), np.asarray(g_pallas)) > 100.0


class TestFDLVJP:
    def test_adjoint_identity_signal(self, rng):
        from algodsp_tpu.ops import fdlconv
        B = 1024
        h = (rng.standard_normal(2 * B)
             * np.exp(-np.arange(2 * B) / 700.0)).astype(np.float32)
        hg = fdlconv.kernel_spectra(h, B)
        x = jnp.asarray(rng.standard_normal((2, 2 * B)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 2 * B)), jnp.float32)
        y, vjp = jax.vjp(lambda v: fdlconv.fdl_conv_fused(v, hg, B), x)
        (dx,) = vjp(g)
        np.testing.assert_allclose(float(jnp.vdot(y, g)),
                                   float(jnp.vdot(x, dx)), rtol=1e-3)

    def test_learnable_kernel_gradient(self, rng):
        """d loss / d h through kernel_spectra_jax + the fused FDL
        matches the gradient of an XLA direct-convolution formulation
        of the same loss: IRs are learnable through the Pallas path."""
        from algodsp_tpu.ops import fdlconv
        B = 1024
        N = 2 * B
        P = 2
        h0 = jnp.asarray(
            rng.standard_normal(P * B) * np.exp(-np.arange(P * B) / 500.0),
            jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
        target = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)

        def loss_fused(h):
            hg = fdlconv.kernel_spectra_jax(h, B, P)
            y = fdlconv.fdl_conv_fused(x, hg, B)
            return jnp.mean((y - target) ** 2)

        def loss_ref(h):
            xf = jnp.fft.rfft(x, 2 * P * B)
            hf = jnp.fft.rfft(h, 2 * P * B)
            y = jnp.fft.irfft(xf * hf, 2 * P * B)[..., :N]
            return jnp.mean((y.astype(jnp.float32) - target) ** 2)

        g_fused = np.asarray(jax.grad(loss_fused)(h0))
        g_ref = np.asarray(jax.grad(loss_ref)(h0.astype(jnp.float64)))
        assert snr_db(g_ref, g_fused) > 80.0

    def test_kernel_longer_than_signal_gradient(self, rng):
        """IR-learning on an excerpt shorter than the IR (P > F+1):
        the spectra adjoint must skip unrealizable lags p >= F (their
        true gradient is zero — those partitions never see the signal)
        instead of crashing on empty-slice broadcasting."""
        from algodsp_tpu.ops import fdlconv
        B = 1024
        F = 3
        N = F * B
        P = 5
        h0 = jnp.asarray(
            rng.standard_normal(P * B) * np.exp(-np.arange(P * B) / 800.0),
            jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
        target = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)

        def loss_fused(h):
            hg = fdlconv.kernel_spectra_jax(h, B, P)
            y = fdlconv.fdl_conv_fused(x, hg, B)
            return jnp.mean((y - target) ** 2)

        def loss_ref(h):
            xf = jnp.fft.rfft(x, 2 * P * B)
            hf = jnp.fft.rfft(h, 2 * P * B)
            y = jnp.fft.irfft(xf * hf, 2 * P * B)[..., :N]
            return jnp.mean((y.astype(jnp.float32) - target) ** 2)

        g_fused = np.asarray(jax.grad(loss_fused)(h0))  # must not raise
        g_ref = np.asarray(jax.grad(loss_ref)(h0.astype(jnp.float64)))
        assert snr_db(g_ref, g_fused) > 80.0
        # taps at t >= N start past the last retained output sample, so
        # their gradient is exactly zero (partitions p >= F zero-filled)
        assert np.all(g_fused[F * B:] == 0.0)


class TestDiffModule:
    """algodsp_tpu.diff — traced-coefficient designers + runtime."""

    @pytest.mark.parametrize("kind", [
        "lowpass", "highpass", "bandpass", "notch", "allpass"])
    def test_qkind_matches_host_designer(self, kind):
        from algodsp_tpu import diff
        from algodsp_tpu.filters import design
        sr, f0, q = 48000.0, 3140.0, 1.3
        got = np.asarray(getattr(diff, kind)(
            jnp.float64(f0), jnp.float64(q), sr))
        want = getattr(design, kind)(f0, q, sr)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)

    @pytest.mark.parametrize("kind", ["peak", "low_shelf", "high_shelf"])
    def test_gain_kind_matches_host_designer(self, kind):
        from algodsp_tpu import diff
        from algodsp_tpu.filters import design
        sr, f0, g, q = 44100.0, 970.0, 7.5, 2.2
        got = np.asarray(getattr(diff, kind)(
            jnp.float64(f0), jnp.float64(g), jnp.float64(q), sr))
        want = getattr(design, kind)(f0, g, q, sr)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)

    def test_sos_response_matches_host(self):
        from algodsp_tpu import diff
        from algodsp_tpu.filters import design, biquad
        sr = 48000.0
        sos = np.stack([design.lowpass(2000.0, 0.9, sr),
                        design.peak(500.0, 4.0, 1.5, sr)])
        freqs = np.array([50.0, 500.0, 2000.0, 12000.0])
        got = np.asarray(diff.sos_response(jnp.asarray(sos), freqs, sr))
        want = biquad.sos_response(sos, freqs, sr)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_sos_filter_matches_biquad_chain(self, rng):
        from algodsp_tpu import diff
        from algodsp_tpu.filters import BiquadChain, design
        sr = 48000.0
        sos = np.stack([design.lowpass(4000.0, 0.8, sr),
                        design.highpass(120.0, 1.1, sr)])
        x = jnp.asarray(rng.standard_normal((3, 400)))
        y, st = diff.sos_filter(jnp.asarray(sos), x)
        want = BiquadChain(sos).process(x)
        assert snr_db(np.asarray(want), np.asarray(y)) > 200.0
        assert st.shape == (3, 2, 2)

    def test_design_params_gradient_finite_difference(self):
        from algodsp_tpu import diff
        sr = 48000.0
        freqs = jnp.linspace(50.0, 20000.0, 128)
        target = jnp.zeros(128)

        def loss(params):
            f0, g, q = params
            sos = diff.peak(f0, g, q, sr)
            return jnp.mean((diff.sos_magnitude_db(sos, freqs, sr)
                             - target) ** 2)

        p0 = jnp.asarray([1000.0, 6.0, 1.2])
        g = np.asarray(jax.grad(loss)(p0))
        for i in range(3):
            eps = 1e-5 * max(abs(float(p0[i])), 1.0)
            pp = p0.at[i].add(eps)
            pm = p0.at[i].add(-eps)
            fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-4,
                                       err_msg=f"param {i}")

    def test_gradient_descent_recovers_eq(self):
        """A 2-band parametric EQ fit by plain gradient descent recovers
        a target response within 0.1 dB — the end-to-end use case."""
        from algodsp_tpu import diff
        sr = 48000.0
        freqs = jnp.asarray(np.geomspace(40.0, 18000.0, 96))
        true_sos = jnp.concatenate([
            diff.peak(jnp.float64(800.0), jnp.float64(5.0),
                      jnp.float64(1.4), sr)[None],
            diff.high_shelf(jnp.float64(6000.0), jnp.float64(-4.0),
                            jnp.float64(0.9), sr)[None]])
        target = diff.sos_magnitude_db(true_sos, freqs, sr)

        def build(raw):
            f1 = diff.constrain(raw[0], 100.0, 4000.0)
            g1 = 12.0 * jnp.tanh(raw[1])
            q1 = diff.constrain(raw[2], 0.3, 6.0)
            f2 = diff.constrain(raw[3], 2000.0, 16000.0)
            g2 = 12.0 * jnp.tanh(raw[4])
            q2 = diff.constrain(raw[5], 0.3, 6.0)
            return jnp.concatenate([
                diff.peak(f1, g1, q1, sr)[None],
                diff.high_shelf(f2, g2, q2, sr)[None]])

        def loss(raw):
            return jnp.mean((diff.sos_magnitude_db(build(raw), freqs, sr)
                             - target) ** 2)

        raw = jnp.zeros(6)
        val_grad = jax.jit(jax.value_and_grad(loss))
        lr = 0.05
        for _ in range(400):
            v, g = val_grad(raw)
            raw = raw - lr * g
        final_err = float(jnp.max(jnp.abs(
            diff.sos_magnitude_db(build(raw), freqs, sr) - target)))
        assert final_err < 0.1, f"max dB error {final_err}"

    def test_fir_filter_grad_and_parity(self, rng):
        from algodsp_tpu import diff
        taps = jnp.asarray(rng.standard_normal(16))
        x = jnp.asarray(rng.standard_normal((2, 64)))
        y = diff.fir_filter(taps, x)
        want = np.stack([np.convolve(np.asarray(x)[i], np.asarray(taps))[:64]
                         for i in range(2)])
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-10)
        g = jax.grad(lambda t: jnp.sum(diff.fir_filter(t, x) ** 2))(taps)
        assert g.shape == taps.shape and bool(jnp.all(jnp.isfinite(g)))


class TestFoldedCascadeVJP:
    def test_folded_grad_matches_blocked(self, rng):
        """The lane-packed folded path (TPU few-channel dispatch) is
        differentiable and matches the XLA blocked engine's gradient."""
        from algodsp_tpu.filters import BiquadChain, design
        sr = 48000.0
        chain = BiquadChain(np.stack([design.lowpass(3000.0, 0.9, sr),
                                      design.peak(700.0, 3.0, 1.2, sr)]),
                            gain=0.8)
        x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)

        g_folded = jax.grad(
            lambda v: jnp.sum(chain.process_folded(v) * w))(x)
        g_blocked = jax.grad(
            lambda v: jnp.sum(chain.process(v, mode="blocked") * w))(x)
        assert snr_db(np.asarray(g_blocked), np.asarray(g_folded)) > 100.0

    def test_folded_output_unchanged(self, rng):
        from algodsp_tpu.filters import BiquadChain, design
        sr = 48000.0
        chain = BiquadChain(design.butterworth_lp(2500.0, 4, sr))
        x = jnp.asarray(rng.standard_normal((3, 4096)), jnp.float32)
        y_f = chain.process_folded(x)
        y_b = chain.process(x, mode="blocked")
        assert snr_db(np.asarray(y_b), np.asarray(y_f)) > 110.0
        # streaming variant still threads state
        st = chain.init_state((3,), dtype=jnp.float32)
        y_s, st2 = chain.process_folded(x, state=st, return_state=True)
        assert snr_db(np.asarray(y_b), np.asarray(y_s)) > 110.0
        assert st2.shape == st.shape


class TestMoogVJP:
    def test_moog_pallas_grad_matches_scan(self, rng):
        """Gradient through the fused Pallas ladder (scan-recompute
        VJP) == gradient through the plain scan path."""
        from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
        from algodsp_tpu.ops import pallas_kernels as pk
        f = MoogFilter(48000.0, cutoff_hz=2000.0, resonance=0.4,
                       variant=MoogVariant.CLASSIC)
        n = pk._CHUNK_T  # one full kernel chunk
        x = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        st = f.init_state((2,), dtype=jnp.float32)

        def loss_pallas(v):
            _, y = f._run_pallas(st, v)
            return jnp.sum(y * w)

        def loss_scan(v):
            _, y = f._run_scan(st, v)
            return jnp.sum(y * w)

        g_p = jax.grad(loss_pallas)(x)
        g_s = jax.grad(loss_scan)(x)
        assert snr_db(np.asarray(g_s), np.asarray(g_p)) > 120.0
