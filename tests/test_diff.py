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
