"""Pallas-vs-XLA equivalence (the analog of the reference's SIMD
dispatch tests, `dispatch_*_test.go`). Runs the kernel in interpreter
mode on CPU; the same code path compiles on TPU."""

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.ops.envscan import envelope_scan
from algodsp_tpu.ops.pallas_kernels import envelope_scan_pallas
from tests.conftest import snr_db


def test_envelope_pallas_matches_scan():
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((4, 1500)))  # non-multiple of chunk
    env0 = rng.uniform(0, 1, 4)
    ef_ref, traj_ref = envelope_scan(jnp.asarray(x), jnp.asarray(env0),
                                     0.3, 0.05)
    ef_p, traj_p = envelope_scan_pallas(jnp.asarray(x, jnp.float32),
                                        jnp.asarray(env0, jnp.float32),
                                        0.3, 0.05)
    assert snr_db(np.asarray(traj_ref), np.asarray(traj_p)) > 100
    np.testing.assert_allclose(np.asarray(ef_p), np.asarray(ef_ref), rtol=1e-5)


def test_envelope_pallas_multi_chunk():
    rng = np.random.default_rng(2)
    x = np.abs(rng.standard_normal((2, 3000)))
    ef_ref, traj_ref = envelope_scan(jnp.asarray(x), jnp.zeros(2), 0.5, 0.01)
    ef_p, traj_p = envelope_scan_pallas(jnp.asarray(x, jnp.float32),
                                        jnp.zeros(2, jnp.float32), 0.5, 0.01)
    assert snr_db(np.asarray(traj_ref), np.asarray(traj_p)) > 100


def test_biquad_cascade_pallas_matches_blocked():
    from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas
    from algodsp_tpu.filters import BiquadChain, design
    sos = design.butterworth_lp(2000.0, 10, 48000.0)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 1000)).astype(np.float32)  # non-multiples
    y_ref = np.asarray(BiquadChain(sos).process(jnp.asarray(x)))
    y_p = np.asarray(biquad_cascade_pallas(jnp.asarray(x), sos))
    assert snr_db(y_ref.astype(np.float64), y_p.astype(np.float64)) > 100


def test_biquad_cascade_pallas_gain_and_first_order():
    from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas
    from algodsp_tpu.filters import BiquadChain, design
    sos = design.butterworth_lp(1000.0, 3, 48000.0)  # has 1st-order tail
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 512)).astype(np.float32)
    y_ref = np.asarray(BiquadChain(sos, gain=0.5).process(jnp.asarray(x)))
    y_p = np.asarray(biquad_cascade_pallas(jnp.asarray(x), sos, gain=0.5))
    assert snr_db(y_ref.astype(np.float64), y_p.astype(np.float64)) > 100


def test_moog_ladder_pallas_interpret_matches_scan():
    """Fused Moog kernel (interpret mode on CPU) vs the lax.scan path."""
    from algodsp_tpu.ops.pallas_kernels import moog_ladder_pallas, _CHUNK_T
    from algodsp_tpu.filters.moog import MoogFilter, MoogVariant

    rng = np.random.default_rng(3)
    C, T = 4, _CHUNK_T
    x = jnp.asarray(rng.standard_normal((C, T)) * 0.3, jnp.float32)
    for variant, fast, huo in [
            (MoogVariant.CLASSIC, False, False),
            (MoogVariant.CLASSIC_LIGHTWEIGHT, True, False),
            (MoogVariant.HUOVILAINEN, False, True)]:
        mg = MoogFilter(48000.0, variant=variant, cutoff_hz=2000.0,
                        resonance=2.0, thermal_voltage=0.5)
        state = mg.init_state((C,), jnp.float32)
        sref, yref = mg._run_scan(state, x)
        st8 = jnp.concatenate([state["stage"].T, state["tanh_last"].T,
                               state["prev_out"][None, :]], axis=0)
        params = [mg.coefficient, mg.drive_scale, mg.feedback,
                  mg.input_gain, mg.output_scale]
        st8f, yp = moog_ladder_pallas(x, st8, params, fast_tanh=fast,
                                      huovilainen=huo)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yref),
                                   atol=1e-5, err_msg=str(variant))
        np.testing.assert_allclose(np.asarray(st8f[:4].T),
                                   np.asarray(sref["stage"]), atol=1e-5)


def test_moog_pallas_state_clip_matches():
    # drive the ladder hard enough to hit the +-32 state clip
    from algodsp_tpu.ops.pallas_kernels import moog_ladder_pallas, _CHUNK_T
    from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
    rng = np.random.default_rng(4)
    C, T = 2, _CHUNK_T
    # large DC drives the stage equilibria toward the input level (>32)
    x = jnp.asarray(100.0 + rng.standard_normal((C, T)), jnp.float32)
    mg = MoogFilter(48000.0, cutoff_hz=8000.0, resonance=0.5, drive=1.0,
                    thermal_voltage=20.0)
    state = mg.init_state((C,), jnp.float32)
    sref, yref = mg._run_scan(state, x)
    assert float(jnp.max(jnp.abs(sref["stage"]))) >= 31.9  # clip engaged
    st8 = jnp.concatenate([state["stage"].T, state["tanh_last"].T,
                           state["prev_out"][None, :]], axis=0)
    params = [mg.coefficient, mg.drive_scale, mg.feedback,
              mg.input_gain, mg.output_scale]
    st8f, yp = moog_ladder_pallas(x, st8, params, fast_tanh=False,
                                  huovilainen=False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yref), atol=1e-4)


def test_moog_zdf_pallas_interpret_matches_scan():
    from algodsp_tpu.ops.pallas_kernels import moog_zdf_pallas, _CHUNK_T
    from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
    rng = np.random.default_rng(5)
    C, T = 2, _CHUNK_T
    x = jnp.asarray(rng.standard_normal((C, T)) * 0.3, jnp.float32)
    mg = MoogFilter(48000.0, variant=MoogVariant.ZDF, cutoff_hz=2000.0,
                    resonance=2.5, thermal_voltage=0.5, newton_iters=4)
    state = mg.init_state((C,), jnp.float32)
    sref, yref = mg._run_scan(state, x)
    st8 = jnp.concatenate([state["stage"].T, state["tanh_last"].T,
                           state["prev_out"][None, :]], axis=0)
    params = [mg.zdf_gk, mg.drive_scale, mg.feedback, mg.input_gain,
              mg.output_scale]
    st8f, yp = moog_zdf_pallas(x, st8, params, newton_iters=4)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st8f[:4].T),
                               np.asarray(sref["stage"]), atol=1e-5)


def test_envelope_pallas_per_channel_coefficients():
    # attack/release as (C,) vectors (the bench's 512-ch case shape)
    rng = np.random.default_rng(7)
    x = np.abs(rng.standard_normal((5, 2100)))
    att = rng.uniform(0.01, 0.5, 5)
    rel = rng.uniform(0.001, 0.05, 5)
    ef_ref, traj_ref = envelope_scan(
        jnp.asarray(x), jnp.zeros(5), jnp.asarray(att), jnp.asarray(rel))
    ef_p, traj_p = envelope_scan_pallas(
        jnp.asarray(x, jnp.float32), jnp.zeros(5, jnp.float32),
        jnp.asarray(att, jnp.float32), jnp.asarray(rel, jnp.float32))
    assert snr_db(np.asarray(traj_ref), np.asarray(traj_p)) > 100
    np.testing.assert_allclose(np.asarray(ef_p), np.asarray(ef_ref),
                               rtol=1e-4)
