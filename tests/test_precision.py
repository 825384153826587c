"""f32 precision of the blocked IIR engines on slow-pole filters.

Low-frequency highpass/shelf/peak filters put complex poles near z = 1;
the direct-basis block algebra then carries intermediates of magnitude
peak(h) (~50-80) that cancel, costing 30-60 dB. The residual drive
decomposition (filters/biquad.py) plus the modal carry basis
(linrec.AR2Kernels.Gm / cascade.CascadeKernels.V) must keep the blocked
engines at least as accurate as the sequential f32 recurrence — the
reference's own evaluation order (`section.go:47-53`).

Oracle: float64 impulse-response convolution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.conv.ltifold import chain_impulse_response
from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.filters.design import rbj
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
from algodsp_tpu.testutil import snr_db

_N = 1 << 15


def _cases():
    return [
        ("hp120_o2", design.butterworth_hp(120.0, 2, 48000.0), 90.0, 100.0),
        ("hp60_o4", design.butterworth_hp(60.0, 4, 48000.0), 80.0, 88.0),
        ("hp1k_o4", design.butterworth_hp(1000.0, 4, 48000.0), 108.0, 125.0),
        ("lp2k_o10", design.butterworth_lp(2000.0, 10, 48000.0), 125.0, 125.0),
        ("lowshelf100",
         design.butterworth_low_shelf(48000.0, 100.0, 6.0, 4), 98.0, 96.0),
        ("peak80", np.atleast_2d(rbj.peak(80.0, 1.0, 6.0, 48000.0)),
         105.0, 90.0),
    ]


@pytest.mark.parametrize("name,sos,min_blocked,min_cascade",
                         [pytest.param(*c, id=c[0]) for c in _cases()])
def test_blocked_engines_beat_sequential_f32(name, sos, min_blocked,
                                             min_cascade):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(_N)
    xj = jnp.asarray(x, jnp.float32)
    ch = BiquadChain(np.atleast_2d(np.asarray(sos, np.float64)))
    ref = np.convolve(x, chain_impulse_response(ch, _N))[:_N]
    got_b = snr_db(ref, np.asarray(ch.process(xj, mode="blocked"), np.float64))
    got_c = snr_db(ref, np.asarray(ch.process(xj, mode="cascade"), np.float64))
    assert got_b > min_blocked, f"blocked {name}: {got_b:.1f} dB"
    assert got_c > min_cascade, f"cascade {name}: {got_c:.1f} dB"


def test_a_weighting_blocked_snr():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(_N)
    w = weighting_chain(WeightingType.A, 48000.0)
    ref = np.convolve(x, chain_impulse_response(w, _N))[:_N]
    got = snr_db(ref, np.asarray(
        w.process(jnp.asarray(x, jnp.float32), mode="blocked"), np.float64))
    assert got > 118.0


def test_cascade_streaming_matches_oneshot_on_slow_poles():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(_N)
    xj = jnp.asarray(x, jnp.float32)
    ch = BiquadChain(design.butterworth_hp(60.0, 4, 48000.0))
    y_once = np.asarray(ch.process(xj, mode="cascade"), np.float64)
    st = ch.init_state((), jnp.float32)
    y1, st = ch.process_cascade(xj[:_N // 2], state=st, return_state=True)
    y2, _ = ch.process_cascade(xj[_N // 2:], state=st, return_state=True)
    stitched = np.concatenate([np.asarray(y1, np.float64),
                               np.asarray(y2, np.float64)])
    assert snr_db(y_once, stitched) > 110.0


@pytest.mark.parametrize("name,sos", [
    pytest.param(c[0], c[1], id=c[0]) for c in _cases()
    if c[0] in ("hp120_o2", "hp60_o4", "lowshelf100", "peak80")])
@pytest.mark.parametrize("mode", ["blocked", "cascade"])
def test_exact_optin_reaches_120db_on_slow_poles(name, sos, mode):
    """The opt-in f64-internal path (`process(exact=True)`) restores
    the reference's >=120 dB bar (BASELINE.json) on exactly the
    slow-pole class where the default f32 engines sit at 86-115 dB.
    The default path's assertions above are unchanged."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(_N)
    xj = jnp.asarray(x, jnp.float32)
    ch = BiquadChain(np.atleast_2d(np.asarray(sos, np.float64)))
    assert ch.has_slow_poles, "case should be in the documented class"
    ref = np.convolve(x, chain_impulse_response(ch, _N))[:_N]
    y = np.asarray(ch.process(xj, mode=mode, exact=True), np.float64)
    got = snr_db(ref, y)
    assert got > 140.0, f"{name} {mode} exact: {got:.1f} dB"


def test_exact_optin_auto_and_validation():
    ch = BiquadChain(design.butterworth_hp(60.0, 4, 48000.0))
    x = jnp.asarray(np.random.default_rng(3).standard_normal(4096),
                    jnp.float32)
    y = ch.process(x, exact=True)          # auto mode resolves
    assert y.dtype == jnp.float32
    with pytest.raises(ValueError, match="XLA engines"):
        ch.process(x, mode="pallas", exact=True)
    # fast-pole chains are NOT in the class — property says so
    assert not BiquadChain(
        design.butterworth_lp(2000.0, 10, 48000.0)).has_slow_poles
