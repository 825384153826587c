"""Whole-cascade blocked IIR engine (ops/cascade.py).

Checked against the per-section scan evaluation — the same oracle
relationship as the reference's SIMD dispatch tests
(`dsp/filter/biquad/dispatch_*_test.go`: every backend must match the
generic kernel).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.filters import BiquadChain
from algodsp_tpu.filters.design import rbj, cascades
from algodsp_tpu.ops import cascade
from algodsp_tpu.testutil import snr_db

SR = 48000.0


def _oracle(chain: BiquadChain, x):
    state = chain.init_state(x.shape[:-1], dtype=jnp.float64)
    _, y = chain.process_stream(state, jnp.asarray(x, jnp.float64),
                                mode="scan")
    return np.asarray(y)


@pytest.mark.parametrize("order", [2, 4, 10])
def test_matches_scan_oracle(order):
    sos = cascades.butterworth_lp(2000.0, order, SR)
    chain = BiquadChain(sos)
    rng = np.random.default_rng(order)
    x = rng.standard_normal((3, 2048)).astype(np.float64)
    y = np.asarray(cascade.cascade_apply_blocked(jnp.asarray(x),
                                                 chain.runtime_sos))
    want = _oracle(chain, x)
    assert snr_db(want, y) > 230


def test_f32_snr():
    sos = np.concatenate([cascades.butterworth_lp(2000.0, 10, SR),
                          rbj.peak(6000.0, 2.0, 4.0, SR)[None]
                          if np.ndim(rbj.peak(6000.0, 2.0, 4.0, SR)) == 1
                          else rbj.peak(6000.0, 2.0, 4.0, SR).reshape(-1, 5)])
    chain = BiquadChain(sos)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = np.asarray(cascade.cascade_apply_blocked(jnp.asarray(x),
                                                 chain.runtime_sos))
    want = _oracle(chain, x)
    assert snr_db(want, y) > 110


def test_high_q_keeps_sweeps():
    # resonant section: pole radius ~0.9995 -> carries survive many
    # blocks; the sweep truncation must keep enough levels to stay exact
    sos = rbj.peak(100.0, 30.0, 12.0, SR).reshape(-1, 5)
    chain = BiquadChain(sos)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8192)).astype(np.float64)
    y = np.asarray(cascade.cascade_apply_blocked(jnp.asarray(x),
                                                 chain.runtime_sos))
    want = _oracle(chain, x)
    assert snr_db(want, y) > 200


def test_streaming_state_roundtrip():
    sos = cascades.butterworth_lp(1000.0, 6, SR)
    chain = BiquadChain(sos)
    S = chain.num_runtime_sections
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2048)).astype(np.float64)
    xj = jnp.asarray(x)
    # two chained cascade calls == one long call
    y1, s_mid = cascade.cascade_apply_blocked(xj[..., :1024],
                                              chain.runtime_sos,
                                              return_state=True)
    y2 = cascade.cascade_apply_blocked(xj[..., 1024:], chain.runtime_sos,
                                       s0=s_mid)
    y_full = cascade.cascade_apply_blocked(xj, chain.runtime_sos)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert snr_db(np.asarray(y_full), got) > 230
    # compact state <-> BiquadChain state conversion is lossless
    st = cascade.compact_state_to_chain(s_mid, S)
    back = cascade.chain_state_to_compact(st)
    np.testing.assert_allclose(np.asarray(back), np.asarray(s_mid))
    # and the chain-basis state agrees with the scan-path state
    st_scan, _ = chain.process_stream(
        chain.init_state((2,), dtype=jnp.float64), xj[..., :1024],
        mode="scan")
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_scan),
                               atol=1e-9)


def test_impulse_is_cascade_ir():
    sos = cascades.butterworth_lp(4000.0, 4, SR)
    chain = BiquadChain(sos)
    x = np.zeros((1, 512))
    x[0, 0] = 1.0
    y = np.asarray(cascade.cascade_apply_blocked(
        jnp.asarray(x), chain.runtime_sos))[0]
    want = np.asarray(chain.impulse_response(512))
    assert snr_db(want, y) > 230


def test_biquad_chain_process_cascade_with_gain():
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    wt = weighting_chain(WeightingType.A, SR)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1024)).astype(np.float64)
    y = np.asarray(wt.process_cascade(jnp.asarray(x)))
    want = np.asarray(wt.process(jnp.asarray(x), mode="blocked"))
    assert snr_db(want, y) > 200


def test_biquad_chain_process_cascade_streaming():
    sos = cascades.butterworth_lp(3000.0, 8, SR)
    chain = BiquadChain(sos, gain=0.5)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 2048)).astype(np.float64)
    xj = jnp.asarray(x)
    st = chain.init_state((2,), dtype=jnp.float64)
    y1, st1 = chain.process_cascade(xj[..., :1024], state=st,
                                    return_state=True)
    y2, _ = chain.process_cascade(xj[..., 1024:], state=st1,
                                  return_state=True)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    st_o = chain.init_state((2,), dtype=jnp.float64)
    st_mid, w1 = chain.process_stream(st_o, xj[..., :1024], mode="scan")
    _, w2 = chain.process_stream(st_mid, xj[..., 1024:], mode="scan")
    want = np.concatenate([np.asarray(w1), np.asarray(w2)], axis=-1)
    assert snr_db(want, got) > 200
    # returned state is in the BiquadChain basis and matches the scan path
    np.testing.assert_allclose(np.asarray(st1), np.asarray(st_mid),
                               atol=1e-9)


def test_banded_cascade_matches_per_section():
    from algodsp_tpu.filters.bank import _BandedChain
    rng = np.random.default_rng(9)
    # 4 bands, each a different 2-section bandpass-ish cascade
    sos = []
    for fc in (200.0, 1000.0, 4000.0, 12000.0):
        lp = cascades.butterworth_lp(fc * 1.2, 2, SR)
        hp = cascades.butterworth_hp(fc * 0.8, 2, SR)
        sos.append(np.concatenate([lp, hp]))
    sos = np.stack(sos)                       # (4, S, 5)
    ch = _BandedChain(sos)
    x = rng.standard_normal((2, 4, 1024)).astype(np.float64)
    st = ch.init_state((2,), jnp.float64)
    st_f, y_f = ch.process_stream(st, jnp.asarray(x))
    st_r, y_r = ch._process_stream_sections(st, jnp.asarray(x))
    assert snr_db(np.asarray(y_r), np.asarray(y_f)) > 200
    np.testing.assert_allclose(np.asarray(st_f), np.asarray(st_r),
                               atol=1e-9)
    # streaming continuation across two engine calls
    st1, y1 = ch.process_stream(st, jnp.asarray(x[..., :512]))
    st2, y2 = ch.process_stream(st1, jnp.asarray(x[..., 512:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], -1)
    assert snr_db(np.asarray(y_r), got) > 200
    # non-block-multiple length falls back exactly
    st3, y3 = ch.process_stream(st, jnp.asarray(x[..., :700]))
    st3r, y3r = ch._process_stream_sections(st, jnp.asarray(x[..., :700]))
    assert snr_db(np.asarray(y3r), np.asarray(y3)) > 200
    np.testing.assert_allclose(np.asarray(st3), np.asarray(st3r))


def test_bulk_256_block_path_matches_scan():
    """Long one-shot calls re-block the cascade engine at 256 (internal,
    HBM-lighter sweeps); output must match the sequential scan."""
    import numpy as np
    import jax.numpy as jnp
    from algodsp_tpu.filters import BiquadChain, design
    rng = np.random.default_rng(3)
    n = 1 << 16                       # engages the bulk-256 gate
    x = rng.standard_normal((2, n)).astype(np.float32)
    chain = BiquadChain(design.butterworth_lp(2000.0, 6, 48000.0))
    y_bulk = np.asarray(chain.process_cascade(jnp.asarray(x)))
    y_scan = np.asarray(chain.process(jnp.asarray(x), mode="scan"))
    assert snr_db(y_scan.astype(np.float64), y_bulk) > 110
    # streaming (stateful) calls keep the 128-block layout and continue
    st = chain.init_state((2,), dtype=jnp.float32)
    y1, st = chain.process_cascade(x[:, :n // 2], state=st,
                                   return_state=True)
    y2, _ = chain.process_cascade(x[:, n // 2:], state=st,
                                  return_state=True)
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)], -1)
    assert snr_db(y_scan.astype(np.float64), y_stream) > 110
