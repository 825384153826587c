"""LTI folding: chain -> convolver collapsed into one convolution.

Oracle: the unfused pipeline (BiquadChain.process then
PartitionedConvolver.process) and a float64 direct reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.conv import PartitionedConvolver, folded_convolver
from algodsp_tpu.conv.ltifold import (
    chain_impulse_response,
    fold_chain_into_kernel,
    iir_tail_length,
)
from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
from algodsp_tpu.testutil import snr_db


def _chain(sr=48000.0):
    casc = BiquadChain(design.butterworth_lp(2000.0, 6, sr))
    w = weighting_chain(WeightingType.A, sr)
    return BiquadChain(np.concatenate([casc.runtime_sos, w.runtime_sos]),
                       gain=casc.gain * w.gain, condition=False)


def test_tail_length_covers_decay():
    chain = _chain()
    n = iir_tail_length(chain.sos, tol_db=150.0)
    h = chain_impulse_response(chain, n + 2048)
    peak = np.max(np.abs(h))
    assert np.max(np.abs(h[n:])) < peak * 10.0 ** (-150.0 / 20.0)


def test_tail_length_rejects_unstable():
    with pytest.raises(ValueError, match="not.*stable|stable"):
        iir_tail_length(np.array([[1.0, 0.0, 0.0, -2.0, 1.0001]]))


def test_folded_kernel_matches_f64_pipeline():
    rng = np.random.default_rng(3)
    chain = _chain()
    ir = rng.standard_normal(4096) * np.exp(-np.arange(4096) / 800.0)
    combined = fold_chain_into_kernel(chain, ir)
    # f64 oracle: impulse through chain (sequential DF2T), then conv
    n = 8192
    x = rng.standard_normal(n)
    h_long = chain_impulse_response(chain, n)
    mid = np.convolve(x, h_long)[:n]
    want = np.convolve(mid, ir)[:n]
    got = np.convolve(x, combined)[:n]
    assert snr_db(want, got) > 140.0


def test_folded_convolver_matches_unfused_pipeline():
    rng = np.random.default_rng(7)
    sr = 48000.0
    chain = _chain(sr)
    ir = (rng.standard_normal(8192) *
          np.exp(-np.arange(8192) / 1500.0)).astype(np.float64)
    reverb = PartitionedConvolver(ir, min_block_order=8)
    fused = folded_convolver(chain, ir, min_block_order=8)
    assert fused.latency == reverb.latency

    x = jnp.asarray(rng.standard_normal((4, 4096)), jnp.float32)
    want = reverb.process(chain.process(x))
    got = fused.process(x)
    # both are f32 paths computing the same LTI operator; f64 oracle
    h_long = chain_impulse_response(chain, 4096)
    ref = np.stack([
        np.convolve(np.convolve(np.asarray(x)[c].astype(np.float64), h_long)[:4096],
                    ir)[:4096]
        for c in range(4)])
    assert snr_db(ref, np.asarray(got, np.float64)) > 100.0
    assert snr_db(np.asarray(want, np.float64),
                  np.asarray(got, np.float64)) > 95.0
