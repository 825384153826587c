"""Fused Pallas FDL convolution kernel (ops/fdlconv.py).

The TPU analog of the reference's partitioned-convolution hot loop
(`dsp/conv/partitioned.go:134`); tested here in interpreter mode on
CPU against a NumPy f64 direct-convolution oracle and against the
XLA bulk-FDL formulation it replaces (the analog of the reference's
SIMD dispatch tests, `dispatch_*_test.go`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.ops import fdlconv
from algodsp_tpu.conv.partitioned import PartitionedConvolver
from algodsp_tpu.testutil import snr_db


def _oracle(x, ir, n):
    return np.stack([np.convolve(xi.astype(np.float64),
                                 ir.astype(np.float64))[:n] for xi in x])


@pytest.mark.parametrize("C,nf,P", [(2, 4, 3), (1, 2, 1), (3, 6, 5),
                                    (2, 3, 2), (4, 5, 1), (2, 8, 2),
                                    (2, 8, 6)])
def test_fused_matches_f64_oracle(C, nf, P):
    B = 1024
    rng = np.random.default_rng(C * 10 + nf + P)
    ir = (rng.standard_normal(P * B - B // 2) *
          np.exp(-np.arange(P * B - B // 2) / 500.0)).astype(np.float32)
    x = rng.standard_normal((C, nf * B)).astype(np.float32)
    hg = fdlconv.kernel_spectra(ir, B)
    assert hg.shape == (P, 2, 2 * B // 128, 128)
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    want = _oracle(x, ir, nf * B)
    assert snr_db(want, y) > 110


def test_fused_dispatch_through_convolver(monkeypatch):
    """ALGODSP_FDL_FUSED=1 forces the Pallas path (interpreted on CPU);
    it must match the XLA bulk-FDL path bit-for-tolerance."""
    B = 1024
    rng = np.random.default_rng(7)
    ir = (rng.standard_normal(3 * B) *
          np.exp(-np.arange(3 * B) / 800.0)).astype(np.float32)
    conv = PartitionedConvolver(ir, 8)
    x = rng.standard_normal((2, 4 * B)).astype(np.float32)

    monkeypatch.setenv("ALGODSP_FDL_FUSED", "0")
    y_xla = np.asarray(conv._process_bulk_fdl(jnp.asarray(x), 10))
    monkeypatch.setenv("ALGODSP_FDL_FUSED", "1")
    y_fused = np.asarray(conv._process_bulk_fdl(jnp.asarray(x), 10))
    assert snr_db(y_xla, y_fused) > 110


def test_quiet_channel_keeps_relative_snr():
    """A -120 dBFS channel paired with a full-scale one must keep its
    own relative noise floor (per-channel normalization before the
    a+ib packing): without it, the quiet channel inherits the loud
    channel's absolute f32 roundoff as ~21 dB SNR crosstalk."""
    B, P = 1024, 3
    rng = np.random.default_rng(99)
    ir = (rng.standard_normal(P * B) *
          np.exp(-np.arange(P * B) / 500.0)).astype(np.float32)
    x = rng.standard_normal((2, 4 * B)).astype(np.float32)
    x[0] *= 1e-6                      # -120 dBFS stem next to 0 dBFS
    hg = fdlconv.kernel_spectra(ir, B)
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    want = _oracle(x, ir, 4 * B)
    snr_quiet = snr_db(want[0], y[0])
    assert snr_quiet > 110, snr_quiet
    # and an all-zero channel stays silent: the tiny-normal scale guard
    # crushes pair crosstalk below the f32 subnormal range
    x[1] = 0.0
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    assert np.max(np.abs(y[1])) < 1e-37
    assert np.all(np.isfinite(y))


def test_two_pairs_per_step_mixed_scales():
    """8 channels route through the Q=2 (two-pairs-per-grid-step)
    kernel with the in-kernel SMEM peak normalization; channels
    spanning 9 orders of magnitude must each keep their own relative
    noise floor."""
    B, P = 1024, 3
    rng = np.random.default_rng(17)
    ir = (rng.standard_normal(P * B) *
          np.exp(-np.arange(P * B) / 500.0)).astype(np.float32)
    x = rng.standard_normal((8, 6 * B)).astype(np.float32)
    x[2] *= 1e-5
    x[5] *= 1e4
    assert fdlconv._pick_pairs(8) == 2
    hg = fdlconv.kernel_spectra(ir, B)
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    want = _oracle(x, ir, 6 * B)
    for c in range(8):
        assert snr_db(want[c], y[c]) > 110, c


def test_fast_precision_mode(monkeypatch):
    """ALGODSP_FDL_PRECISION=fast (bf16x3 matmuls — the fastmath
    analog, `compressor_math_fast.go:1-32`) trades ~30 dB SNR for ~2x
    matmul throughput; must stay well above 16/24-bit audio floors."""
    B, P = 1024, 3
    rng = np.random.default_rng(42)
    ir = (rng.standard_normal(P * B) *
          np.exp(-np.arange(P * B) / 500.0)).astype(np.float32)
    x = rng.standard_normal((2, 4 * B)).astype(np.float32)
    hg = fdlconv.kernel_spectra(ir, B)
    want = _oracle(x, ir, 4 * B)
    monkeypatch.setenv("ALGODSP_FDL_PRECISION", "fast")
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    assert snr_db(want, y) > 95
    monkeypatch.setenv("ALGODSP_FDL_PRECISION", "nope")
    with pytest.raises(ValueError, match="ALGODSP_FDL_PRECISION"):
        fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B)


def test_supported_constraints():
    assert fdlconv.supported(1024, 4, 8192)
    assert not fdlconv.supported(512, 4, 4096)       # B too small
    assert not fdlconv.supported(1024, 4, 5000)      # not whole frames
    assert not fdlconv.supported(1 << 16, 2, 1 << 20)  # VMEM blowout
    assert not fdlconv.supported(1000, 4, 8000)      # B not lane-aligned


def test_leading_silence_and_tail():
    # impulse IR delayed by one full partition: output = input delayed
    B = 1024
    P = 2
    ir = np.zeros(P * B, np.float32)
    ir[B + 5] = 1.0
    hg = fdlconv.kernel_spectra(ir, B)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3 * B)).astype(np.float32)
    y = np.asarray(fdlconv.fdl_conv_fused(jnp.asarray(x), hg, B))
    want = np.zeros_like(y)
    want[0, B + 5:] = x[0, :2 * B - 5]
    assert snr_db(want, y) > 110


def test_kernel_spectra_jax_matches_host():
    B = 1024
    rng = np.random.default_rng(11)
    ir = rng.standard_normal(3 * B - 100).astype(np.float32)
    host = fdlconv.kernel_spectra(ir, B)
    dev = np.asarray(fdlconv.kernel_spectra_jax(jnp.asarray(ir), B, 3))
    assert np.abs(host - dev).max() < 1e-3 * np.abs(host).max()


def test_fftconvolve_fused_dispatch(monkeypatch):
    """Force the fused path through fftconvolve (interpreted on CPU)
    and compare against the plain XLA path."""
    from algodsp_tpu.conv import fftconvolve
    import algodsp_tpu.conv.conv as convmod
    rng = np.random.default_rng(12)
    ir = rng.standard_normal(5000).astype(np.float32)
    x = rng.standard_normal((2, 3000)).astype(np.float32)

    monkeypatch.setenv("ALGODSP_FDL_FUSED", "0")
    want = np.asarray(fftconvolve(jnp.asarray(x), jnp.asarray(ir)))
    # emulate the TPU dispatch on CPU: call the fused branch directly
    B = fdlconv.pick_block(5000, 3000)
    assert B is not None
    P = -(-5000 // B)
    total = 3000 + 5000 - 1
    padded = -(-total // B) * B
    flat = jnp.pad(jnp.asarray(x), ((0, 0), (0, padded - 3000)))
    hg = fdlconv.kernel_spectra_jax(jnp.asarray(ir), B, P)
    got = np.asarray(fdlconv.fdl_conv_fused(flat, hg, B))[..., :total]
    assert snr_db(want, got) > 110


def test_process_stream_rehistory_continuation(monkeypatch):
    """The rehistory streaming fast path must continue exactly where a
    previous call left off and return a reusable state."""
    monkeypatch.setenv("ALGODSP_FDL_FUSED", "1")
    B = 128
    P = 16
    rng = np.random.default_rng(21)
    ir = (rng.standard_normal(P * B - 30) *
          np.exp(-np.arange(P * B - 30) / 600.0)).astype(np.float32)
    conv = PartitionedConvolver(ir, 7)     # block 128
    assert conv.num_parts == P
    N = P * B                              # minimum fast-path length
    x = rng.standard_normal((2, 3 * N)).astype(np.float32)
    xj = jnp.asarray(x)

    st = conv.init_state((2,))
    st, y1 = conv.process_stream(st, xj[..., :N])
    st, y2 = conv.process_stream(st, xj[..., N:2 * N])
    st, y3 = conv.process_stream(st, xj[..., 2 * N:])
    got = np.concatenate([np.asarray(y1), np.asarray(y2), np.asarray(y3)],
                         axis=-1)
    want = np.stack([np.convolve(xi.astype(np.float64),
                                 ir.astype(np.float64))[:3 * N]
                     for xi in x])
    assert snr_db(want, got) > 100

    # and the state interoperates with the depthwise streaming path
    monkeypatch.setenv("ALGODSP_FDL_FUSED", "0")
    st2 = conv.init_state((2,))
    st2, z1 = conv.process_stream(st2, xj[..., :N])
    monkeypatch.setenv("ALGODSP_FDL_FUSED", "1")
    st2, z2 = conv.process_stream(st2, xj[..., N:2 * N])
    got2 = np.concatenate([np.asarray(z1), np.asarray(z2)], axis=-1)
    assert snr_db(want[..., :2 * N], got2) > 100
