"""Mesh sharding tests on the 8-device CPU mesh (the analog of the
reference's purego fallback testing, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from algodsp_tpu.parallel import (
    make_mesh, channel_sharding, fir_time_sharded, biquad_time_sharded,
    reduce_metrics)
from algodsp_tpu.filters import BiquadChain, design
from tests.conftest import snr_db


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh({"channel": 2, "time": -1})
    assert mesh2.shape == {"channel": 2, "time": 4}
    with pytest.raises(ValueError):
        make_mesh({"channel": 3})


def test_channel_sharded_biquad_matches_single_device():
    mesh = make_mesh({"channel": 8})
    sos = design.butterworth_lp(1000.0, 4, 48000.0)
    chain = BiquadChain(sos)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1024)))
    xs = jax.device_put(x, channel_sharding(mesh, 2))
    y_sharded = np.asarray(jax.jit(chain.process)(xs))
    y_ref = np.asarray(chain.process(x))
    assert snr_db(y_ref, y_sharded) > 200


def test_fir_time_sharded():
    mesh = make_mesh({"channel": 2, "time": 4})
    rng = np.random.default_rng(1)
    h = rng.standard_normal(33)
    x = rng.standard_normal((4, 1024))
    y = np.asarray(fir_time_sharded(jnp.asarray(x), h, mesh))
    expected = np.stack([np.convolve(xi, h)[:1024] for xi in x])
    assert snr_db(expected, y) > 200


def test_biquad_time_sharded_exact():
    mesh = make_mesh({"channel": 2, "time": 4})
    sos = np.stack([
        design.lowpass(2000.0, 2.0, 48000.0),
        design.highpass(100.0, 0.9, 48000.0),
    ])
    chain = BiquadChain(sos, gain=0.8)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 4096))
    y = np.asarray(biquad_time_sharded(jnp.asarray(x), chain, mesh))
    y_ref = np.asarray(chain.process(jnp.asarray(x)))
    assert snr_db(y_ref, y) > 200


def test_biquad_time_sharded_validation():
    mesh = make_mesh({"channel": 2, "time": 4})
    chain = BiquadChain(design.lowpass(1000.0, 1.0, 48000.0))
    with pytest.raises(ValueError):
        biquad_time_sharded(jnp.zeros((2, 1000)), chain, mesh)  # 1000 % 4 != 0


def test_reduce_metrics_psum():
    mesh = make_mesh({"channel": 8})
    v = jnp.arange(8.0)
    out = np.asarray(reduce_metrics(v, mesh))
    np.testing.assert_allclose(out, 28.0)


def test_channel_sharded_conv_reverb_stream():
    """Streaming partitioned conv with FDL state sharded over channels."""
    from algodsp_tpu.conv import PartitionedConvolver
    mesh = make_mesh({"channel": 8})
    rng = np.random.default_rng(4)
    ir = rng.standard_normal(3000)
    pc = PartitionedConvolver(ir, min_block_order=9)
    x = jnp.asarray(rng.standard_normal((8, 2048)))
    state = pc.init_state((8,), x.dtype)
    sh = channel_sharding(mesh, 2)
    xs = jax.device_put(x, sh)
    ss = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, channel_sharding(mesh, a.ndim)), state)
    proc = jax.jit(pc.process_stream)
    ss, y1 = proc(ss, xs)
    ss, y2 = proc(ss, xs)
    s_ref = pc.init_state((8,), x.dtype)
    s_ref, r1 = pc.process_stream(s_ref, x)
    s_ref, r2 = pc.process_stream(s_ref, x)
    assert snr_db(np.asarray(r1), np.asarray(y1)) > 200
    assert snr_db(np.asarray(r2), np.asarray(y2)) > 200


def test_biquad_pipeline_stages_exact():
    """SURVEY §2.9 PP row: cascade staged over 4 devices with ppermute
    handoff matches the serial cascade exactly."""
    from algodsp_tpu.parallel import biquad_pipeline
    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    sos = design.butterworth_lp(2000.0, 8, 48000.0)    # 4 sections
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 8192)))
    y_pipe = biquad_pipeline(mesh, "stage", sos, x, block=2048)
    y_ref = BiquadChain(sos).process(x)
    assert snr_db(np.asarray(y_ref), np.asarray(y_pipe)) > 250
    # validation errors
    with pytest.raises(ValueError):
        biquad_pipeline(mesh, "stage", sos[:3], x, block=2048)
    with pytest.raises(ValueError):
        biquad_pipeline(mesh, "stage", sos, x[..., :1000], block=2048)


def test_conv_time_sharded_long_ir_exact():
    """IR spans multiple time shards: multi-hop overlap-add halo must
    reconstruct the exact unsharded convolution (overlap_save.go:47,92
    history contract, distributed)."""
    from algodsp_tpu.parallel import conv_time_sharded
    from algodsp_tpu.conv import fftconvolve
    mesh = make_mesh({"channel": 2, "time": 4})
    rng = np.random.default_rng(12)
    n = 4096  # n_local = 1024
    ir = (rng.standard_normal(2500) * np.exp(-np.arange(2500) / 400.0))
    x = rng.standard_normal((4, n))
    y = np.asarray(conv_time_sharded(jnp.asarray(x, jnp.float64),
                                     ir, mesh))
    ref = np.asarray(fftconvolve(jnp.asarray(x, jnp.float64),
                                 jnp.asarray(ir))[..., :n])
    np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-9)


def test_conv_time_sharded_short_kernel():
    from algodsp_tpu.parallel import conv_time_sharded
    from algodsp_tpu.conv import fftconvolve
    mesh = make_mesh({"channel": 1, "time": 8})
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 2048))
    h = rng.standard_normal(33)
    y = np.asarray(conv_time_sharded(jnp.asarray(x, jnp.float64), h, mesh))
    ref = np.asarray(fftconvolve(jnp.asarray(x, jnp.float64),
                                 jnp.asarray(h))[..., :2048])
    np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-9)


def test_biquad_time_sharded_split_sections_exact():
    """Chains whose runtime sections differ from the logical SOS (the
    ill-conditioned real-pole split, linrec.condition_sos) must stay
    exact when time-sharded — regression: the sharded loop must iterate
    RUNTIME sections, matching chain._kernels indexing."""
    mesh = make_mesh({"channel": 2, "time": 4})
    # minimal splitting chain: the A-weighting 20.6 Hz double real pole
    # (the exact section class the split exists for) + one regular LP —
    # same regression, ~4x fewer runtime sections than the full
    # weighting chain, which dominated suite compile time at 330 s
    sos = np.stack([design.highpass(20.6, 0.5, 48000.0),
                    design.lowpass(2000.0, 0.7, 48000.0)])
    chain = BiquadChain(sos)
    assert chain.num_runtime_sections > chain.num_sections  # split occurred
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((4, 4096)), jnp.float32)
    y = np.asarray(biquad_time_sharded(x, chain, mesh))
    ref = np.asarray(chain.process(x, mode="blocked"))
    assert snr_db(ref, y) > 100


def test_channel_sharded_fused_fdl_shard_map(monkeypatch):
    """The fused Pallas FDL kernel composes with shard_map channel DP:
    each device runs the kernel (interpreted on CPU) on its channel
    shard; results match the unsharded bulk path."""
    from functools import partial
    from algodsp_tpu.conv import PartitionedConvolver
    from jax.sharding import PartitionSpec as P

    monkeypatch.setenv("ALGODSP_FDL_FUSED", "1")
    # 4 devices x 2 channels each: every shard runs the pair kernel
    mesh = make_mesh({"channel": 4}, devices=jax.devices()[:4])
    rng = np.random.default_rng(23)
    ir = (rng.standard_normal(3 * 1024) *
          np.exp(-np.arange(3 * 1024) / 700.0)).astype(np.float32)
    pc = PartitionedConvolver(ir, min_block_order=10)
    x = jnp.asarray(rng.standard_normal((8, 4096)), jnp.float32)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh
    # annotation, so the vma check must be off for kernels in shard_map
    @partial(jax.shard_map, mesh=mesh, in_specs=P("channel", None),
             out_specs=P("channel", None), check_vma=False)
    def sharded_conv(xs):
        return pc._process_bulk_fdl(xs, 10)

    y = np.asarray(jax.jit(sharded_conv)(x))
    monkeypatch.setenv("ALGODSP_FDL_FUSED", "0")
    want = np.asarray(pc._process_bulk_fdl(x, 10))
    assert snr_db(want, y) > 110


def test_channel_sharded_stft_mfcc_matches_single_device():
    """The STFT/mel/MFCC stack is channel-batched, so sharding the
    channel axis over the mesh gives identical results with no
    cross-channel communication (SURVEY.md §2.9 DP row)."""
    from algodsp_tpu.spectrum import stft, istft, mfcc
    mesh = make_mesh({"channel": 8})
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 8192)), jnp.float32)
    xs = jax.device_put(x, channel_sharding(mesh, 2))

    f = jax.jit(lambda v: istft(stft(v, 1024, 256), 256, length=8192))
    np.testing.assert_allclose(np.asarray(f(xs)), np.asarray(f(x)),
                               atol=1e-6)
    g = jax.jit(lambda v: mfcc(v, 48000.0, n_mfcc=13, n_mels=40,
                               frame_size=1024, hop_size=256))
    assert snr_db(np.asarray(g(x)), np.asarray(g(xs))) > 120


# ---------------------------------------------------------------------------
# Time-SP envelope / dynamics (SURVEY §2.9 SP/CP row: "IIR/envelope scan
# carries between neighbor shards")
# ---------------------------------------------------------------------------

def test_envelope_time_sharded_exact():
    """Selection-fixpoint carry == the plain sequential envelope scan,
    pure time-SP at 8 shards, nonzero initial carry."""
    from algodsp_tpu.parallel import envelope_time_sharded
    from algodsp_tpu.ops.envscan import envelope_scan
    mesh = make_mesh({"time": 8})
    rng = np.random.default_rng(7)
    t = jnp.asarray(np.abs(rng.standard_normal((4, 4096))))
    env0 = jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)))
    att, rel = 0.02, 0.995
    ef_ref, traj_ref = envelope_scan(t, env0, att, rel)
    ef, traj = envelope_time_sharded(t, env0, att, rel, mesh,
                                     channel_axis_name=None)
    assert snr_db(np.asarray(traj_ref), np.asarray(traj)) > 200
    assert snr_db(np.asarray(ef_ref), np.asarray(ef)) > 200


def test_envelope_time_sharded_channel_dp_mesh():
    """channel-DP x time-SP mesh: the psum'd convergence flag spans
    both axes."""
    from algodsp_tpu.parallel import envelope_time_sharded
    from algodsp_tpu.ops.envscan import envelope_scan
    mesh = make_mesh({"channel": 2, "time": 4})
    rng = np.random.default_rng(8)
    t = jnp.asarray(np.abs(rng.standard_normal((4, 2048))))
    _, traj_ref = envelope_scan(t, jnp.zeros((4,)), 0.1, 0.99)
    _, traj = envelope_time_sharded(t, jnp.zeros((4,)), 0.1, 0.99, mesh)
    assert snr_db(np.asarray(traj_ref), np.asarray(traj)) > 200


def test_onepole_time_sharded_exact():
    from algodsp_tpu.parallel import onepole_time_sharded
    mesh = make_mesh({"channel": 2, "time": 4})
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 2048)))
    s0 = jnp.asarray(rng.standard_normal(4))
    c = 0.015
    # sequential oracle
    ref = np.empty((4, 2048))
    s = np.asarray(s0).copy()
    for n in range(2048):
        s = (1 - c) * s + c * np.asarray(x[:, n])
        ref[:, n] = s
    s_f, y = onepole_time_sharded(x, s0, c, mesh)
    assert snr_db(ref, np.asarray(y)) > 200
    assert snr_db(ref[:, -1], np.asarray(s_f)) > 200


def test_box_rms_time_sharded_window_spans_shards():
    """RMS window (1440) larger than a time shard (512): multi-hop halo
    + history reads for the earliest shards."""
    from algodsp_tpu.parallel import box_rms_time_sharded
    mesh = make_mesh({"time": 8})
    rng = np.random.default_rng(10)
    w = 1440
    src = np.abs(rng.standard_normal((2, 8 * 512)))
    hist = rng.standard_normal((2, w - 1)) ** 2
    ext = np.concatenate([hist, src ** 2], axis=-1)
    csum = np.concatenate(
        [np.zeros((2, 1)), np.cumsum(ext, axis=-1)], axis=-1)
    n = src.shape[-1]
    hi = np.arange(w - 1, w - 1 + n) + 1
    ref = np.sqrt(np.maximum((csum[:, hi] - csum[:, hi - w]) / w, 0.0))
    got = box_rms_time_sharded(jnp.asarray(src), jnp.asarray(hist), w, mesh,
                               channel_axis_name=None)
    assert snr_db(ref, np.asarray(got)) > 200


@pytest.mark.parametrize("detector,prefilter", [
    ("peak", False), ("rms", True)], ids=["peak", "rms+prefilters"])
def test_compressor_time_sharded_matches_engine(detector, prefilter):
    """Full feedforward compressor, end-to-end time-SP (no channel-DP
    gather), peak and RMS+sidechain-prefilter variants, streaming state
    across two consecutive sharded calls. Reference contract:
    `dsp/effects/dynamics/core.go:274-495`."""
    from algodsp_tpu.parallel import compressor_time_sharded
    from algodsp_tpu.effects.dynamics import Compressor
    from algodsp_tpu.effects.dynamics.core import DetectorMode
    mesh = make_mesh({"channel": 2, "time": 4})
    kw = dict(threshold_db=-18.0, ratio=5.0, attack_ms=3.0, release_ms=80.0)
    if detector == "rms":
        kw.update(detector_mode=DetectorMode.RMS, rms_window_ms=10.0)
    if prefilter:
        kw.update(sidechain_low_cut_hz=80.0, sidechain_high_cut_hz=9000.0)
    comp = Compressor(48000.0, **kw)
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.standard_normal((4, 4096)) * 0.5)
    x2 = jnp.asarray(rng.standard_normal((4, 4096)) * 0.5)

    s_ref = comp.init_state((4,), jnp.float64)
    s_ref, r1 = comp.process(s_ref, x1)
    s_ref, r2 = comp.process(s_ref, x2)

    s = comp.init_state((4,), jnp.float64)
    s, y1 = compressor_time_sharded(comp, s, x1, mesh)
    s, y2 = compressor_time_sharded(comp, s, x2, mesh)
    assert snr_db(np.asarray(r1), np.asarray(y1)) > 200
    assert snr_db(np.asarray(r2), np.asarray(y2)) > 200


def test_compressor_time_sharded_rejects_feedback():
    from algodsp_tpu.parallel import compressor_time_sharded
    from algodsp_tpu.effects.dynamics import Compressor
    from algodsp_tpu.effects.dynamics.core import Topology
    mesh = make_mesh({"time": 8})
    comp = Compressor(48000.0, topology=Topology.FEEDBACK)
    s = comp.init_state((2,))
    with pytest.raises(ValueError):
        compressor_time_sharded(comp, s, jnp.zeros((2, 1024)), mesh)


def test_envelope_time_sharded_convergence_flag():
    """return_converged surfaces the fixpoint contract (review
    finding): True on ordinary material, and the trajectory still
    matches the sequential scan."""
    from algodsp_tpu.parallel import envelope_time_sharded
    from algodsp_tpu.ops.envscan import envelope_scan
    mesh = make_mesh({"time": 8})
    rng = np.random.default_rng(77)
    t = jnp.asarray(np.abs(rng.standard_normal((2, 2048))))
    ef, traj, ok = envelope_time_sharded(
        t, jnp.zeros((2,)), 0.05, 0.995, mesh, channel_axis_name=None,
        return_converged=True)
    assert bool(ok)
    _, ref = envelope_scan(t, jnp.zeros((2,)), 0.05, 0.995)
    assert snr_db(np.asarray(ref), np.asarray(traj)) > 200
