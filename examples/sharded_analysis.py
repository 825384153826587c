"""Pod-scale channel-sharded measurement (BASELINE.json config 5).

Shards a 256-channel THD sweep analysis over a device mesh: each device
analyzes its channel shard fully on-device (batched FFT + harmonic
capture, `measure.thd.analyze_channels`), no cross-device traffic.
Runs on any device count — including a virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/sharded_analysis.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# designed for a (possibly virtual) device mesh; default to CPU so the
# 8-device XLA_FLAGS recipe in the docstring works out of the box
import os as _os
if _os.environ.get("ALGODSP_DEVICE", "cpu") != "tpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from algodsp_tpu.parallel import make_mesh
from algodsp_tpu.measure.thd import THDConfig, analyze_channels


def main():
    sr = 48000.0
    channels, n = 256, 1 << 14
    rng = np.random.default_rng(0)

    # per-channel test tones with 1% second-harmonic distortion injected
    freqs = 500.0 + 37.0 * np.arange(channels)
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * freqs[:, None] * t)
         + 0.01 * np.sin(2 * np.pi * 2 * freqs[:, None] * t))
    x = x.astype(np.float32)

    mesh = make_mesh()                  # all visible devices, axis "channel"
    sharding = NamedSharding(mesh, P("channel", None))
    xd = jax.device_put(jnp.asarray(x), sharding)

    cfg = THDConfig(sample_rate=sr)
    analyze = jax.jit(lambda a: analyze_channels(a, cfg, max_harmonics=8))
    res = analyze(xd)

    thds = np.asarray(res["thd"])
    print(f"devices: {len(mesh.devices.ravel())}, "
          f"channels/device: {channels // len(mesh.devices.ravel())}")
    print(f"mean measured THD: {thds.mean():.4f} (injected 0.0100)")
    print(f"max |THD - 0.01|: {np.abs(thds - 0.01).max():.2e}")


if __name__ == "__main__":
    main()
