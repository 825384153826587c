"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the analog of the Go
reference's build-tag `purego` fallback testing, SURVEY.md §4) and with
float64 enabled so parity oracles can assert tight SNR bounds.

Must set env vars BEFORE jax is imported anywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers a TPU backend and forces the platform,
# so the env var alone is not enough — override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def snr_db(reference, test):
    """Signal-to-error ratio in dB between a golden reference and a test
    output — the parity metric (BASELINE.json: >=120 dB SNR)."""
    reference = np.asarray(reference, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    err = reference - test
    p_sig = np.sum(reference * reference)
    p_err = np.sum(err * err)
    if p_err == 0:
        return np.inf
    if p_sig == 0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_err)
