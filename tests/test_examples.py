"""Runnable examples execute end-to-end, with checked output where the
example declares it — the analog of the reference's `example_test.go`
files (51 runnable examples doubling as API documentation, checked via
`// Output:` blocks; SURVEY.md §4.5)."""

import importlib
import os
import sys

import pytest

EX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
EXAMPLES = ["spectrum_analysis", "mastering_chain", "room_measurement",
            "sharded_analysis", "dynamics_metering", "thd_measurement",
            "octave_analyzer", "goertzel_detect", "resampling", "loudness_meter",
            "crossover_multiband", "effect_chain_graph", "delay_estimation",
            "hilbert_envelope", "dither_mastering", "pitch_shift",
            "stereo_widening", "window_info", "moog_ladder",
            "biquad_runtime", "filter_designers", "signal_stats",
            "modulation_zoo", "reverb_comparison", "streaming_convolution",
            "spectrogram_mfcc", "lti_fusion", "precision_engineering",
            "gradient_eq_fit", "streaming_realtime", "streamed_sharded"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    sys.path.insert(0, EX_DIR)
    mod = importlib.import_module(name)
    if hasattr(mod, "main"):
        mod.main()
    out = capsys.readouterr().out
    assert len(out) > 0
    # checked-output contract: every line of a trailing `# Output:`
    # block must appear in the printed output
    with open(os.path.join(EX_DIR, name + ".py")) as fh:
        lines = fh.read().splitlines()
    if "# Output:" in lines:
        for expect in lines[lines.index("# Output:") + 1:]:
            if not expect.startswith("# "):
                break
            assert expect[2:] in out, f"missing output line: {expect[2:]!r}"
