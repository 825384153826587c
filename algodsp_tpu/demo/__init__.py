from algodsp_tpu.demo.engine import Engine, Waveform, EQBand

__all__ = ["EQBand", "Engine", "Waveform"]
