from algodsp_tpu.filters.biquad import BiquadChain, Section, sos_array

__all__ = ["BiquadChain", "Section", "sos_array"]
