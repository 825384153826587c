from algodsp_tpu.filters.biquad import BiquadChain, Section, sos_array
from algodsp_tpu.filters.fir import FIRFilter
from algodsp_tpu.filters.crossover import Crossover, MultiBand

__all__ = ["BiquadChain", "Crossover", "FIRFilter", "MultiBand",
           "Section", "sos_array"]
