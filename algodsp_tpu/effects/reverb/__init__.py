from algodsp_tpu.effects.reverb.freeverb import Freeverb
from algodsp_tpu.effects.reverb.fdn import FDNReverb
from algodsp_tpu.effects.reverb.convolution import ConvolutionReverb

__all__ = ["ConvolutionReverb", "FDNReverb", "Freeverb"]
