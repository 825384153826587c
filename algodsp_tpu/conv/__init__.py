from algodsp_tpu.conv.conv import (
    direct,
    direct_circular,
    convolve,
    fftconvolve,
    FFT_THRESHOLD,
)
from algodsp_tpu.conv.overlap import (
    OverlapAdd,
    OverlapSave,
    overlap_add_convolve,
    overlap_save_convolve,
)
from algodsp_tpu.conv.partitioned import PartitionedConvolver
from algodsp_tpu.conv.ltifold import (
    fold_chain_into_kernel,
    folded_convolver,
)
from algodsp_tpu.conv.correlate import (
    correlate,
    correlate_direct,
    correlate_fft,
    auto_correlate,
    auto_correlate_normalized,
    correlate_normalized,
    find_peak,
    lag_from_index,
    index_from_lag,
)
from algodsp_tpu.conv.deconvolve import (
    DeconvMethod,
    DeconvOptions,
    deconvolve,
    inverse_filter,
    snr,
)

__all__ = [
    "FFT_THRESHOLD",
    "OverlapAdd",
    "OverlapSave",
    "PartitionedConvolver",
    "auto_correlate",
    "auto_correlate_normalized",
    "convolve",
    "correlate",
    "correlate_direct",
    "correlate_fft",
    "correlate_normalized",
    "DeconvMethod",
    "DeconvOptions",
    "deconvolve",
    "direct",
    "direct_circular",
    "fftconvolve",
    "find_peak",
    "fold_chain_into_kernel",
    "folded_convolver",
    "index_from_lag",
    "inverse_filter",
    "lag_from_index",
    "overlap_add_convolve",
    "overlap_save_convolve",
    "snr",
]
