"""Bit-depth quantizer with dither and error-feedback noise shaping.

Capability parity with `dsp/dither/`: dither PDFs
None/Rect/TPDF/Gaussian/FastGaussian (`dither.go:8-27`,
`quantizer.go:137-170`), FIR error-feedback shaper (`shaper_fir.go`),
published FIR presets (E-weighted, F-weighted, Sony SBM, sharp-rolloff
families, `presets.go:84-186`), scaling/limiting conventions
(bitMul = 2^(bits-1) - 0.5, floor quantization, `quantizer.go:87-120`).

TPU-first: dither noise for the whole block is drawn up front with
`jax.random` (vectorized); the error-feedback loop is the only
sequential piece and runs as a `lax.scan` with the error history in the
carry (order <= 12), channels on VPU lanes.
"""

from __future__ import annotations

import enum
import math

import numpy as np
import jax
import jax.numpy as jnp


class DitherType(enum.Enum):
    NONE = "none"
    RECTANGULAR = "rectangular"
    TRIANGULAR = "triangular"
    GAUSSIAN = "gaussian"
    FAST_GAUSSIAN = "fast_gaussian"


class Preset(enum.Enum):
    NONE = "none"
    EFB = "efb"
    SC2 = "2sc"
    MEC2 = "2mec"
    MEC3 = "3mec"
    MEC9 = "9mec"
    IEC5 = "5iec"
    IEC9 = "9iec"
    FC3 = "3fc"
    FC9 = "9fc"
    SBM = "sbm"
    SBM_REDUCED = "sbm_reduced"
    SHARP_14K = "sharp14k"
    SHARP_15K = "sharp15k"
    SHARP_16K = "sharp16k"
    EXPERIMENTAL = "experimental"


# Published noise-shaping coefficient sets (presets.go:84-186;
# E-/F-weighted sets from Wannamaker/Lipshitz, SBM from Sony).
_PRESETS: dict[Preset, list[float]] = {
    Preset.NONE: [],
    Preset.EFB: [1.0],
    Preset.SC2: [1.0, -0.5],
    Preset.MEC2: [1.537, -0.8367],
    Preset.MEC3: [1.652, -1.049, 0.1382],
    Preset.MEC9: [1.662, -1.263, 0.4827, -0.2913, 0.1268,
                  -0.1124, 0.03252, -0.01265, -0.03524],
    Preset.IEC5: [2.033, -2.165, 1.959, -1.590, 0.6149],
    Preset.IEC9: [2.847, -4.685, 6.214, -7.184, 6.639,
                  -5.032, 3.263, -1.632, 0.4191],
    Preset.FC3: [1.623, -0.982, 0.109],
    Preset.FC9: [2.412, -3.370, 3.937, -4.174, 3.353,
                 -2.205, 1.281, -0.569, 0.0847],
    Preset.SBM: [1.47933, -1.59032, 1.64436, -1.36613, 0.926704,
                 -0.557931, 0.26786, -0.106726, 0.028516, 0.00123066,
                 -0.00616555, 0.003067],
    Preset.SBM_REDUCED: [1.47933, -1.59032, 1.64436, -1.36613, 0.926704,
                         -0.557931, 0.26786, -0.106726, 0.028516, 0.00123066],
    Preset.SHARP_14K: [1.62019206878484, -2.26551157411517, 2.50884415683988,
                       -2.25007947643775, 1.62160867255441, -0.899114621685913,
                       0.35350816625238],
    Preset.SHARP_15K: [1.34860378444905, -1.80123976889643, 2.04804746376671,
                       -1.93234174830592, 1.59264693241396, -1.04979311664936,
                       0.599422666305319, -0.213194268754789],
    Preset.SHARP_16K: [1.07618924753262, -1.41232919229157, 1.61374140100329,
                       -1.5996973679788, 1.42711666927426, -1.09986023030973,
                       0.750589080482029, -0.418709259968069, 0.185132272731155],
    Preset.EXPERIMENTAL: [1.2194769820734, -1.77912468394129, 2.18256539389233,
                          -2.33622087251503, 2.2010985277411, -1.81964871362306,
                          1.29830681491534, -0.767889385169331, 0.320990893363264],
}

_SHARP_BY_RATE = {
    40000.0: [0.919387305668676, -1.04843437730544, 1.04843048925451,
              -0.868972788711174, 0.60853001063849, -0.3449209471469,
              0.147484332561636, -0.0370652871194614],
    48000.0: [1.4247141061364, -1.5437678148854, 1.0967969510044,
              -0.32075758107035, -0.32074811729292, 0.525494723539046,
              -0.38058984415197, 0.14824460513256],
    64000.0: [2.49725554745212, -3.23587161287721, 2.31844946822861,
              -0.54326047010533, -0.54325301319653, 0.543289788745007,
              -0.142132484905, -0.0202120370327948],
    96000.0: [3.14014081409305, -3.76888037179035, 1.26107138314221,
              1.26088059917107, -0.807698715053922, -0.80767075968406,
              1.0101984930848, -0.322351688402064],
}


def preset_coefficients(p: Preset) -> np.ndarray:
    return np.asarray(_PRESETS[p], dtype=np.float64)


def sharp_preset_for_sample_rate(sample_rate: float) -> np.ndarray:
    """Rate-adaptive sharp 15 kHz set (`presets.go:183-205`)."""
    if sample_rate < 44100.0:
        return np.asarray(_SHARP_BY_RATE[40000.0])
    if sample_rate < 48000.0:
        return preset_coefficients(Preset.SHARP_15K)
    if sample_rate < 64000.0:
        return np.asarray(_SHARP_BY_RATE[48000.0])
    if sample_rate < 96000.0:
        return np.asarray(_SHARP_BY_RATE[64000.0])
    return np.asarray(_SHARP_BY_RATE[96000.0])


class Quantizer:
    """Dithering bit-depth reducer (`quantizer.go:31-132`)."""

    def __init__(self, sample_rate: float, *, bit_depth: int = 16,
                 dither_type: DitherType = DitherType.TRIANGULAR,
                 dither_amplitude: float = 1.0, limit: bool = True,
                 shaper_coeffs=None, preset: Preset = Preset.FC9,
                 iir_shelf_freq: float | None = None,
                 seed: int = 1):
        if sample_rate <= 0 or not math.isfinite(sample_rate):
            raise ValueError(f"dither: sample rate must be > 0: {sample_rate}")
        if not (1 <= bit_depth <= 32):
            raise ValueError(f"dither: bit depth must be in [1, 32]: {bit_depth}")
        self.sample_rate = sample_rate
        self.bit_depth = bit_depth
        self.dither_type = dither_type
        self.dither_amplitude = dither_amplitude
        self.limit = limit
        self.seed = seed
        # IIR shelf error-feedback shaper (`shaper_iir.go:20-57`): a
        # -5 dB Butterworth low-shelf biquad on the PREVIOUS error,
        # the lightweight alternative to the FIR shaper. Precedence
        # mirrors the Go options: explicit coefficients > shelf > preset.
        self.iir_shelf_sos: np.ndarray | None = None
        if iir_shelf_freq is not None and shaper_coeffs is None:
            if not (0.0 < iir_shelf_freq < sample_rate / 2.0) \
                    or not math.isfinite(iir_shelf_freq):
                # >= Nyquist would silently design an all-zero shelf
                # (rbj convention) and disable the shaping the caller
                # asked for — reject it instead
                raise ValueError(
                    f"dither: IIR shelf frequency must be in (0, Nyquist "
                    f"= {sample_rate / 2.0}): {iir_shelf_freq}")
            from algodsp_tpu.filters.design.rbj import low_shelf
            self.iir_shelf_sos = np.asarray(
                low_shelf(iir_shelf_freq, -5.0, 1.0 / math.sqrt(2.0),
                          sample_rate), np.float64).reshape(-1)
            shaper_coeffs = []
        if shaper_coeffs is None:
            shaper_coeffs = preset_coefficients(preset)
        self.shaper_coeffs = np.asarray(shaper_coeffs, dtype=np.float64).reshape(-1)
        self.bit_mul = 2.0 ** (bit_depth - 1) - 0.5
        self.bit_div = 1.0 / self.bit_mul
        self.limit_lo = -int(round(self.bit_mul + 0.5))
        self.limit_hi = int(round(self.bit_mul - 0.5))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        order = self.shaper_coeffs.size
        st = {"err": jnp.zeros(batch_shape + (max(order, 1),), dtype),
              "key": jax.random.PRNGKey(self.seed)}
        if self.iir_shelf_sos is not None:
            # DF2T shelf state (d0, d1) + the recorded previous error
            st["iir"] = jnp.zeros(batch_shape + (3,), dtype)
        return st

    def _noise(self, key, shape, dtype):
        t = self.dither_type
        amp = self.dither_amplitude
        if t == DitherType.NONE:
            return jnp.zeros(shape, dtype)
        if t == DitherType.RECTANGULAR:
            return amp * jax.random.uniform(key, shape, dtype, -1.0, 1.0)
        if t == DitherType.TRIANGULAR:
            k1, k2 = jax.random.split(key)
            return amp * (jax.random.uniform(k1, shape, dtype)
                          - jax.random.uniform(k2, shape, dtype))
        if t == DitherType.GAUSSIAN:
            return amp * jax.random.normal(key, shape, dtype)
        # fast gaussian: sum of 3 uniforms - 1.5 (quantizer.go:158-170 analog)
        k1, k2, k3 = jax.random.split(key, 3)
        u = (jax.random.uniform(k1, shape, dtype)
             + jax.random.uniform(k2, shape, dtype)
             + jax.random.uniform(k3, shape, dtype))
        return amp * (u - 1.5)

    def process(self, state, x):
        """(state, x in [-1,1]) -> (state, quantized float).

        Float output is `(code + 0.5) * bit_div` (`quantizer.go:118-120`).
        """
        state, q = self._process_codes(state, x)
        dtype = jnp.asarray(x).dtype
        return state, (q + 0.5) * jnp.asarray(self.bit_div, dtype)

    def process_integer(self, state, x):
        """(state, x in [-1,1]) -> (state, int32 codes in the bit-depth
        range) — `Quantizer.ProcessInteger` (`quantizer.go:95-114`)."""
        state, q = self._process_codes(state, x)
        return state, q.astype(jnp.int32)

    def _process_codes(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        order = self.shaper_coeffs.size
        key, sub = jax.random.split(state["key"])
        noise = self._noise(sub, x.shape, x.dtype)
        scaled = self.bit_mul * x

        if self.iir_shelf_sos is not None:
            return self._process_codes_iir(state, key, scaled, noise)

        if order == 0:
            q = jnp.floor(scaled + noise)
            if self.limit:
                q = jnp.clip(q, self.limit_lo, self.limit_hi)
            return ({"err": state["err"], "key": key}, q)

        coeffs = jnp.asarray(self.shaper_coeffs, x.dtype)
        seq = jnp.moveaxis(jnp.stack([scaled, noise], axis=-1), -2, 0)

        def step(hist, row):
            s, nz = row[..., 0], row[..., 1]
            shaped = s - jnp.einsum("k,...k->...", coeffs, hist,
                                    precision=jax.lax.Precision.HIGHEST)
            q = jnp.floor(shaped + nz)
            if self.limit:
                q = jnp.clip(q, self.limit_lo, self.limit_hi)
            err = q - shaped
            hist = jnp.concatenate([err[..., None], hist[..., :-1]], axis=-1)
            return hist, q

        hist, qs = jax.lax.scan(step, state["err"], seq)
        q = jnp.moveaxis(qs, 0, -1)
        return ({"err": hist, "key": key}, q)

    def _process_codes_iir(self, state, key, scaled, noise):
        """IIR shelf error-feedback loop (`shaper_iir.go:47-57` cycle):
        shaped_n = scaled_n - shelf(err_{n-1}); err_n = q_n - shaped_n,
        with the shelf the DF2T low-shelf biquad. One lax.scan with
        (d0, d1, last_err) in the carry, channels on VPU lanes."""
        dtype = scaled.dtype
        b0, b1, b2, a1, a2 = (jnp.asarray(v, dtype)
                              for v in self.iir_shelf_sos)
        seq = jnp.moveaxis(jnp.stack([scaled, noise], axis=-1), -2, 0)

        def step(carry, row):
            d0, d1, lerr = carry
            s, nz = row[..., 0], row[..., 1]
            # shelf filter on the previous error (section.go:47-53)
            fo = b0 * lerr + d0
            d0n = b1 * lerr - a1 * fo + d1
            d1n = b2 * lerr - a2 * fo
            shaped = s - fo
            q = jnp.floor(shaped + nz)
            if self.limit:
                q = jnp.clip(q, self.limit_lo, self.limit_hi)
            return (d0n, d1n, q - shaped), q

        iir = state["iir"]
        carry0 = (iir[..., 0], iir[..., 1], iir[..., 2])
        (d0, d1, lerr), qs = jax.lax.scan(step, carry0, seq)
        q = jnp.moveaxis(qs, 0, -1)
        new_state = dict(state)
        new_state["key"] = key
        new_state["iir"] = jnp.stack([d0, d1, lerr], axis=-1)
        return new_state, q
