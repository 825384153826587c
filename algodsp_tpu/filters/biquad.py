"""Biquad sections and cascades — blocked-scan runtime.

Capability parity with `dsp/filter/biquad/` (Section, Chain, response,
pole/zero): second-order sections with a0-normalized coefficients
(`section.go:19-22`), cascaded processing with input gain
(`chain.go:59-72`), coefficient hot-swap preserving state
(`chain.go:99-114`), explicit State/SetState (`chain.go:122-137`),
complex frequency response and closed-form |H|^2 (`response.go:10-75`),
impulse response extraction (`response.go:77`), and pole/zero factoring
(`polezero.go:15-80`).

TPU-first runtime: instead of the reference's per-sample SIMD dispatch
(`section.go:56-81` + arch registry), each section runs as an exact
blocked recurrence — FIR drive (parallel) + lower-triangular Toeplitz
matmul on the MXU + log-depth carry scan. See `ops/linrec.py`.

Coefficient layout: an SOS array of shape (S, 5) float64 —
[b0, b1, b2, a1, a2] per section, a0 normalized to 1.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.ops import linrec


def sos_array(sections) -> np.ndarray:
    """Normalize input to an (S, 5) float64 SOS array.

    Accepts one (5,) section, a list of sections, or an (S, 5) array.
    """
    a = np.asarray(sections, dtype=np.float64)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim != 2 or a.shape[1] != 5:
        raise ValueError(f"sos must have shape (S, 5), got {a.shape}")
    return a


class BiquadChain:
    """Ordered cascade of biquad sections (the reference's `Chain`).

    Pure-functional runtime: `process` is one-shot from zero state;
    `init_state`/`process_stream` thread explicit state for block
    streaming. Both are jit-able; leading batch/channel dims broadcast.
    """

    def __init__(self, sos, *, gain: float = 1.0,
                 block_size: int = linrec.DEFAULT_BLOCK,
                 condition: bool = True):
        self.sos = sos_array(sos)
        self.gain = float(gain)
        self.block_size = int(block_size)
        self._condition = bool(condition)
        # Runtime coefficients: ill-conditioned real-pole sections are
        # split into first-order pairs so the blocked algebra stays
        # accurate in f32 (see linrec.condition_sos). `self.sos` keeps
        # the logical sections for response/introspection; streaming
        # state is shaped by the runtime sections.
        self.runtime_sos = (linrec.condition_sos(self.sos, self.block_size)
                            if condition else self.sos)
        self._kernels = linrec.ar2_kernels(self.runtime_sos[:, 3],
                                           self.runtime_sos[:, 4],
                                           self.block_size)
        # Residual decomposition flags for the blocked engine: sections
        # where H = b0 + (B - b0*A)/A keeps intermediates near the
        # output scale (complex poles near z=1 with HP-like zeros, e.g.
        # low-frequency rumble filters, lose 30-50 dB to Toeplitz/carry
        # cancellation otherwise; condition_sos only covers real poles).
        self._residual = linrec.residual_flags(self.runtime_sos,
                                               self.block_size)
        # Slow complex poles: the sequential DF2T forms (Pallas kernel,
        # fold stitching) lose 30-50 dB on these; auto dispatch keeps
        # such chains on the modal-basis blocked/cascade engines.
        self._has_slow_poles = bool(np.any(self._kernels.modal))

    # -- introspection (chain.go:102-137) --------------------------------
    @property
    def num_sections(self) -> int:
        return self.sos.shape[0]

    @property
    def num_runtime_sections(self) -> int:
        """Sections actually executed (>= num_sections when conditioning
        split real-pole sections; see linrec.condition_sos)."""
        return self.runtime_sos.shape[0]

    @property
    def order(self) -> int:
        return 2 * self.sos.shape[0]

    def update_coefficients(self, sos, gain: float | None = None) -> "BiquadChain":
        """Return a new chain with swapped coefficients. State objects
        remain valid when the RUNTIME section count is unchanged — the
        analog of the reference's state-preserving hot swap
        (`chain.go:99-114`); `process_stream` rejects a stale state
        whose section count no longer matches. Conditioning mode is
        preserved."""
        return BiquadChain(sos, gain=self.gain if gain is None else gain,
                           block_size=self.block_size,
                           condition=self._condition)

    # -- state ------------------------------------------------------------
    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        """Streaming state (..., S, 4): per section
        (x_{n-1}, x_{n-2}, y_{n-1}, y_{n-2}) in the direct-form basis —
        the same information as the reference's DF2T (d0, d1)."""
        return jnp.zeros(batch_shape + (self.num_runtime_sections, 4),
                         dtype=dtype)

    # -- processing -------------------------------------------------------
    def _run(self, x, state, *, mode: str):
        x = jnp.asarray(x)
        n = x.shape[-1]
        if self.gain != 1.0:
            x = x * jnp.asarray(self.gain, x.dtype)

        b = self.block_size
        pad = (-n) % b if mode == "blocked" else 0
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)

        new_states = []
        for s in range(self.num_runtime_sections):
            b0, b1, b2, a1, a2 = self.runtime_sos[s]
            st = state[..., s, :]
            x_in = x
            if mode == "blocked" and self._residual[s]:
                # v = y - b0*x obeys the same AR recurrence driven by the
                # residual FIR (0, b1-a1*b0, b2-a2*b0) — exact, and the
                # tiny drive keeps |L @ f| ~ |y| instead of ~peak(h)*|x|
                e1, e2 = b1 - a1 * b0, b2 - a2 * b0
                f = linrec.fir3(x, jnp.asarray(0.0, x.dtype),
                                jnp.asarray(e1, x.dtype),
                                jnp.asarray(e2, x.dtype),
                                st[..., 0], st[..., 1])
                b0j = jnp.asarray(b0, x.dtype)
                v = linrec.ar2_apply_blocked(
                    f, self._kernels, s,
                    st[..., 2] - b0j * st[..., 0],
                    st[..., 3] - b0j * st[..., 1])
                y = b0j * x + v
            else:
                f = linrec.fir3(x, jnp.asarray(b0, x.dtype),
                                jnp.asarray(b1, x.dtype),
                                jnp.asarray(b2, x.dtype),
                                st[..., 0], st[..., 1])
                if mode == "blocked":
                    y = linrec.ar2_apply_blocked(f, self._kernels, s,
                                                 st[..., 2], st[..., 3])
                else:
                    y = linrec.ar2_apply_scan(f, a1, a2,
                                              st[..., 2], st[..., 3])
            # carry-out from the true (unpadded) sample positions
            if n >= 2:
                ns = jnp.stack([x_in[..., n - 1], x_in[..., n - 2],
                                y[..., n - 1], y[..., n - 2]], axis=-1)
            else:
                ns = jnp.stack([x_in[..., n - 1], st[..., 0],
                                y[..., n - 1], st[..., 2]], axis=-1)
            new_states.append(ns)
            x = y

        y_out = x[..., :n] if pad else x
        return jnp.stack(new_states, axis=-2), y_out

    def _pick_folds(self, channels: int, n: int) -> int:
        """Largest fold factor F such that C*F <= 128 lanes, N % F == 0,
        and the fold length stays a block-size multiple."""
        f = max(128 // max(channels, 1), 1)
        while f > 1 and (n % f or (n // f) % self.block_size):
            f //= 2
        return f

    @property
    def has_slow_poles(self) -> bool:
        """True when a section's poles are slow enough (complex pair
        whose within-block all-pole response peaks above 4 — in
        practice HP/shelf/peak corners below ~150 Hz at 48 kHz) that
        the blocked engines carry them in the modal basis. These are
        exactly the configs whose f32 accuracy sits at 86-115 dB
        instead of the reference's >=120 dB bar (BENCHMARKS.md
        Accuracy table); pass `exact=True` to `process` for the opt-in
        >=120 dB path."""
        return self._has_slow_poles

    def process(self, x, *, mode: str = "auto", exact: bool = False):
        """One-shot filtering from zero state (`chain.go:74-85`).

        mode: "auto" picks, on TPU for 2-D (C, N) inputs, either the
        fused Pallas cascade kernel (C >= 64: channels fill the lanes)
        or the whole-cascade block engine (`ops/cascade.py`: one
        Toeplitz matmul for all S sections, ~S times fewer MACs than
        per-section blocking — the fastest few-channel path), and the
        blocked XLA engine elsewhere; "blocked", "scan", "pallas",
        "folded", and "cascade" force a specific backend — the dispatch
        analog of the reference's arch registry (`section.go:56-81`).

        exact: opt-in >=120 dB escape hatch for slow-pole filters
        (`has_slow_poles`): the selected engine evaluates internally in
        float64 and the result is cast back to x.dtype (>=148 dB vs the
        f64 oracle on the 60-120 Hz HP/shelf/peak class; measured in
        tests/test_precision.py). Carry-only widening was measured
        insufficient — the loss lives in the f32 Toeplitz term's
        peak(h)-sized cancellation, so the whole evaluation widens.
        Requires jax_enable_x64; f64 matmuls are emulated on TPU
        (~10x runtime, and the emulated-f64 codegen compiles slowly —
        ~100 s first call on a v5e), which is the documented price of
        the last ~30 dB. Measured on-device: hp60_o4 90.0 -> 148.5 dB.
        The default path is unchanged.
        """
        import jax
        x = jnp.asarray(x)
        if exact:
            # validate + resolve the mode BEFORE any shortcut, so the
            # f64 fast path can never fall into the f32-only engines
            if mode in ("pallas", "folded"):
                raise ValueError(
                    "exact=True runs on the XLA engines; use mode "
                    "'auto', 'blocked', 'cascade', or 'scan'")
            if not jax.config.jax_enable_x64:
                raise ValueError(
                    "process(exact=True) needs jax.config.update("
                    "'jax_enable_x64', True) — without it JAX silently "
                    "truncates the f64 evaluation back to f32")
            if mode == "auto":
                mode = "cascade" if x.shape[-1] % self.block_size == 0 \
                    else "blocked"
            if jnp.dtype(x.dtype) == jnp.float64:
                return self.process(x, mode=mode)
            y = self.process(x.astype(jnp.float64), mode=mode)
            return y.astype(x.dtype)
        if mode == "auto":
            if jax.default_backend() == "tpu" and x.ndim == 2 \
                    and self.block_size == 128:
                if x.shape[0] >= 64 and not self._has_slow_poles:
                    mode = "pallas"
                elif (x.shape[1] % self.block_size == 0
                      and (self.num_runtime_sections >= 2
                           or self._has_slow_poles)):
                    mode = "cascade"
                elif (self._pick_folds(*x.shape) > 1 and x.shape[1] >= 4096
                      and not self._has_slow_poles):
                    mode = "folded"
                else:
                    mode = "blocked"
            else:
                mode = "blocked"
        if mode == "pallas":
            from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas
            return biquad_cascade_pallas(x, self.runtime_sos, gain=self.gain)
        if mode == "folded":
            return self.process_folded(x)
        if mode == "cascade":
            return self.process_cascade(x)
        state = self.init_state(x.shape[:-1], dtype=x.dtype)
        _, y = self._run(x, state, mode=mode)
        return y

    def process_cascade(self, x, state=None, return_state: bool = False):
        """Whole-cascade block engine (`ops/cascade.py`): the entire
        SOS cascade closed per block by one Toeplitz matmul plus
        compact-state carry sweeps. Exact (same recurrence, different
        evaluation order); threads the standard (…, S, 4) streaming
        state when given.

        Long one-shot calls use an internal 256-sample block (SOS
        re-conditioned at that length): the carry-sweep passes over the
        (K, d) state array are HBM-bound, so halving K beats the extra
        Toeplitz MACs — measured 15.4 -> 12.9 ms for 15 sections at
        8ch x 2^24 on a v5e chip. Streaming calls keep `block_size`
        (the state layout is tied to its conditioning split)."""
        from algodsp_tpu.ops import cascade as cascmod
        x = jnp.asarray(x)
        # the input gain is folded into the engine's precomputed weights
        # (no scaled copy of x — a full HBM round trip at bulk sizes)
        if (state is None and not return_state and self.block_size == 128
                and x.shape[-1] % 256 == 0 and x.shape[-1] >= (1 << 16)):
            if not hasattr(self, "_sos_bulk256"):
                self._sos_bulk256 = (linrec.condition_sos(self.sos, 256)
                                     if self._condition else self.sos)
            return cascmod.cascade_apply_blocked(
                x, self._sos_bulk256, block=256, gain=self.gain)
        s0 = None if state is None else cascmod.chain_state_to_compact(
            jnp.asarray(state, x.dtype))
        out = cascmod.cascade_apply_blocked(
            x, self.runtime_sos, block=self.block_size, s0=s0,
            return_state=return_state, gain=self.gain)
        if return_state:
            y, s_fin = out
            return y, cascmod.compact_state_to_chain(
                s_fin, self.num_runtime_sections)
        return out

    def process_folded(self, x, folds: int | None = None, state=None,
                       return_state: bool = False):
        """Lane-packed fused-cascade processing for few-channel inputs.

        Reshapes (C, N) -> (C*F, N/F) so the Pallas kernel fills all
        128 lanes, runs every fold with zero initial conditions, then
        adds the exact linear correction for each fold's true entry
        state (see `ops/fold.py`). Identical output to `process`
        (LTI superposition), at full lane utilization.

        state/return_state thread the standard (C, S, 4) streaming
        state, so this is also a valid `process_stream` backend.

        The zero-state bulk case carries a custom VJP (the composite
        map is the exact causal LTI cascade, so the adjoint is the
        same folded evaluation on the time-reversed cotangent):
        differentiable w.r.t. x through the Pallas kernel.
        """
        x = jnp.asarray(x)
        if x.ndim != 2:
            raise ValueError("process_folded expects (C, N)")
        c, n = x.shape
        if folds is None:
            folds = self._pick_folds(c, n)
        if state is None and not return_state:
            return self._folded_diff_op(int(folds))(x)
        return self._process_folded_raw(x, folds, state, return_state)

    def _folded_diff_op(self, folds: int):
        cache = self.__dict__.setdefault("_folded_vjp_cache", {})
        op = cache.get(folds)
        if op is None:
            import jax

            @jax.custom_vjp
            def op(x):
                return self._process_folded_raw(x, folds, None, False)

            def fwd(x):
                return self._process_folded_raw(x, folds, None, False), None

            def bwd(_, g):
                return (jnp.flip(self._process_folded_raw(
                    jnp.flip(g, -1), folds, None, False), -1),)

            op.defvjp(fwd, bwd)
            cache[folds] = op
        return op

    def _process_folded_raw(self, x, folds, state, return_state):
        from algodsp_tpu.ops import fold as foldmod
        from algodsp_tpu.ops.pallas_kernels import biquad_cascade_pallas

        c, n = x.shape
        if n % folds or (n // folds) % self.block_size:
            raise ValueError(
                f"folds={folds} needs N divisible by folds*{self.block_size}")
        nf = n // folds
        d = 4 * self.num_runtime_sections

        if self.gain != 1.0:
            x = x * jnp.asarray(self.gain, x.dtype)
        if folds == 1:
            y, new_state = biquad_cascade_pallas(
                x, self.runtime_sos, state=state, return_state=True)
            return (y, new_state) if return_state else y

        xf = x.reshape(c * folds, nf)
        y0, wstate = biquad_cascade_pallas(xf, self.runtime_sos,
                                           return_state=True)
        w = wstate.reshape(c, folds, d)

        T, D, V, Vinv, modal = foldmod.cascade_transfer_modal(
            self.runtime_sos, nf)
        s_init = (jnp.zeros((c, d), x.dtype) if state is None
                  else jnp.asarray(state, x.dtype).reshape(c, d))
        if modal:  # carry fold states in the well-conditioned basis
            import jax as _jax
            mmv = lambda M, v: jnp.einsum("...d,ed->...e", v,
                                          jnp.asarray(M, x.dtype),
                                          preferred_element_type=x.dtype,
                                          precision=_jax.lax.Precision.HIGHEST)
            w = mmv(Vinv, w)
            s_init = mmv(Vinv, s_init)
        entries, s_final = foldmod.propagate_fold_states(T, w, s_init)
        y = y0.reshape(c, folds, nf) + foldmod.fold_correction(entries, D)
        y = y.reshape(c, n)
        if return_state:
            if modal:
                s_final = mmv(V, s_final)
            return y, s_final.reshape(c, self.num_runtime_sections, 4)
        return y

    def process_stream(self, state, x, *, mode: str = "auto"):
        """Streaming block processing: (state, x) -> (state, y).

        mode "auto" routes whole-block streams through the
        whole-cascade engine on TPU (exact, same state basis) and the
        per-section blocked engine elsewhere."""
        import jax
        x = jnp.asarray(x)
        state = jnp.asarray(state)
        if state.shape[-2:] != (self.num_runtime_sections, 4):
            raise ValueError(
                f"biquad: state has {state.shape[-2:]} trailing dims, chain "
                f"needs ({self.num_runtime_sections}, 4) — after a "
                f"coefficient hot-swap the runtime section count must "
                f"match (chain.go:99-114 contract)")
        if mode == "auto":
            if (jax.default_backend() == "tpu" and self.block_size == 128
                    and x.shape[-1] % self.block_size == 0
                    and self.num_runtime_sections >= 2):
                mode = "cascade"
            else:
                mode = "blocked"
        if mode == "cascade":
            y, st = self.process_cascade(x, state=state, return_state=True)
            return st, y
        return self._run(x, state, mode=mode)

    # -- analysis (host-side float64) ------------------------------------
    def response(self, freqs, sample_rate: float) -> np.ndarray:
        """Complex frequency response of the full cascade × gain
        (`response.go:10-23` per section, chained)."""
        return self.gain * sos_response(self.sos, freqs, sample_rate)

    def magnitude_db(self, freqs, sample_rate: float) -> np.ndarray:
        mag = np.abs(self.response(freqs, sample_rate))
        with np.errstate(divide="ignore"):
            return 20.0 * np.log10(mag)

    def impulse_response(self, n: int, dtype=jnp.float64) -> np.ndarray:
        """First n samples of the impulse response (`response.go:77-97`)."""
        x = jnp.zeros((n,), dtype=dtype).at[0].set(1.0)
        return np.asarray(self.process(x, mode="scan" if n < 256 else "blocked"))


class Section(BiquadChain):
    """Single biquad section (the reference's `Section`)."""

    def __init__(self, b0, b1, b2, a1, a2, **kwargs):
        super().__init__([[b0, b1, b2, a1, a2]], **kwargs)


# ---------------------------------------------------------------------------
# Response / pole-zero math (host-side float64 NumPy)
# ---------------------------------------------------------------------------

def sos_response(sos, freqs, sample_rate: float) -> np.ndarray:
    """Complex response of an SOS cascade at freqs (Hz).

    H(z) = prod_s (b0 + b1 z^-1 + b2 z^-2) / (1 + a1 z^-1 + a2 z^-2)
    evaluated at z = e^{j w}, w = 2*pi*f/sr (`response.go:10-23`).
    """
    sos = sos_array(sos)
    f = np.atleast_1d(np.asarray(freqs, dtype=np.float64))
    z1 = np.exp(-1j * 2.0 * np.pi * f / sample_rate)  # z^-1
    z2 = z1 * z1
    h = np.ones_like(z1, dtype=np.complex128)
    for b0, b1, b2, a1, a2 in sos:
        h *= (b0 + b1 * z1 + b2 * z2) / (1.0 + a1 * z1 + a2 * z2)
    return h


def magnitude_squared(sos, freqs, sample_rate: float) -> np.ndarray:
    """Closed-form |H|^2 (`response.go:25-75`): per section

      |H|^2 = (b0^2+b1^2+b2^2 + 2(b0 b1 + b1 b2) cos w + 2 b0 b2 cos 2w)
            / (1 + a1^2 + a2^2 + 2(a1 + a1 a2) cos w + 2 a2 cos 2w)
    """
    sos = sos_array(sos)
    f = np.atleast_1d(np.asarray(freqs, dtype=np.float64))
    w = 2.0 * np.pi * f / sample_rate
    cw = np.cos(w)
    c2w = np.cos(2.0 * w)
    out = np.ones_like(f)
    for b0, b1, b2, a1, a2 in sos:
        num = (b0 * b0 + b1 * b1 + b2 * b2
               + 2.0 * (b0 * b1 + b1 * b2) * cw + 2.0 * b0 * b2 * c2w)
        den = (1.0 + a1 * a1 + a2 * a2
               + 2.0 * (a1 + a1 * a2) * cw + 2.0 * a2 * c2w)
        out *= num / den
    return out


def poles_zeros(section) -> tuple[np.ndarray, np.ndarray]:
    """Poles and zeros of one section (`polezero.go:15-80`).

    Returns (zeros, poles) as complex arrays (length <= 2 each).
    """
    b0, b1, b2, a1, a2 = np.asarray(section, dtype=np.float64).reshape(5)
    zeros = np.roots([b0, b1, b2]) if b0 != 0 else (
        np.roots([b1, b2]) if b1 != 0 else np.array([]))
    poles = np.roots([1.0, a1, a2])
    return np.atleast_1d(zeros).astype(np.complex128), poles.astype(np.complex128)


def is_stable(sos) -> bool:
    """True if every section's poles are strictly inside the unit circle."""
    sos = sos_array(sos)
    for row in sos:
        _, poles = poles_zeros(row)
        if np.any(np.abs(poles) >= 1.0):
            return False
    return True
