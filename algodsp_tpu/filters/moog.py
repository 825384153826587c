"""Nonlinear Moog ladder filter — 6 variants.

Capability parity with `dsp/filter/moog/moog.go`: Classic (exact tanh,
DAV_DspFilterMoog.pas topology), ClassicLightweight (polynomial tanh),
ImprovedClassic(±Lightweight) (stage coefficient scaled by 2*Vt),
Huovilainen (cutoff/resonance polynomial compensation + half-sample
feedback, optional oversampling), and ZDF (Zavalishin TPT with
fixed-iteration Newton-Raphson, D'Angelo & Välimäki nonlinearity).

The ladder is a per-sample nonlinear feedback recurrence, so it runs as
a fused Pallas VMEM kernel on TPU (channels on the 128-lane axis,
bit-exact vs the `lax.scan` fallback); the ZDF Newton loop is a fixed
unrolled iteration inside the scan step (XLA-friendly static control
flow, SURVEY.md §7 M3).
"""

from __future__ import annotations

import enum
import math

import numpy as np
import jax
import jax.numpy as jnp

STATE_LIMIT = 32.0


class MoogVariant(enum.Enum):
    CLASSIC = "classic"
    CLASSIC_LIGHTWEIGHT = "classic_lightweight"
    IMPROVED_CLASSIC = "improved_classic"
    IMPROVED_CLASSIC_LIGHTWEIGHT = "improved_classic_lightweight"
    HUOVILAINEN = "huovilainen"
    ZDF = "zdf"


def _fast_tanh(x):
    x2 = x * x
    return jnp.where(x > 3, 1.0,
                     jnp.where(x < -3, -1.0,
                               jnp.clip(x * (27 + x2) / (27 + 9 * x2), -1, 1)))


def _clip_state(x):
    return jnp.clip(x, -STATE_LIMIT, STATE_LIMIT)


class MoogFilter:
    def __init__(self, sample_rate: float, *,
                 variant: MoogVariant = MoogVariant.CLASSIC,
                 cutoff_hz: float = 1000.0, resonance: float = 0.8,
                 drive: float = 1.0, input_gain: float = 1.0,
                 output_gain: float = 1.0, thermal_voltage: float = 5.0,
                 oversampling: int = 1, newton_iters: int = 4,
                 normalize_output: bool = False):
        if sample_rate <= 0:
            raise ValueError("moog: sample rate must be > 0")
        if not (1.0 <= cutoff_hz < sample_rate / 2):
            raise ValueError(f"moog: cutoff must be in [1, Nyquist): {cutoff_hz}")
        if not (0.0 <= resonance <= 4.0):
            raise ValueError(f"moog: resonance must be in [0, 4]: {resonance}")
        if not (0.1 <= drive <= 24.0):
            raise ValueError(f"moog: drive must be in [0.1, 24]: {drive}")
        if not (1 <= newton_iters <= 8):
            raise ValueError(f"moog: newton iters must be in [1, 8]: {newton_iters}")
        if oversampling < 1:
            raise ValueError("moog: oversampling must be >= 1")
        self.sample_rate = sample_rate
        self.variant = variant
        self.cutoff_hz = cutoff_hz
        self.resonance = resonance
        self.drive = drive
        self.input_gain = input_gain
        self.output_gain = output_gain
        self.thermal_voltage = thermal_voltage
        self.oversampling = oversampling
        self.newton_iters = newton_iters
        self.normalize_output = normalize_output
        self._rebuild()

    def _rebuild(self):
        """Coefficient derivation (`moog.go:800-853`)."""
        eff_sr = self.sample_rate * self.oversampling
        fc = self.cutoff_hz / eff_sr
        vt = self.thermal_voltage
        self.drive_scale = 0.5 * self.drive / vt
        self.feedback = self.resonance
        self.coefficient = 2 * vt * (1 - math.exp(-2 * math.pi * fc))
        if self.variant == MoogVariant.HUOVILAINEN:
            fcr = max(1.8730 * fc ** 3 + 0.4955 * fc * fc - 0.6490 * fc + 0.9988, 0.0)
            self.coefficient = 2 * vt * (1 - math.exp(-2 * math.pi * fcr * fc))
            comp = max(-3.9364 * fc * fc + 1.8409 * fc + 0.9968, 0.0)
            self.feedback = self.resonance * comp
        elif self.variant == MoogVariant.ZDF:
            self.zdf_g = math.tan(math.pi * fc)
            self.zdf_gk = self.zdf_g / (1 + self.zdf_g)
        legacy = 10.0 ** (self.resonance / 20.0)
        norm = 1.0 / (1 + 0.5 * self.resonance) if self.normalize_output else 1.0
        self.output_scale = self.output_gain * legacy * legacy * norm

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"stage": jnp.zeros(batch_shape + (4,), dtype),
                "tanh_last": jnp.zeros(batch_shape + (3,), dtype),
                "prev_out": jnp.zeros(batch_shape, dtype)}

    def _step_classic(self, st, xv, tanh_fn, improved: bool):
        stage, tl, prev = st["stage"], st["tanh_last"], st["prev_out"]
        coef = self.coefficient * (2 * self.thermal_voltage if improved else 1.0)
        ds = self.drive_scale
        u = xv * self.input_gain - self.feedback * stage[..., 3]
        t_in = tanh_fn(ds * u)
        s0 = _clip_state(stage[..., 0] + coef * (t_in - tl[..., 0]))
        t0 = tanh_fn(ds * s0)
        s1 = _clip_state(stage[..., 1] + coef * (t0 - tl[..., 1]))
        t1 = tanh_fn(ds * s1)
        s2 = _clip_state(stage[..., 2] + coef * (t1 - tl[..., 2]))
        t2 = tanh_fn(ds * s2)
        s3 = _clip_state(stage[..., 3] + coef * (t2 - tanh_fn(ds * stage[..., 3])))
        new = {"stage": jnp.stack([s0, s1, s2, s3], axis=-1),
               "tanh_last": jnp.stack([t0, t1, t2], axis=-1),
               "prev_out": s3}
        return new, self.output_scale * s3

    def _step_huovilainen(self, st, xv):
        stage, prev = st["stage"], st["prev_out"]
        ds, g = self.drive_scale, self.coefficient
        fb = 0.5 * (stage[..., 3] + prev)
        u = xv * self.input_gain - self.feedback * fb
        t_in = jnp.tanh(ds * u)
        tS = jnp.tanh(ds * stage)
        s0 = _clip_state(stage[..., 0] + g * (t_in - tS[..., 0]))
        t0 = jnp.tanh(ds * s0)
        s1 = _clip_state(stage[..., 1] + g * (t0 - tS[..., 1]))
        t1 = jnp.tanh(ds * s1)
        s2 = _clip_state(stage[..., 2] + g * (t1 - tS[..., 2]))
        t2 = jnp.tanh(ds * s2)
        s3 = _clip_state(stage[..., 3] + g * (t2 - tS[..., 3]))
        new = {"stage": jnp.stack([s0, s1, s2, s3], axis=-1),
               "tanh_last": jnp.stack([t0, t1, t2], axis=-1),
               "prev_out": s3}
        return new, self.output_scale * s3

    def _step_zdf(self, st, xv):
        stage, prev = st["stage"], st["prev_out"]
        gk, shape, k = self.zdf_gk, self.drive_scale, self.feedback
        v_scale = gk / shape
        inp = xv * self.input_gain
        s = [stage[..., i] for i in range(4)]
        tS = [jnp.tanh(shape * si) for si in s]

        def ladder(y3est):
            u = inp - k * y3est
            tU = jnp.tanh(shape * u)
            v0 = v_scale * (tU - tS[0]); y0 = v0 + s[0]
            d0 = gk * (1 - tU * tU)
            tY0 = jnp.tanh(shape * y0)
            v1 = v_scale * (tY0 - tS[1]); y1 = v1 + s[1]
            d1 = gk * (1 - tY0 * tY0)
            tY1 = jnp.tanh(shape * y1)
            v2 = v_scale * (tY1 - tS[2]); y2 = v2 + s[2]
            d2 = gk * (1 - tY1 * tY1)
            tY2 = jnp.tanh(shape * y2)
            v3 = v_scale * (tY2 - tS[3]); y3 = v3 + s[3]
            d3 = gk * (1 - tY2 * tY2)
            return (v0, v1, v2, v3), y3, d0 * d1 * d2 * d3

        y3est = prev
        for _ in range(self.newton_iters):
            _, y3, dprod = ladder(y3est)
            residual = y3 - y3est
            J = dprod * (-k) - 1.0
            y3est = jnp.where(jnp.abs(J) < 1e-15, y3est,
                              y3est - residual / jnp.where(jnp.abs(J) < 1e-15,
                                                           1.0, J))
        (v0, v1, v2, v3), y3, _ = ladder(y3est)
        new = {"stage": jnp.stack([_clip_state(s[0] + 2 * v0),
                                   _clip_state(s[1] + 2 * v1),
                                   _clip_state(s[2] + 2 * v2),
                                   _clip_state(s[3] + 2 * v3)], axis=-1),
               "tanh_last": st["tanh_last"],
               "prev_out": y3}
        return new, self.output_scale * y3

    def _step(self, st, xv):
        v = self.variant
        if v == MoogVariant.CLASSIC:
            return self._step_classic(st, xv, jnp.tanh, False)
        if v == MoogVariant.CLASSIC_LIGHTWEIGHT:
            return self._step_classic(st, xv, _fast_tanh, False)
        if v == MoogVariant.IMPROVED_CLASSIC:
            return self._step_classic(st, xv, jnp.tanh, True)
        if v == MoogVariant.IMPROVED_CLASSIC_LIGHTWEIGHT:
            return self._step_classic(st, xv, _fast_tanh, True)
        if v == MoogVariant.HUOVILAINEN:
            return self._step_huovilainen(st, xv)
        return self._step_zdf(st, xv)

    def _run_scan(self, state, x_run):
        xs = jnp.moveaxis(x_run, -1, 0)
        state, ys = jax.lax.scan(lambda st, xv: self._step(st, xv), state, xs)
        return state, jnp.moveaxis(ys, 0, -1)

    def _kernel_chunk(self, state, xb):
        """One full-chunk pass through the fused Pallas ladder kernel
        (dict state in/out)."""
        from algodsp_tpu.ops import pallas_kernels as pk
        v = self.variant
        improved = v in (MoogVariant.IMPROVED_CLASSIC,
                         MoogVariant.IMPROVED_CLASSIC_LIGHTWEIGHT)
        fast = v in (MoogVariant.CLASSIC_LIGHTWEIGHT,
                     MoogVariant.IMPROVED_CLASSIC_LIGHTWEIGHT)
        huo = v == MoogVariant.HUOVILAINEN
        zdf = v == MoogVariant.ZDF
        if zdf:
            params = [self.zdf_gk, self.drive_scale, self.feedback,
                      self.input_gain, self.output_scale]
        else:
            coef = self.coefficient * (2 * self.thermal_voltage
                                       if improved else 1.0)
            params = [coef, self.drive_scale, self.feedback, self.input_gain,
                      self.output_scale]
        st8 = jnp.concatenate([state["stage"].T, state["tanh_last"].T,
                               state["prev_out"][None, :]], axis=0)
        if zdf:
            st8, yb = pk.moog_zdf_pallas(xb, st8, params,
                                         newton_iters=self.newton_iters)
        else:
            st8, yb = pk.moog_ladder_pallas(xb, st8, params,
                                            fast_tanh=fast, huovilainen=huo)
        return {"stage": st8[:4].T, "tanh_last": st8[4:7].T,
                "prev_out": st8[7]}, yb

    def _kernel_chunk_diff(self):
        """custom-VJP wrapper: the fused ladder kernel is bit-exact vs
        `_run_scan` (tests/test_pallas.py), so the backward recomputes
        the chunk as the (autodiff-able) scan and pulls its VJP — the
        standard recompute rule for a nonlinear sequential kernel JAX
        cannot differentiate directly. Gradient cost: one scan forward
        + backward per chunk; use the CPU/scan path for heavy training
        loops if that matters."""
        op = self.__dict__.get("_moog_vjp_op")
        if op is None:
            @jax.custom_vjp
            def op(state, xb):
                return self._kernel_chunk(state, xb)

            def fwd(state, xb):
                return self._kernel_chunk(state, xb), (state, xb)

            def bwd(res, cot):
                state, xb = res
                _, vjp = jax.vjp(self._run_scan, state, xb)
                return vjp(cot)

            op.defvjp(fwd, bwd)
            self.__dict__["_moog_vjp_op"] = op
        return op

    def _run_pallas(self, state, x_run):
        """Fused VMEM ladder kernel for the classic family/Huovilainen;
        full kernel chunks via Pallas, any tail via the scan."""
        from algodsp_tpu.ops import pallas_kernels as pk
        t = x_run.shape[-1]
        nb = (t // pk._CHUNK_T) * pk._CHUNK_T
        ys = []
        if nb:
            state, yb = self._kernel_chunk_diff()(state, x_run[..., :nb])
            ys.append(yb)
        if t - nb:
            state, yt = self._run_scan(state, x_run[..., nb:])
            ys.append(yt)
        return state, (ys[0] if len(ys) == 1 else
                       jnp.concatenate(ys, axis=-1))

    def process(self, state, x):
        """(state, x:(..., N)) -> (state, y). Oversampling processes each
        sample `os` times with the input applied on the first tick and
        the last tick's output kept (zero-stuff + decimate semantics)."""
        x = jnp.asarray(x)
        os = self.oversampling
        if os > 1:
            xov = jnp.zeros(x.shape[:-1] + (x.shape[-1] * os,), x.dtype)
            xov = xov.at[..., ::os].set(x * os)
            x_run = xov
        else:
            x_run = x
        if jax.default_backend() == "tpu" and x_run.ndim == 2:
            state, y = self._run_pallas(state, x_run)
        else:
            state, y = self._run_scan(state, x_run)
        if os > 1:
            y = y[..., os - 1::os]
        return state, y
