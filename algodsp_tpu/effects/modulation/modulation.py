"""Modulation effects.

Capability parity with `dsp/effects/modulation/`:
Chorus (multi-voice modulated delay, `chorus.go:136-165`), Flanger
(modulated delay with feedback, `flanger.go:259-282`), Phaser
(allpass cascade + LFO + feedback, `phaser.go:268-285,365-378`),
Tremolo (LFO amplitude with smoothing, `tremolo.go:201-294`),
RingModulator (`ring_modulator.go:143-153`), AutoWah (envelope-driven
bandpass, `auto_wah.go:315-334,455-482`), FrequencyShifter (Bode SSB
via the polyphase Hilbert transformer, `frequency_shifter.go:78-210`).

TPU-first split:
  * Feedback-free effects (chorus, tremolo, ring mod, frequency
    shifter) vectorize completely: LFO trajectories are closed-form in
    the sample index, modulated delays run as contiguous-slice walking
    reads (`delayline.walking_read` — no TPU gather), smoothing
    one-poles ride the linear-recurrence engine.
  * The flanger's feedback loop is blocked (see Flanger): its lag never
    drops below base_delay, so 64-sample blocks need no in-block
    recurrence.
  * Zero-delay feedback effects (phaser) and the time-varying-
    coefficient autowah filter run as per-sample `lax.scan`s with
    channels on VPU lanes — exactly the Go recurrences.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.ops import linrec, ring
from algodsp_tpu.ops.envscan import envelope_scan
from algodsp_tpu.delayline import DelayLine, fractional_read, walking_read
from algodsp_tpu.interp import Mode
from algodsp_tpu.filters.hilbert import HilbertTransformer

TWO_PI = 2.0 * math.pi


def _lfo_phases(state_phase, n, rate_hz, sample_rate, dtype):
    """Phase trajectory for n samples starting at state_phase."""
    inc = TWO_PI * rate_hz / sample_rate
    idx = jnp.arange(n, dtype=dtype)
    phases = state_phase + idx * inc
    final = jnp.mod(state_phase + n * inc, TWO_PI)
    return phases, final


class Chorus:
    """Multi-voice chorus (`chorus.go:136-165`). Feedback-free: all
    voices are vectorized fractional-delay gathers."""

    def __init__(self, sample_rate: float, *, speed_hz: float = 0.8,
                 depth_seconds: float = 0.004, base_delay_seconds: float = 0.02,
                 mix: float = 0.5, stages: int = 3):
        if sample_rate <= 0:
            raise ValueError("chorus: sample rate must be > 0")
        if stages < 1:
            raise ValueError("chorus: stages must be >= 1")
        self.sample_rate = sample_rate
        self.speed_hz = speed_hz
        self.depth = depth_seconds
        self.base_delay = base_delay_seconds
        self.mix = mix
        self.stages = stages
        max_delay = int(math.ceil((base_delay_seconds + depth_seconds)
                                  * sample_rate)) + 4
        self.delayline = DelayLine(max_delay, mode=Mode.HERMITE)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"buf": self.delayline.init_state(batch_shape, dtype),
                "phase": jnp.zeros((), dtype)}

    def process(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        phases, phase_f = _lfo_phases(state["phase"], n, self.speed_hz,
                                      self.sample_rate, x.dtype)
        base = self.base_delay * self.sample_rate
        depth = self.depth * self.sample_rate
        h = state["buf"].shape[-1]
        ext = jnp.concatenate([state["buf"].astype(x.dtype), x], axis=-1)
        # read positions walk +1/sample with LFO wobble bounded by
        # depth * dphase -> contiguous-slice read, no TPU gather
        drift = depth * TWO_PI * self.speed_hz / self.sample_rate
        use_walking = base >= 4.0          # Hermite stencil must fit
        wet = jnp.zeros_like(x)
        for i in range(self.stages):
            off = TWO_PI * i / self.stages
            mod = 0.5 * (1.0 + jnp.sin(phases + off))
            delay = base + depth * mod
            pos = h + jnp.arange(n, dtype=x.dtype) - delay
            if use_walking:
                wet = wet + walking_read(ext, pos, drift, Mode.HERMITE)
            else:
                wet = wet + fractional_read(
                    ext, jnp.broadcast_to(pos, x.shape), Mode.HERMITE)
        wet = wet / self.stages
        new_state = {"buf": ext[..., -h:], "phase": phase_f}
        return new_state, x * (1.0 - self.mix) + wet * self.mix


class Tremolo:
    """LFO amplitude modulation with smoothing (`tremolo.go:201-294`).

    The smoothing one-pole has a known input trajectory, so it runs as
    a first-order linear recurrence (vectorized), not a scan.
    """

    def __init__(self, sample_rate: float, *, rate_hz: float = 5.0,
                 depth: float = 0.5, mix: float = 1.0,
                 smoothing_ms: float = 0.0):
        if sample_rate <= 0:
            raise ValueError("tremolo: sample rate must be > 0")
        if not (0.0 <= depth <= 1.0):
            raise ValueError(f"tremolo depth must be in [0,1]: {depth}")
        self.sample_rate = sample_rate
        self.rate_hz = rate_hz
        self.depth = depth
        self.mix = mix
        if smoothing_ms <= 0:
            self.smoothing_coeff = 1.0
        else:
            tau = smoothing_ms / 1000.0
            self.smoothing_coeff = min(max(
                1.0 - math.exp(-1.0 / (tau * sample_rate)), 0.0), 1.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"phase": jnp.zeros((), dtype),
                "mod": jnp.zeros(batch_shape, dtype)}

    def process(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        phases, phase_f = _lfo_phases(state["phase"], n, self.rate_hz,
                                      self.sample_rate, x.dtype)
        lfo = 0.5 * (1.0 + jnp.sin(phases))
        target = (1.0 - self.depth) + self.depth * lfo
        target = jnp.broadcast_to(target, x.shape)
        if self.smoothing_coeff >= 1.0:
            mod = target
            mod_f = mod[..., -1]
        else:
            c = self.smoothing_coeff
            a1 = -(1.0 - c)
            f = c * target
            f = f.at[..., 0].add(-a1 * state["mod"])
            mod = linrec.ar2_apply_scan(f, jnp.asarray(a1, x.dtype),
                                        jnp.asarray(0.0, x.dtype),
                                        jnp.zeros_like(state["mod"]),
                                        jnp.zeros_like(state["mod"]))
            mod_f = mod[..., -1]
        wet = x * mod
        return ({"phase": phase_f, "mod": mod_f},
                x * (1.0 - self.mix) + wet * self.mix)


class RingModulator:
    """Carrier multiplication (`ring_modulator.go:143-153`)."""

    def __init__(self, sample_rate: float, *, carrier_hz: float = 440.0,
                 mix: float = 1.0):
        if sample_rate <= 0:
            raise ValueError("ring modulator: sample rate must be > 0")
        self.sample_rate = sample_rate
        self.carrier_hz = carrier_hz
        self.mix = mix

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"phase": jnp.zeros((), dtype)}

    def process(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        phases, phase_f = _lfo_phases(state["phase"], n, self.carrier_hz,
                                      self.sample_rate, x.dtype)
        wet = x * jnp.sin(phases)
        return {"phase": phase_f}, x * (1.0 - self.mix) + wet * self.mix


class Flanger:
    """Modulated delay with feedback (`flanger.go:259-282`).

    TPU design: the modulated lag never drops below base_delay (the LFO
    term is >= 0), so blocks of B <= base_delay*sr - 2 samples only read
    values written in earlier blocks.  The LFO trajectory is closed-form
    and input-independent, so per block the fractional read is a small
    static set of contiguous dynamic slices (the read index walks
    +1/sample with a tiny wobble) and the write is a concat-shift.
    Falls back to the per-sample scan when base_delay is too short to
    block (< ~0.4 ms at 48 kHz)."""

    def __init__(self, sample_rate: float, *, rate_hz: float = 0.25,
                 depth_seconds: float = 0.002, base_delay_seconds: float = 0.002,
                 feedback: float = 0.5, mix: float = 0.5):
        if sample_rate <= 0:
            raise ValueError("flanger: sample rate must be > 0")
        if not (-0.99 <= feedback <= 0.99):
            raise ValueError(f"flanger feedback must be in [-0.99, 0.99]: {feedback}")
        self.sample_rate = sample_rate
        self.rate_hz = rate_hz
        self.depth = depth_seconds
        self.base_delay = base_delay_seconds
        self.feedback = feedback
        self.mix = mix
        self.buf_len = int(math.ceil((base_delay_seconds + depth_seconds)
                                     * sample_rate)) + 4
        inc = TWO_PI * rate_hz / sample_rate
        min_d = max(base_delay_seconds * sample_rate, 1.0)
        B = int(min(128, math.floor(min_d) - 2))
        drift = depth_seconds * sample_rate * inc   # max |d lag/dt|
        while B > 16 and drift * B > 8.0:
            B //= 2
        self._block = B
        self._nshift = int(math.ceil(max(drift, 0.0) * B)) + 3 if B >= 16 else 0

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"buf": jnp.zeros(batch_shape + (self.buf_len,), dtype),
                "phase": jnp.zeros((), dtype),
                "write": jnp.zeros((), jnp.int32)}

    def _lags(self, phase0, n, dtype):
        """Closed-form modulated-lag trajectory for n samples."""
        inc = TWO_PI * self.rate_hz / self.sample_rate
        phases = jnp.mod(phase0 + inc * jnp.arange(n, dtype=dtype), TWO_PI)
        mod = 0.5 * (1.0 + jnp.sin(phases))
        return jnp.maximum((self.base_delay + self.depth * mod)
                           * self.sample_rate, 1.0).astype(dtype)

    def _sample_scan(self, buf, w, x, d):
        L = self.buf_len
        dtype = x.dtype

        def step(carry, xs):
            buf, w = carry
            xv, dv = xs
            pos = w.astype(dtype) - dv
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            i0 = jnp.mod(i0, L)
            i1 = jnp.mod(i0 + 1, L)
            delayed = buf[..., i0] * (1 - frac) + buf[..., i1] * frac
            buf = buf.at[..., jnp.mod(w, L)].set(xv + delayed * self.feedback)
            y = xv * (1.0 - self.mix) + delayed * self.mix
            return (buf, w + 1), y

        (buf, w), ys = jax.lax.scan(step, (buf, w),
                                    (jnp.moveaxis(x, -1, 0), d))
        return buf, w, jnp.moveaxis(ys, 0, -1)

    def process(self, state, x):
        x = jnp.asarray(x)
        dtype = x.dtype
        N = x.shape[-1]
        L = self.buf_len
        B = self._block
        d = self._lags(state["phase"], N, dtype)
        inc = TWO_PI * self.rate_hz / self.sample_rate
        new_phase = jnp.mod(state["phase"] + inc * N, TWO_PI)
        buf, w = state["buf"], state["write"]
        nb, rem = divmod(N, B) if B >= 16 else (0, N)
        ys = []
        if nb:
            lin = ring.ring_to_linear(buf, w)

            def bstep(carry, xs):
                lin, w = carry
                xbv, db = xs                          # (..., B), (B,)
                t = jnp.arange(B)
                pos = (L + t).astype(dtype) - db
                i0 = jnp.floor(pos).astype(jnp.int32)
                frac = pos - i0
                ci = jnp.min(i0 - t)
                e = i0 - t - ci
                delayed = jnp.zeros(lin.shape[:-1] + (B,), dtype)
                for s in range(self._nshift):
                    sl = jax.lax.dynamic_slice_in_dim(lin, ci + s, B, axis=-1)
                    ws = (1 - frac) * (e == s) + frac * (e == s - 1)
                    delayed = delayed + ws * sl
                lin = jnp.concatenate(
                    [lin[..., B:], xbv + delayed * self.feedback], axis=-1)
                y = xbv * (1.0 - self.mix) + delayed * self.mix
                return (lin, w + B), y

            shape = x.shape[:-1]
            xb = jnp.moveaxis(x[..., :nb * B].reshape(shape + (nb, B)), -2, 0)
            db = d[:nb * B].reshape(nb, B)
            (lin, w), yb = jax.lax.scan(bstep, (lin, w), (xb, db))
            buf = ring.linear_to_ring(lin, w)
            ys.append(jnp.moveaxis(yb, 0, -2).reshape(shape + (nb * B,)))
        if rem:
            buf, w, yt = self._sample_scan(buf, w, x[..., N - rem:],
                                           d[N - rem:])
            ys.append(yt)
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-1)
        return {"buf": buf, "phase": new_phase, "write": w}, y


class Phaser:
    """Allpass-cascade phaser with feedback (`phaser.go:268-285`).

    TPU design: the whole S-stage allpass cascade plus its feedback
    path is LINEAR in the state (x1_i, y1_i, fb) and the input — only
    the allpass coefficient varies per sample, and it is LFO-driven
    (input-independent).  The stored state is redundant one sample in
    (x1_i' = y1_{i-1}', fb' = y1_{S-1}'), so each sample reduces to an
    (S+1)-dim affine map over u = [v_0..v_S], built in closed form and
    scanned with the log-depth `linrec.affine_scan_nd` instead of N
    sequential steps (sample 0 is evaluated explicitly from the full
    user-visible state, which keeps arbitrary initial states exact).
    The matrix half of the scan is channel-independent, so its cost
    does not grow with the channel count.  `process_scan` keeps the
    per-sample reference loop for parity testing.
    """

    def __init__(self, sample_rate: float, *, rate_hz: float = 0.5,
                 min_freq_hz: float = 300.0, max_freq_hz: float = 1600.0,
                 stages: int = 4, feedback: float = 0.5, mix: float = 0.5):
        if sample_rate <= 0:
            raise ValueError("phaser: sample rate must be > 0")
        if not (1 <= stages <= 12):
            raise ValueError(f"phaser stages must be in [1, 12]: {stages}")
        if not (-0.99 <= feedback <= 0.99):
            raise ValueError(f"phaser feedback must be in [-0.99, 0.99]: {feedback}")
        self.sample_rate = sample_rate
        self.rate_hz = rate_hz
        self.min_freq = min_freq_hz
        self.max_freq = max_freq_hz
        self.stages = stages
        self.feedback = feedback
        self.mix = mix

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"x1": jnp.zeros(batch_shape + (self.stages,), dtype),
                "y1": jnp.zeros(batch_shape + (self.stages,), dtype),
                "fb": jnp.zeros(batch_shape, dtype),
                "phase": jnp.zeros((), dtype)}

    def _allpass_coeffs(self, phase0, n, dtype):
        """Per-sample first-order allpass coefficient trajectory (N,)."""
        inc = TWO_PI * self.rate_hz / self.sample_rate
        max_safe = 0.45 * self.sample_rate
        phases = jnp.mod(phase0 + inc * jnp.arange(n, dtype=dtype), TWO_PI)
        mod = 0.5 * (1.0 + jnp.sin(phases))
        freq = jnp.clip(self.min_freq + (self.max_freq - self.min_freq) * mod,
                        1.0, max_safe)
        g = jnp.tan(jnp.pi * freq / self.sample_rate)
        return ((g - 1.0) / (g + 1.0)).astype(dtype)

    def process(self, state, x):
        x = jnp.asarray(x)
        dtype = x.dtype
        N = x.shape[-1]
        S = self.stages
        a = self._allpass_coeffs(state["phase"], N, dtype)       # (N,)
        inc = TWO_PI * self.rate_hz / self.sample_rate
        new_phase = jnp.mod(state["phase"] + inc * N, TWO_PI)

        # Reduced-state scan.  The stored (x1_i, y1_i, fb) triples are
        # redundant one sample in: x1_i' = v_i = y1_{i-1}' and fb' =
        # v_S, so the whole cascade state is u = [v_0..v_S] — (S+1)
        # dims instead of 2S+1, cutting the log-depth combine's d^3
        # cost ~5.8x for the 4-stage default.  Sample 0 is computed
        # explicitly from the full (possibly inconsistent) user state;
        # samples 1..N-1 run the reduced affine scan:
        #   v_0 = x + feedback*u_S;  v_{i+1} = a v_i + u_i - a u_{i+1}.
        x0 = x[..., 0]
        a0 = a[0]
        v = x0 + state["fb"] * self.feedback
        vs = [v]
        for i in range(S):
            v = a0 * v + state["x1"][..., i] - a0 * state["y1"][..., i]
            vs.append(v)
        u0 = jnp.stack(vs, axis=-1)                              # (..., S+1)
        y0 = x0 * (1.0 - self.mix) + vs[-1] * self.mix

        if N == 1:
            final = u0
            y_out = y0[..., None]
        else:
            dr = S + 1
            a1 = a[1:]                                           # (N-1,)
            # alpha_i = coefficients of v_i over [u, x] (dim dr+1)
            alpha = jnp.zeros((N - 1, dr + 1), dtype)
            alpha = alpha.at[:, dr].set(1.0)
            alpha = alpha.at[:, S].set(self.feedback)
            alphas = [alpha]
            for i in range(S):
                nxt = a1[:, None] * alphas[-1]
                nxt = nxt.at[:, i].add(1.0)
                nxt = nxt.at[:, i + 1].add(-a1)
                alphas.append(nxt)
            M = jnp.stack(alphas, axis=1)                        # (N-1, dr, dr+1)
            A, b = M[..., :dr], M[..., dr]
            w = b * x[..., 1:, None]                             # (..., N-1, dr)
            after, final = linrec.affine_scan_nd(A, w, u0)
            v_last = after[..., :, S]                            # v_S per sample
            y_out = jnp.concatenate(
                [y0[..., None],
                 x[..., 1:] * (1.0 - self.mix) + v_last * self.mix], axis=-1)

        return ({"x1": final[..., :S], "y1": final[..., 1:],
                 "fb": final[..., S], "phase": new_phase}, y_out)

    def process_scan(self, state, x):
        """Per-sample reference loop (phaser.go:268-285 order)."""
        x = jnp.asarray(x)
        dtype = x.dtype
        inc = TWO_PI * self.rate_hz / self.sample_rate
        max_safe = 0.45 * self.sample_rate
        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xv):
            x1, y1, fb, phase = carry
            mod = 0.5 * (1.0 + jnp.sin(phase))
            freq = jnp.clip(self.min_freq + (self.max_freq - self.min_freq) * mod,
                            1.0, max_safe)
            g = jnp.tan(jnp.pi * freq / self.sample_rate)
            a = ((g - 1.0) / (g + 1.0)).astype(dtype)
            v = xv + fb * self.feedback
            new_x1 = []
            new_y1 = []
            for i in range(self.stages):
                y = a * v + x1[..., i] - a * y1[..., i]
                new_x1.append(v)
                new_y1.append(y)
                v = y
            x1 = jnp.stack(new_x1, axis=-1)
            y1 = jnp.stack(new_y1, axis=-1)
            phase = jnp.mod(phase + inc, TWO_PI)
            y_out = xv * (1.0 - self.mix) + v * self.mix
            return (x1, y1, v, phase), y_out

        (x1, y1, fb, phase), ys = jax.lax.scan(
            step, (state["x1"], state["y1"], state["fb"], state["phase"]), xs)
        return ({"x1": x1, "y1": y1, "fb": fb, "phase": phase},
                jnp.moveaxis(ys, 0, -1))


class AutoWah:
    """Envelope-driven bandpass wah (`auto_wah.go:315-334,455-482`).

    The envelope runs via the shared branching scan; the time-varying
    RBJ bandpass coefficients are computed vectorized up front (they
    depend only on the input envelope), and the filter itself runs as a
    log-depth time-varying affine scan (`linrec.affine2_scan`) instead
    of a per-sample loop.
    """

    def __init__(self, sample_rate: float, *, min_freq_hz: float = 350.0,
                 max_freq_hz: float = 2500.0, q: float = 2.0,
                 sensitivity: float = 5.0, attack_ms: float = 5.0,
                 release_ms: float = 70.0, mix: float = 1.0):
        if sample_rate <= 0:
            raise ValueError("auto-wah: sample rate must be > 0")
        self.sample_rate = sample_rate
        self.min_freq = min_freq_hz
        self.max_freq = max_freq_hz
        self.q = q
        self.sensitivity = sensitivity
        self.mix = mix
        self.attack_coeff = 1.0 - math.exp(-1.0 / (attack_ms * 1e-3 * sample_rate))
        self.release_coeff = 1.0 - math.exp(-1.0 / (release_ms * 1e-3 * sample_rate))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"env": jnp.zeros(batch_shape, dtype),
                "z1": jnp.zeros(batch_shape, dtype),
                "z2": jnp.zeros(batch_shape, dtype)}

    def process(self, state, x):
        x = jnp.asarray(x)
        env_f, env = envelope_scan(jnp.abs(x), state["env"],
                                   self.attack_coeff, self.release_coeff)
        env_norm = jnp.minimum(env * self.sensitivity, 1.0)
        freq = jnp.clip(self.min_freq + env_norm * (self.max_freq - self.min_freq),
                        1.0, 0.49 * self.sample_rate)
        w0 = TWO_PI * freq / self.sample_rate
        sw, cw = jnp.sin(w0), jnp.cos(w0)
        alpha = sw / (2.0 * self.q)
        inv_a0 = 1.0 / (1.0 + alpha)
        b0 = alpha * inv_a0
        b2 = -alpha * inv_a0
        a1 = -2.0 * cw * inv_a0
        a2 = (1.0 - alpha) * inv_a0

        # DF2T with per-sample coefficients.  Substituting
        # out = b0 x + z1 into the state updates gives the affine
        # recurrence (b1 = 0):
        #   z1' = -a1 z1 + z2 - a1 b0 x
        #   z2' = -a2 z1      + (b2 - a2 b0) x
        # whose coefficients depend only on the input envelope, so it
        # runs as one log-depth time-varying affine scan, not N steps.
        A = jnp.stack([-a1, jnp.ones_like(a1), -a2, jnp.zeros_like(a1)],
                      axis=-1)                                # (..., N, 4)
        w = jnp.stack([-a1 * b0 * x, (b2 - a2 * b0) * x], axis=-1)
        s0 = jnp.stack([state["z1"], state["z2"]], axis=-1)
        entry, final = linrec.affine2_scan(A, w, s0)
        wet = b0 * x + entry[..., 0]
        y = x * (1.0 - self.mix) + wet * self.mix
        return {"env": env_f, "z1": final[..., 0], "z2": final[..., 1]}, y


class FrequencyShifter:
    """Bode-style SSB frequency shifter (`frequency_shifter.go:78-210`):
    analytic signal from the Hilbert transformer, multiplied by a
    quadrature carrier. Returns (upshift, downshift)."""

    def __init__(self, sample_rate: float, *, shift_hz: float = 100.0,
                 number_of_coeffs: int = 8, transition: float = 0.1):
        if sample_rate <= 0:
            raise ValueError("frequency shifter: sample rate must be > 0")
        self.sample_rate = sample_rate
        self.shift_hz = shift_hz
        self.hilbert = HilbertTransformer(number_of_coeffs, transition)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"phase": jnp.zeros((), dtype)}

    def process(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        a, b = self.hilbert.process(x)
        phases, phase_f = _lfo_phases(state["phase"], n, abs(self.shift_hz),
                                      self.sample_rate, x.dtype)
        c, s = jnp.cos(phases), jnp.sin(phases)
        up = a * c - b * s
        down = a * c + b * s
        if self.shift_hz < 0:
            up, down = down, up
        return {"phase": phase_f}, (up, down)
