// Native runtime for algodsp-tpu.
//
// Role (the TPU-native analog of the reference's native layer — the
// hand-written NEON biquad kernel `dsp/filter/biquad/internal/arch/
// arm64/neon/kernel.s` and the wasm host shim `web/wasm/main.go`):
//
//   1. float64 golden-reference DSP kernels (biquad DF2T cascade, FIR,
//      branching envelope follower) — the bit-exact per-sample
//      semantics the JAX blocked kernels are verified against, without
//      needing a Go toolchain;
//   2. a lock-free single-producer/single-consumer ring buffer for
//      real-time block streaming between an audio host thread and the
//      device-dispatch thread (host side of the host<->TPU boundary).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <new>

extern "C" {

// ---------------------------------------------------------------------------
// Golden kernels
// ---------------------------------------------------------------------------

// Biquad cascade, Direct Form II Transposed, a0-normalized.
// sos: S rows of [b0, b1, b2, a1, a2]; state: S rows of [d0, d1].
// In-place over buf[n]. Mirrors section.go:47-53 / chain.go:59-72.
void biquad_df2t_process(const double* sos, double* state, int sections,
                         double gain, double* buf, long n) {
    if (gain != 1.0) {
        for (long i = 0; i < n; ++i) buf[i] *= gain;
    }
    for (int s = 0; s < sections; ++s) {
        const double b0 = sos[s * 5 + 0];
        const double b1 = sos[s * 5 + 1];
        const double b2 = sos[s * 5 + 2];
        const double a1 = sos[s * 5 + 3];
        const double a2 = sos[s * 5 + 4];
        double d0 = state[s * 2 + 0];
        double d1 = state[s * 2 + 1];
        for (long i = 0; i < n; ++i) {
            const double x = buf[i];
            const double y = b0 * x + d0;
            d0 = b1 * x - a1 * y + d1;
            d1 = b2 * x - a2 * y;
            buf[i] = y;
        }
        state[s * 2 + 0] = d0;
        state[s * 2 + 1] = d1;
    }
}

// Causal FIR with history carry. hist holds the last (taps-1) inputs
// (oldest first) and is updated in place.
void fir_process(const double* taps, int n_taps, double* hist,
                 const double* in, double* out, long n) {
    for (long i = 0; i < n; ++i) {
        double acc = taps[0] * in[i];
        for (int k = 1; k < n_taps; ++k) {
            const long j = i - k;
            const double x = (j >= 0) ? in[j] : hist[n_taps - 1 + j];
            acc += taps[k] * x;
        }
        out[i] = acc;
    }
    // update history with the last taps-1 inputs
    const int h = n_taps - 1;
    for (int k = 0; k < h; ++k) {
        const long j = n - h + k;
        hist[k] = (j >= 0) ? in[j] : hist[k + (int)n];
    }
}

// Branching attack/release envelope (generate.go:322-350 semantics).
double envelope_process(const double* in, double* out, long n,
                        double attack, double release, double env0) {
    double env = env0;
    for (long i = 0; i < n; ++i) {
        const double target = std::fabs(in[i]);
        const double coeff = (target > env) ? attack : release;
        env += coeff * (target - env);
        out[i] = env;
    }
    return env;
}

// ---------------------------------------------------------------------------
// Moog ladder golden kernel — all 6 variants + oversampling.
// Per-sample float64 oracle for the JAX engine in filters/moog.py
// (capability parity with dsp/filter/moog/moog.go:39-62; coefficient
// derivation moog.go:800-853). State: stage[4], tanh_last[3], prev_out
// (8 doubles, updated in place).
//
// variant codes: 0 classic, 1 classic_lightweight, 2 improved_classic,
// 3 improved_classic_lightweight, 4 huovilainen, 5 zdf.
// ---------------------------------------------------------------------------

static inline double moog_fast_tanh(double x) {
    if (x > 3.0) return 1.0;
    if (x < -3.0) return -1.0;
    const double x2 = x * x;
    double v = x * (27.0 + x2) / (27.0 + 9.0 * x2);
    if (v > 1.0) v = 1.0;
    if (v < -1.0) v = -1.0;
    return v;
}

static inline double moog_clip_state(double x) {
    const double lim = 32.0;
    if (x > lim) return lim;
    if (x < -lim) return -lim;
    return x;
}

// One oversampled tick of the classic family (variants 0-3) or
// Huovilainen (4). coef is pre-multiplied by 2*Vt for improved variants.
static inline double moog_tick_classic(double* st, double xv, double coef,
                                       double ds, double fb, double in_gain,
                                       int fast, int huov) {
    double* stage = st;         // [0..3]
    double* tl = st + 4;        // [0..2]
    double prev = st[7];
    double u, t_in;
    double tS0, tS1, tS2, tS3;
    if (huov) {
        const double fbv = 0.5 * (stage[3] + prev);
        u = xv * in_gain - fb * fbv;
        t_in = std::tanh(ds * u);
        tS0 = std::tanh(ds * stage[0]);
        tS1 = std::tanh(ds * stage[1]);
        tS2 = std::tanh(ds * stage[2]);
        tS3 = std::tanh(ds * stage[3]);
    } else {
        u = xv * in_gain - fb * stage[3];
        t_in = fast ? moog_fast_tanh(ds * u) : std::tanh(ds * u);
        tS0 = tl[0];
        tS1 = tl[1];
        tS2 = tl[2];
        tS3 = fast ? moog_fast_tanh(ds * stage[3]) : std::tanh(ds * stage[3]);
    }
    const double s0 = moog_clip_state(stage[0] + coef * (t_in - tS0));
    const double t0 = huov ? std::tanh(ds * s0)
                           : (fast ? moog_fast_tanh(ds * s0) : std::tanh(ds * s0));
    const double s1 = moog_clip_state(stage[1] + coef * (t0 - tS1));
    const double t1 = huov ? std::tanh(ds * s1)
                           : (fast ? moog_fast_tanh(ds * s1) : std::tanh(ds * s1));
    const double s2 = moog_clip_state(stage[2] + coef * (t1 - tS2));
    const double t2 = huov ? std::tanh(ds * s2)
                           : (fast ? moog_fast_tanh(ds * s2) : std::tanh(ds * s2));
    const double s3 = moog_clip_state(stage[3] + coef * (t2 - tS3));
    stage[0] = s0; stage[1] = s1; stage[2] = s2; stage[3] = s3;
    tl[0] = t0; tl[1] = t1; tl[2] = t2;
    st[7] = s3;
    return s3;
}

// One ZDF tick: TPT ladder with fixed-iteration Newton-Raphson on the
// feedback unknown (moog.py:_step_zdf semantics; D'Angelo & Valimaki
// nonlinearity, Zavalishin TPT).
static inline double moog_tick_zdf(double* st, double xv, double gk,
                                   double shape, double k, double in_gain,
                                   int iters) {
    double* s = st;             // stage[0..3]
    const double v_scale = gk / shape;
    const double inp = xv * in_gain;
    const double tS0 = std::tanh(shape * s[0]);
    const double tS1 = std::tanh(shape * s[1]);
    const double tS2 = std::tanh(shape * s[2]);
    const double tS3 = std::tanh(shape * s[3]);

    double y3est = st[7];
    double v0 = 0, v1 = 0, v2 = 0, v3 = 0, y3 = 0;
    for (int it = 0; it <= iters; ++it) {
        const double u = inp - k * y3est;
        const double tU = std::tanh(shape * u);
        v0 = v_scale * (tU - tS0);
        const double y0 = v0 + s[0];
        const double d0 = gk * (1.0 - tU * tU);
        const double tY0 = std::tanh(shape * y0);
        v1 = v_scale * (tY0 - tS1);
        const double y1 = v1 + s[1];
        const double d1 = gk * (1.0 - tY0 * tY0);
        const double tY1 = std::tanh(shape * y1);
        v2 = v_scale * (tY1 - tS2);
        const double y2 = v2 + s[2];
        const double d2 = gk * (1.0 - tY1 * tY1);
        const double tY2 = std::tanh(shape * y2);
        v3 = v_scale * (tY2 - tS3);
        y3 = v3 + s[3];
        const double d3 = gk * (1.0 - tY2 * tY2);
        if (it == iters) break;  // final pass just re-evaluates the ladder
        const double residual = y3 - y3est;
        const double J = d0 * d1 * d2 * d3 * (-k) - 1.0;
        if (std::fabs(J) >= 1e-15) y3est -= residual / J;
    }
    s[0] = moog_clip_state(s[0] + 2.0 * v0);
    s[1] = moog_clip_state(s[1] + 2.0 * v1);
    s[2] = moog_clip_state(s[2] + 2.0 * v2);
    s[3] = moog_clip_state(s[3] + 2.0 * v3);
    st[7] = y3;
    return y3;
}

// params: [coef_or_gk, drive_scale, feedback, input_gain, output_scale]
// (coef already includes the 2*Vt factor for improved variants; gk for
// ZDF). state: 8 doubles. Oversampling: zero-stuff by `os` with x*os on
// the first tick, keep the last tick's output.
void moog_process(int variant, const double* params, int oversampling,
                  int newton_iters, double* state, const double* in,
                  double* out, long n) {
    const double p0 = params[0];
    const double ds = params[1];
    const double fb = params[2];
    const double in_gain = params[3];
    const double out_scale = params[4];
    const int fast = (variant == 1 || variant == 3);
    const int huov = (variant == 4);
    const int os = oversampling < 1 ? 1 : oversampling;
    for (long i = 0; i < n; ++i) {
        double y = 0.0;
        for (int t = 0; t < os; ++t) {
            const double xv = (t == 0) ? in[i] * (double)os : 0.0;
            if (variant == 5)
                y = moog_tick_zdf(state, xv, p0, ds, fb, in_gain,
                                  newton_iters);
            else
                y = moog_tick_classic(state, xv, p0, ds, fb, in_gain,
                                      fast, huov);
        }
        out[i] = out_scale * y;
    }
}

// ---------------------------------------------------------------------------
// Dynamics ballistics golden kernel — the full feedforward detector +
// gain path (capability parity with dsp/effects/dynamics/core.go:274-495):
// one-pole sidechain high-cut / low-cut prefilters (core.go:600-662),
// peak or windowed-RMS detector over a ring buffer (core.go:361-388),
// branching attack/release envelope (core.go:339-359), log2-domain
// soft-knee gain computer (core.go:288-329), makeup gain.
//
// state layout: [lp, hp_lp, env] then rms ring of (rms_window-1)
// squared samples, oldest first (matches DynamicsCore.init_state's
// rms_hist). Updated in place. sidechain `sc` may alias `in`.
// ---------------------------------------------------------------------------

static inline double dyn_gain_log2(double level, double threshold_log2,
                                   double knee_db, double knee_width_log2,
                                   double inv_knee_width_log2,
                                   double comp_factor) {
    if (level <= 0.0) return 1.0;
    const double overshoot = std::log2(level) - threshold_log2;
    double eff;
    if (knee_db <= 0.0) {
        eff = overshoot > 0.0 ? overshoot : 0.0;
    } else {
        const double half = knee_width_log2 * 0.5;
        if (overshoot > half) {
            eff = overshoot;
        } else if (overshoot < -half) {
            eff = 0.0;
        } else {
            const double scratch = overshoot + half;
            eff = scratch * scratch * 0.5 * inv_knee_width_log2;
        }
    }
    return std::exp2(-eff * comp_factor);
}

// One feedforward detector tick: sidechain one-pole prefilters +
// optional windowed-RMS ring + branching attack/release envelope —
// shared by the ff/expand/gate kernels (core.go:274-495). `ring` holds
// rms_window-1 squared samples, oldest first; lp/hp_lp/env update in
// place through the pointers. Returns the new envelope level.
static inline double dyn_detect_tick(double* lp, double* hp_lp, double* env,
                                     double* ring, int rms_window,
                                     double lp_coeff, double hp_coeff,
                                     double attack, double release,
                                     double sc) {
    double pre = sc;
    if (lp_coeff > 0.0) { *lp += lp_coeff * (pre - *lp); pre = *lp; }
    if (hp_coeff > 0.0) { *hp_lp += hp_coeff * (pre - *hp_lp); pre -= *hp_lp; }
    double src = std::fabs(pre);
    if (rms_window > 1) {
        const int h = rms_window - 1;
        const double sq = src * src;
        double sum = sq;
        for (int k = 0; k < h; ++k) sum += ring[k];
        for (int k = 0; k < h - 1; ++k) ring[k] = ring[k + 1];
        ring[h - 1] = sq;
        const double mean = sum / (double)rms_window;
        src = mean > 0.0 ? std::sqrt(mean) : 0.0;
    }
    if (src > *env) *env += (src - *env) * attack;
    else            *env = src + (*env - src) * release;
    return *env;
}

void dynamics_ff_process(const double* in, const double* sc, double* out,
                         double* gains, long n, double lp_coeff,
                         double hp_coeff, int rms_window, double attack,
                         double release, double threshold_log2,
                         double knee_db, double knee_width_log2,
                         double inv_knee_width_log2, double comp_factor,
                         double makeup, double* state) {
    double lp = state[0];
    double hp_lp = state[1];
    double env = state[2];
    double* ring = state + 3;            // rms_window-1 squares, oldest first
    for (long i = 0; i < n; ++i) {
        const double level = dyn_detect_tick(
            &lp, &hp_lp, &env, ring, rms_window, lp_coeff, hp_coeff,
            attack, release, sc[i]);
        const double g = dyn_gain_log2(level, threshold_log2, knee_db,
                                       knee_width_log2, inv_knee_width_log2,
                                       comp_factor);
        if (gains) gains[i] = g;
        out[i] = in[i] * g * makeup;
    }
    state[0] = lp;
    state[1] = hp_lp;
    state[2] = env;
}

// Feedback-topology dynamics (core.go:274-286 semantics as mirrored by
// DynamicsCore._process_feedback): the detector reads the PREVIOUS
// output's magnitude; no sidechain prefilters or RMS window apply.
// state: [env, prev_abs], updated in place.
void dynamics_fb_process(const double* in, double* out, double* gains,
                         long n, double attack, double release,
                         double threshold_log2, double knee_db,
                         double knee_width_log2, double inv_knee_width_log2,
                         double comp_factor, double makeup, double* state) {
    double env = state[0];
    double prev_abs = state[1];
    for (long i = 0; i < n; ++i) {
        const double src = prev_abs;
        if (src > env) env += (src - env) * attack;
        else           env = src + (env - src) * release;
        const double g = dyn_gain_log2(env, threshold_log2, knee_db,
                                       knee_width_log2, inv_knee_width_log2,
                                       comp_factor);
        if (gains) gains[i] = g;
        const double y = in[i] * g * makeup;
        out[i] = y;
        prev_abs = std::fabs(y);
    }
    state[0] = env;
    state[1] = prev_abs;
}

// Downward expansion / gate gain (expander.go:358-411 semantics as
// mirrored by downward_expansion_gain): undershoot in log2, quadratic
// knee, factor = ratio-1, floored at range_lin; level <= 0 -> range.
static inline double dyn_expansion_gain_log2(double level,
                                             double threshold_log2,
                                             double knee_db,
                                             double knee_width_log2,
                                             double inv_knee_width_log2,
                                             double ratio,
                                             double range_lin) {
    if (level <= 0.0) return range_lin;
    const double undershoot = threshold_log2 - std::log2(level);
    const double factor = ratio - 1.0;
    double eff;
    if (knee_db <= 0.0) {
        eff = undershoot > 0.0 ? undershoot : 0.0;
    } else {
        const double half = knee_width_log2 * 0.5;
        if (undershoot > half) {
            eff = undershoot;
        } else if (undershoot < -half) {
            eff = 0.0;
        } else {
            const double scratch = undershoot + half;
            eff = scratch * scratch * 0.5 * inv_knee_width_log2;
        }
    }
    const double g = std::exp2(-eff * factor);
    return g > range_lin ? g : range_lin;
}

// Feedforward expander/gate: identical detector chain to
// dynamics_ff_process, expansion gain computer, no makeup.
// state layout as dynamics_ff_process.
void dynamics_expand_process(const double* in, const double* sc,
                             double* out, double* gains, long n,
                             double lp_coeff, double hp_coeff,
                             int rms_window, double attack, double release,
                             double threshold_log2, double knee_db,
                             double knee_width_log2,
                             double inv_knee_width_log2, double ratio,
                             double range_lin, double* state) {
    double lp = state[0];
    double hp_lp = state[1];
    double env = state[2];
    double* ring = state + 3;
    for (long i = 0; i < n; ++i) {
        const double level = dyn_detect_tick(
            &lp, &hp_lp, &env, ring, rms_window, lp_coeff, hp_coeff,
            attack, release, sc[i]);
        const double g = dyn_expansion_gain_log2(
            level, threshold_log2, knee_db, knee_width_log2,
            inv_knee_width_log2, ratio, range_lin);
        if (gains) gains[i] = g;
        out[i] = in[i] * g;
    }
    state[0] = lp;
    state[1] = hp_lp;
    state[2] = env;
}

// ---------------------------------------------------------------------------
// Polyphase rational resampler golden kernel — the per-output-sample
// branch-select loop (capability parity with dsp/resample/
// resample.go:249-292): output m uses phase (m*down) mod up and input
// anchor floor(m*down/up); y[m] = sum_k bank[p][k] * x[i-k] with
// history for indices before the block. hist holds the last L-1 inputs
// (oldest first) and is updated in place.
// ---------------------------------------------------------------------------

void resample_polyphase_process(const double* bank, int up, int down,
                                int phase_len, double* hist,
                                const double* in, long n_in, double* out,
                                long n_out) {
    const int h = phase_len - 1;
    for (long m = 0; m < n_out; ++m) {
        const long step = m * (long)down;
        const int p = (int)(step % up);
        const long anchor = step / up;
        double acc = 0.0;
        const double* row = bank + (long)p * phase_len;
        for (int k = 0; k < phase_len; ++k) {
            const long j = anchor - k;
            double x;
            if (j >= 0) {
                x = (j < n_in) ? in[j] : 0.0;
            } else {
                x = (h + j >= 0) ? hist[h + j] : 0.0;
            }
            acc += row[k] * x;
        }
        out[m] = acc;
    }
    for (int k = 0; k < h; ++k) {
        const long j = n_in - h + k;
        hist[k] = (j >= 0) ? in[j] : hist[k + (int)n_in];
    }
}

// ---------------------------------------------------------------------------
// Freeverb golden kernel — per-sample Schroeder reverb oracle for the
// blocked JAX engine (capability parity with dsp/effects/reverb/
// reverb.go:5-200): 8 parallel feedback combs with in-loop damping
// one-pole and 1e-23 denormal squelch, 4 serial allpasses, shared
// sample counter indexing each ring modulo its own tuning length.
//
// comb_sizes/allpass_sizes passed explicitly; state arrays are the
// concatenated rings (combs, then fstore[n_combs], then allpasses) and
// are updated in place. step is the global sample counter.
// ---------------------------------------------------------------------------

long freeverb_process(const int* comb_sizes, int n_combs,
                      const int* allpass_sizes, int n_allpasses,
                      double input_gain, double comb_feedback,
                      double allpass_feedback, double damp, double wet,
                      double dry, double* combs, double* fstore,
                      double* allpasses, long step, const double* in,
                      double* out, long n) {
    const double da = damp, db = 1.0 - damp;
    for (long s = 0; s < n; ++s) {
        const double xv = in[s];
        const double inp = input_gain * xv;
        double acc = 0.0;
        double* buf = combs;
        for (int i = 0; i < n_combs; ++i) {
            const int size = comb_sizes[i];
            const long idx = step % size;
            const double o = buf[idx];
            double fs = o * db + fstore[i] * da;
            if (std::fabs(fs) < 1e-23) fs = 0.0;
            buf[idx] = inp + fs * comb_feedback;
            fstore[i] = fs;
            acc += o;
            buf += size;
        }
        buf = allpasses;
        for (int j = 0; j < n_allpasses; ++j) {
            const int size = allpass_sizes[j];
            const long idx = step % size;
            const double bo = buf[idx];
            buf[idx] = acc + bo * allpass_feedback;
            acc = bo - acc;
            buf += size;
        }
        out[s] = acc * wet + xv * dry;
        ++step;
    }
    return step;
}

// ---------------------------------------------------------------------------
// FDN reverb golden kernel — per-sample 8-line feedback-delay-network
// oracle (capability parity with dsp/effects/reverb/
// fdn_reverb.go:9-330): fractional pre-delay, sinusoidal per-line
// delay modulation with 2*pi*i/8 phase offsets, linear-interp
// fractional reads, 8x8 Hadamard feedback (1/sqrt(8) scaled), in-loop
// one-pole damping, RT60-derived per-line feedback gains.
//
// params: [line_len, pre_len, pre_delay, mod_depth, dphase, gain,
//          damp, wet, dry, base_delays[8], feedback_gains[8]]
// state: lines (8*line_len), pre (pre_len), filter (8), lfo phase (1),
// all updated in place. step is the global sample counter.
// ---------------------------------------------------------------------------

static inline double fdn_frac_read(const double* buf, int L, double wp,
                                   double delay) {
    double pos = std::fmod(wp - delay, (double)L);
    if (pos < 0.0) pos += (double)L;
    const long i0 = (long)std::floor(pos);
    const double frac = pos - (double)i0;
    const long a = ((i0 % L) + L) % L;
    const long b = (a + 1) % L;
    return buf[a] * (1.0 - frac) + buf[b] * frac;
}

long fdn_process(const double* params, double* lines, double* pre,
                 double* filt, double* lfo_phase, long step,
                 const double* in, double* out, long n) {
    const int L = (int)params[0];
    const int P = (int)params[1];
    const double pre_delay = params[2];
    const double mod_depth = params[3];
    const double dphase = params[4];
    const double gain = params[5];
    const double damp = params[6];
    const double wet = params[7];
    const double dry = params[8];
    const double* base = params + 9;
    const double* fb_g = params + 17;
    const double two_pi = 2.0 * M_PI;
    // 8x8 Hadamard (Sylvester), scaled by `gain` at use site
    static const int had8[8][8] = {
        {+1,+1,+1,+1,+1,+1,+1,+1}, {+1,-1,+1,-1,+1,-1,+1,-1},
        {+1,+1,-1,-1,+1,+1,-1,-1}, {+1,-1,-1,+1,+1,-1,-1,+1},
        {+1,+1,+1,+1,-1,-1,-1,-1}, {+1,-1,+1,-1,-1,+1,-1,+1},
        {+1,+1,-1,-1,-1,-1,+1,+1}, {+1,-1,-1,+1,-1,+1,+1,-1}};
    double lfo = *lfo_phase;
    for (long s = 0; s < n; ++s) {
        const double xv = in[s];
        double inp = xv;
        if (pre_delay > 0.0) {
            const long wp = step % P;
            pre[wp] = xv;
            inp = fdn_frac_read(pre, P, (double)wp, pre_delay);
        }
        const long wp_l = step % L;
        double d[8], fb[8];
        for (int i = 0; i < 8; ++i) {
            const double mod = 0.5 * (1.0 + std::sin(
                lfo + two_pi * (double)i / 8.0));
            const double delay = base[i] + mod_depth * mod;
            d[i] = fdn_frac_read(lines + (long)i * L, L, (double)wp_l, delay);
        }
        double acc = 0.0;
        for (int i = 0; i < 8; ++i) {
            double v = 0.0;
            for (int j = 0; j < 8; ++j) v += (double)had8[i][j] * d[j];
            fb[i] = v * gain;
            acc += d[i];
        }
        for (int i = 0; i < 8; ++i) {
            const double filtered = fb[i] * (1.0 - damp) + filt[i] * damp;
            filt[i] = filtered;
            lines[(long)i * L + wp_l] = inp * gain + filtered * fb_g[i];
        }
        out[s] = xv * dry + acc * gain * wet;
        lfo = std::fmod(lfo + dphase, two_pi);
        ++step;
    }
    *lfo_phase = lfo;
    return step;
}

// ---------------------------------------------------------------------------
// Hilbert transformer golden kernel — full-rate per-sample oracle for
// the polyphase implementation in filters/hilbert.py (capability
// parity with the reference's half-band allpass pair,
// hilbert64.go:298-300). Each designed coefficient c is a first-order
// allpass in z^-2 at the FULL rate:
//     y[n] = c*x[n] - x[n-2] + c*y[n-2]
// path A cascades coeffs[0], coeffs[2], ... on x[n]; path B cascades
// coeffs[1], coeffs[3], ... on x[n-1]. When the coefficient count is
// even, path A is the in-phase output and B the quadrature (the
// even-indexed chain ends one section earlier); odd counts swap them.
// Evaluating the structure at full rate (no deinterleave) makes this
// an independent check of the polyphase/substream routing.
//
// state: [x_delay, then 4 regs (x1,x2,y1,y2) per A section, then 4
// regs per B section], updated in place.
// ---------------------------------------------------------------------------

void hilbert_process(const double* coeffs, int n_coeffs, double* state,
                     const double* in, double* out_a, double* out_b,
                     long n) {
    const int nA = (n_coeffs + 1) / 2;   // even-indexed coefficients
    const int nB = n_coeffs / 2;         // odd-indexed coefficients
    double* xd = state;                  // previous input sample
    double* regA = state + 1;            // nA * 4
    double* regB = state + 1 + 4 * nA;   // nB * 4
    const int a_is_even_chain = (n_coeffs % 2 == 0);
    for (long i = 0; i < n; ++i) {
        const double xv = in[i];
        double va = xv;
        for (int s = 0; s < nA; ++s) {
            double* r = regA + 4 * s;    // x1, x2, y1, y2
            const double c = coeffs[2 * s];
            const double y = c * va - r[1] + c * r[3];
            r[1] = r[0]; r[0] = va;
            r[3] = r[2]; r[2] = y;
            va = y;
        }
        double vb = *xd;
        *xd = xv;
        for (int s = 0; s < nB; ++s) {
            double* r = regB + 4 * s;
            const double c = coeffs[2 * s + 1];
            const double y = c * vb - r[1] + c * r[3];
            r[1] = r[0]; r[0] = vb;
            r[3] = r[2]; r[2] = y;
            vb = y;
        }
        if (a_is_even_chain) {
            out_a[i] = va;
            out_b[i] = vb;
        } else {
            out_a[i] = vb;
            out_b[i] = va;
        }
    }
}

// ---------------------------------------------------------------------------
// WSOLA time-stretch golden kernel — per-segment oracle for the
// batched-correlation formulation in effects/pitch/wsola.py
// (capability parity with dsp/effects/pitch/pitch_shifter.go, music
// preset, fixed-grid deviation as documented there). One channel per
// call. Semantics mirrored exactly:
//   * nominal grid: floor(i*flat*rate) + seek/2, clamped;
//   * alignment: maximize dot(region[k:k+ov], ref)/sqrt(E_k + 1e-12),
//     k in [0, seek), first index wins ties; the candidate energies
//     E_k accumulate in FLOAT because the JAX path pins its prefix-sum
//     to f32 (wsola.py `csq`) — the golden reproduces that so argmax
//     decisions match bit-for-bit on typical signals;
//   * sequential tail crossfade (linspace fade, endpoint=False), then
//     flat-sample advance (pitch_shifter.go:328-337).
// Returns the stretched length (S-1)*flat + seq; out must have room.
// ---------------------------------------------------------------------------

// n_sig: the ORIGINAL signal length before zero-extension (<= n);
// segments whose reads extend past it take the nominal offset.
long wsola_stretch(const double* x, long n, long n_sig, int seq, int ov,
                   int seek, double rate, double* out) {
    const int flat = seq - ov;
    // inputs shorter than one segment + search window + 1 would drive
    // the nominal grid (after its clamp) below the seek half-window and
    // read out of bounds — refuse instead
    if (n < (long)seq + (long)seek + 1) return -1;
    long S = (long)((double)(n - seq - seek) / ((double)flat * rate));
    if (S < 1) S = 1;
    // f32 prefix energies (see note above)
    float* csq = new (std::nothrow) float[n + 1];
    double* seg_prev = new (std::nothrow) double[seq];
    double* carry = new (std::nothrow) double[ov];
    if (!csq || !seg_prev || !carry) {
        delete[] csq; delete[] seg_prev; delete[] carry;
        return -1;
    }
    csq[0] = 0.0f;
    for (long i = 0; i < n; ++i)
        csq[i + 1] = csq[i] + (float)(x[i] * x[i]);

    long pts = -1;  // previous tail start
    long emitted = 0;
    for (long i = 0; i < S; ++i) {
        long nominal = (long)((double)i * (double)flat * rate) + seek / 2;
        const long nom_max = n - seq - seek / 2 - 1;
        if (nominal > nom_max) nominal = nom_max;
        const long rs = nominal - seek / 2;
        long start;
        if (i == 0) {
            pts = nominal;
        }
        {
            const double* ref = x + pts;
            int best = 0;
            double best_score = -1.0 / 0.0;
            double e_max = 0.0;
            for (int k = 0; k < seek; ++k) {
                double dot = 0.0;
                const double* cand = x + rs + k;
                for (int j = 0; j < ov; ++j) dot += cand[j] * ref[j];
                const double e = (double)(csq[rs + k + ov] - csq[rs + k]);
                if (e > e_max) e_max = e;
                const double score = dot / std::sqrt(e + 1e-12);
                if (score > best_score) { best_score = score; best = k; }
            }
            // silent or boundary regions (reads touching the
            // zero-extended tail): deterministic NOMINAL offset,
            // mirroring the engine's guard
            if (e_max <= 1e-12
                || rs + (long)(seek - 1 + ov) + seq > n_sig)
                best = seek / 2;
            start = rs + best;
        }
        pts = start + flat;
        const double* seg = x + start;
        if (i == 0) {
            for (int j = 0; j < flat; ++j) out[emitted + j] = seg[j];
            emitted += flat;
            for (int j = 0; j < ov; ++j) carry[j] = seg[flat + j];
        } else {
            // crossfade carry with the new segment head, emit flat
            for (int j = 0; j < seq; ++j) seg_prev[j] = seg[j];
            for (int j = 0; j < ov; ++j) {
                const double fin = (double)j / (double)ov;
                seg_prev[j] = (1.0 - fin) * carry[j] + fin * seg_prev[j];
            }
            for (int j = 0; j < flat; ++j) out[emitted + j] = seg_prev[j];
            emitted += flat;
            for (int j = 0; j < ov; ++j) carry[j] = seg_prev[flat + j];
        }
    }
    for (int j = 0; j < ov; ++j) out[emitted + j] = carry[j];
    emitted += ov;
    delete[] csq;
    delete[] seg_prev;
    delete[] carry;
    return emitted;
}

// ---------------------------------------------------------------------------
// Granular golden kernel — per-grain oracle for the vectorized
// gather/scatter formulation in effects/spectral.py:Granular
// (capability parity with granular.go:218-280): Hann-enveloped grains
// scheduled on a fixed hop grid (spray jitter resolved host-side into
// `starts`), each reading the input timeline at its own playback rate
// with linear interpolation (out-of-range reads are 0), overlap-added
// and envelope-normalized with a floor, then wet/dry mixed. One
// channel per call.
// ---------------------------------------------------------------------------

// Returns 0 on success, -1 on allocation failure (out untouched).
int granular_process(const double* x, long n, const double* starts,
                     int n_grains, int g, int hop, double pitch,
                     const double* env, double mix, double norm_floor,
                     double* out) {
    const long total = (long)(n_grains - 1) * hop + g;
    double* wet = new (std::nothrow) double[total]();
    double* norm = new (std::nothrow) double[total]();
    if (!wet || !norm) { delete[] wet; delete[] norm; return -1; }
    for (int gi = 0; gi < n_grains; ++gi) {
        const long base = (long)gi * hop;
        for (int j = 0; j < g; ++j) {
            const double pos = starts[gi] + (double)j * pitch;
            const long i0 = (long)std::floor(pos);
            const double t = pos - (double)i0;
            const double a = (i0 >= 0 && i0 < n) ? x[i0] : 0.0;
            const double b = (i0 + 1 >= 0 && i0 + 1 < n) ? x[i0 + 1] : 0.0;
            const double v = a * (1.0 - t) + b * t;
            wet[base + j] += v * env[j];
            norm[base + j] += env[j];
        }
    }
    for (long i = 0; i < n; ++i) {
        double w = 0.0;
        if (i < total) {
            const double nz = norm[i] > norm_floor ? norm[i] : norm_floor;
            w = wet[i] / nz;
        }
        out[i] = x[i] * (1.0 - mix) + w * mix;
    }
    delete[] wet;
    delete[] norm;
    return 0;
}

// ---------------------------------------------------------------------------
// Vocoder golden kernel — per-sample channel-vocoder oracle for
// effects/vocoder.py (capability parity with dsp/effects/vocoder.go):
// per band, a constant-peak-gain bandpass on the modulator feeds a
// branching attack/release envelope; the same-band synthesis bandpass
// on the carrier is scaled by that envelope; the output mixes the
// vocoded sum, the raw modulator, and the raw synthesis-bank sum.
//
// a_sos/s_sos: n_bands rows of [b0,b1,b2,a1,a2] (a0-normalized).
// a_state/s_state: n_bands*2 DF2T registers; env: n_bands. All
// updated in place. One channel per call.
// ---------------------------------------------------------------------------

void vocoder_process(const double* a_sos, const double* s_sos, int n_bands,
                     double attack, double release, double in_lvl,
                     double synth_lvl, double voc_lvl, double* env,
                     double* a_state, double* s_state, const double* mod,
                     const double* car, double* out, long n) {
    for (long i = 0; i < n; ++i) {
        const double m = mod[i];
        const double c = car[i];
        double voc = 0.0, ssum = 0.0;
        for (int b = 0; b < n_bands; ++b) {
            const double* A = a_sos + 5 * b;
            double* ar = a_state + 2 * b;
            const double ya = A[0] * m + ar[0];
            ar[0] = A[1] * m - A[3] * ya + ar[1];
            ar[1] = A[2] * m - A[4] * ya;
            const double tgt = std::fabs(ya);
            const double coeff = (tgt > env[b]) ? attack : release;
            env[b] += coeff * (tgt - env[b]);
            const double* S = s_sos + 5 * b;
            double* sr = s_state + 2 * b;
            const double ys = S[0] * c + sr[0];
            sr[0] = S[1] * c - S[3] * ys + sr[1];
            sr[1] = S[2] * c - S[4] * ys;
            voc += env[b] * ys;
            ssum += ys;
        }
        out[i] = voc_lvl * voc + in_lvl * m + synth_lvl * ssum;
    }
}

// ---------------------------------------------------------------------------
// Phaser golden kernel — per-sample oracle for the (2S+1)-dim affine
// scan formulation in effects/modulation/modulation.py:Phaser
// (capability parity with dsp/effects/phaser.go:268-285): LFO-driven
// first-order allpass coefficient a = (g-1)/(g+1), g = tan(pi f / sr),
// S-stage cascade with feedback of the last stage's output.
// state: [x1[0..S), y1[0..S), fb, phase], updated in place.
// ---------------------------------------------------------------------------

void phaser_process(int stages, double sample_rate, double rate_hz,
                    double min_freq, double max_freq, double feedback,
                    double mix, double* state, const double* in,
                    double* out, long n) {
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * rate_hz / sample_rate;
    const double max_safe = 0.45 * sample_rate;
    double* x1 = state;
    double* y1 = state + stages;
    double fb = state[2 * stages];
    double phase = state[2 * stages + 1];
    for (long s = 0; s < n; ++s) {
        const double mod = 0.5 * (1.0 + std::sin(phase));
        double freq = min_freq + (max_freq - min_freq) * mod;
        if (freq < 1.0) freq = 1.0;
        if (freq > max_safe) freq = max_safe;
        const double g = std::tan(M_PI * freq / sample_rate);
        const double a = (g - 1.0) / (g + 1.0);
        const double xv = in[s];
        double v = xv + fb * feedback;
        for (int i = 0; i < stages; ++i) {
            const double y = a * v + x1[i] - a * y1[i];
            x1[i] = v;
            y1[i] = y;
            v = y;
        }
        fb = v;
        phase = std::fmod(phase + inc, two_pi);
        out[s] = xv * (1.0 - mix) + v * mix;
    }
    state[2 * stages] = fb;
    state[2 * stages + 1] = phase;
}

// ---------------------------------------------------------------------------
// Flanger golden kernel — per-sample oracle for the blocked
// contiguous-slice formulation in modulation.py:Flanger (capability
// parity with dsp/effects/flanger.go:259-282): LFO-modulated
// fractional delay (linear interp in a ring), feedback into the
// write, wet/dry mix. state: [buf[0..L), phase, write], in place.
// ---------------------------------------------------------------------------

void flanger_process(int buf_len, double sample_rate, double rate_hz,
                     double depth_s, double base_delay_s, double feedback,
                     double mix, double* state, const double* in,
                     double* out, long n) {
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * rate_hz / sample_rate;
    const int L = buf_len;
    double* buf = state;
    double phase = state[L];
    long w = (long)state[L + 1];
    for (long s = 0; s < n; ++s) {
        const double mod = 0.5 * (1.0 + std::sin(phase));
        double lag = (base_delay_s + depth_s * mod) * sample_rate;
        if (lag < 1.0) lag = 1.0;
        const double pos = (double)w - lag;
        long i0 = (long)std::floor(pos);
        const double frac = pos - (double)i0;
        i0 = ((i0 % L) + L) % L;
        const long i1 = (i0 + 1) % L;
        const double delayed = buf[i0] * (1.0 - frac) + buf[i1] * frac;
        const double xv = in[s];
        buf[((w % L) + L) % L] = xv + delayed * feedback;
        out[s] = xv * (1.0 - mix) + delayed * mix;
        phase = std::fmod(phase + inc, two_pi);
        ++w;
    }
    state[L] = phase;
    state[L + 1] = (double)w;
}

// ---------------------------------------------------------------------------
// Chorus golden kernel — per-sample oracle for the walking-slice
// formulation in modulation.py:Chorus (capability parity with
// dsp/effects/modulation/chorus.go:136-165): S voices of LFO-modulated
// fractional delay with 2*pi*i/S phase offsets, 4-point Catmull-Rom
// Hermite interpolation (interp.go:51-59) on the history-extended
// timeline (out-of-range reads are 0), voice-averaged wet, wet/dry
// mix. state: [hist (H,), phase], updated in place; H is the delay
// line's history length.
// ---------------------------------------------------------------------------

static inline double chorus_read(const double* ext, long n_ext, double pos) {
    // 4-point Hermite at fractional pos; out-of-range points read 0
    const long i0 = (long)std::floor(pos);
    const double t = pos - (double)i0;
    double p[4];
    for (int k = -1; k <= 2; ++k) {
        const long j = i0 + k;
        p[k + 1] = (j >= 0 && j < n_ext) ? ext[j] : 0.0;
    }
    const double c0 = p[1];
    const double c1 = 0.5 * (p[2] - p[0]);
    const double c2 = p[0] - 2.5 * p[1] + 2.0 * p[2] - 0.5 * p[3];
    const double c3 = 0.5 * (p[3] - p[0]) + 1.5 * (p[1] - p[2]);
    return ((c3 * t + c2) * t + c1) * t + c0;
}

// Returns 0 on success, -1 on allocation failure (out untouched).
int chorus_process(int stages, int hist_len, double sample_rate,
                   double speed_hz, double depth_s, double base_delay_s,
                   double mix, double* state, const double* in,
                   double* out, long n) {
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * speed_hz / sample_rate;
    const double base = base_delay_s * sample_rate;
    const double depth = depth_s * sample_rate;
    const int H = hist_len;
    double phase0 = state[H];
    const long n_ext = H + n;
    double* ext = new (std::nothrow) double[n_ext];
    if (!ext) return -1;
    for (int i = 0; i < H; ++i) ext[i] = state[i];
    for (long i = 0; i < n; ++i) ext[H + i] = in[i];
    for (long s = 0; s < n; ++s) {
        const double phase = phase0 + (double)s * inc;
        double wet = 0.0;
        for (int v = 0; v < stages; ++v) {
            const double off = two_pi * (double)v / (double)stages;
            const double mod = 0.5 * (1.0 + std::sin(phase + off));
            const double delay = base + depth * mod;
            wet += chorus_read(ext, n_ext, (double)(H + s) - delay);
        }
        wet /= (double)stages;
        out[s] = in[s] * (1.0 - mix) + wet * mix;
    }
    // new history = last H samples of the extended timeline
    for (int i = 0; i < H; ++i) ext[i] = ext[n_ext - H + i];
    for (int i = 0; i < H; ++i) state[i] = ext[i];
    state[H] = std::fmod(phase0 + (double)n * inc, two_pi);
    delete[] ext;
    return 0;
}

// ---------------------------------------------------------------------------
// Auto-wah golden kernel — per-sample oracle for the time-varying
// affine-scan formulation in modulation.py:AutoWah (capability parity
// with dsp/effects/auto_wah.go:315-334,455-482): branching envelope
// drives an RBJ constant-skirt bandpass (b1 = 0) evaluated in DF2T
// with per-sample coefficients. state: [env, z1, z2], in place.
// ---------------------------------------------------------------------------

void autowah_process(double sample_rate, double min_freq, double max_freq,
                     double q, double sensitivity, double attack,
                     double release, double mix, double* state,
                     const double* in, double* out, long n) {
    double env = state[0];
    double z1 = state[1];
    double z2 = state[2];
    for (long i = 0; i < n; ++i) {
        const double xv = in[i];
        const double tgt = std::fabs(xv);
        const double coeff = (tgt > env) ? attack : release;
        env += coeff * (tgt - env);
        double en = env * sensitivity;
        if (en > 1.0) en = 1.0;
        double freq = min_freq + en * (max_freq - min_freq);
        if (freq < 1.0) freq = 1.0;
        const double fmax = 0.49 * sample_rate;
        if (freq > fmax) freq = fmax;
        const double w0 = 2.0 * M_PI * freq / sample_rate;
        const double sw = std::sin(w0), cw = std::cos(w0);
        const double alpha = sw / (2.0 * q);
        const double inv_a0 = 1.0 / (1.0 + alpha);
        const double b0 = alpha * inv_a0;
        const double b2 = -alpha * inv_a0;
        const double a1 = -2.0 * cw * inv_a0;
        const double a2 = (1.0 - alpha) * inv_a0;
        const double wet = b0 * xv + z1;        // b1 = 0
        const double z1n = -a1 * wet + z2;      // DF2T updates
        const double z2n = b2 * xv - a2 * wet;
        z1 = z1n;
        z2 = z2n;
        out[i] = xv * (1.0 - mix) + wet * mix;
    }
    state[0] = env;
    state[1] = z1;
    state[2] = z2;
}

// ---------------------------------------------------------------------------
// Shared per-sample biquad tick (DF2T, a0-normalized) for the composite
// oracles below. sos_row = [b0,b1,b2,a1,a2]; st2 = [d0,d1].
// ---------------------------------------------------------------------------

static inline double bq_tick(const double* sos_row, double* st2, double x) {
    const double y = sos_row[0] * x + st2[0];
    st2[0] = sos_row[1] * x - sos_row[3] * y + st2[1];
    st2[1] = sos_row[2] * x - sos_row[4] * y;
    return y;
}

static inline double bq_cascade_tick(const double* sos, int n_sec,
                                     double* st, double x) {
    for (int s = 0; s < n_sec; ++s)
        x = bq_tick(sos + 5 * s, st + 2 * s, x);
    return x;
}

// ---------------------------------------------------------------------------
// Tremolo golden kernel — per-sample oracle for the vectorized LFO +
// one-pole smoothing in modulation.py:Tremolo (capability parity with
// dsp/effects/modulation/tremolo.go:201-294). state: [phase, mod].
// ---------------------------------------------------------------------------

void tremolo_process(double sample_rate, double rate_hz, double depth,
                     double mix, double smoothing_coeff, double* state,
                     const double* in, double* out, long n) {
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * rate_hz / sample_rate;
    const double phase0 = state[0];
    double mod = state[1];
    for (long i = 0; i < n; ++i) {
        const double phase = phase0 + (double)i * inc;
        const double lfo = 0.5 * (1.0 + std::sin(phase));
        const double target = (1.0 - depth) + depth * lfo;
        if (smoothing_coeff >= 1.0) mod = target;
        else mod += smoothing_coeff * (target - mod);
        const double wet = in[i] * mod;
        out[i] = in[i] * (1.0 - mix) + wet * mix;
    }
    state[0] = std::fmod(phase0 + (double)n * inc, two_pi);
    state[1] = mod;
}

// ---------------------------------------------------------------------------
// Ring modulator golden kernel (modulation.py:RingModulator, capability
// parity with ring_modulator.go:143-153). state: [phase].
// ---------------------------------------------------------------------------

void ringmod_process(double sample_rate, double carrier_hz, double mix,
                     double* state, const double* in, double* out, long n) {
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * carrier_hz / sample_rate;
    const double phase0 = state[0];
    for (long i = 0; i < n; ++i) {
        const double wet = in[i] * std::sin(phase0 + (double)i * inc);
        out[i] = in[i] * (1.0 - mix) + wet * mix;
    }
    state[0] = std::fmod(phase0 + (double)n * inc, two_pi);
}

// ---------------------------------------------------------------------------
// Bit crusher golden kernel — per-sample quantize + sample-hold
// downsampler (waveshape.py:BitCrusher, capability parity with
// bit_crusher.go:191-230). state: [hold, counter].
// ---------------------------------------------------------------------------

void bitcrusher_process(double quant_levels, int downsample, double mix,
                        double* state, const double* in, double* out,
                        long n) {
    double hold = state[0];
    long counter = (long)state[1];
    for (long i = 0; i < n; ++i) {
        counter = (counter + 1) % downsample;
        if (downsample == 1 || counter == 0)
            hold = std::round(in[i] * quant_levels) / quant_levels;
        out[i] = in[i] * (1.0 - mix) + hold * mix;
    }
    state[0] = hold;
    state[1] = (double)counter;
}

// ---------------------------------------------------------------------------
// Transient shaper golden kernel — per-sample attack/sustain gain
// (processors.py:TransientShaper, capability parity with
// transient_shaper.go:139-188). state: [env].
// ---------------------------------------------------------------------------

void transient_process(double attack_coeff, double release_coeff,
                       double attack_amount, double sustain_amount,
                       double* state, const double* in, double* out,
                       long n) {
    double env = state[0];
    for (long i = 0; i < n; ++i) {
        const double s = std::fabs(in[i]);
        const double coeff = (s > env) ? attack_coeff : release_coeff;
        const double new_env = env + coeff * (s - env);
        const double delta = new_env - env;
        double norm = std::fabs(delta) / (env + 1e-9);
        if (norm > 1.0) norm = 1.0;
        double gain = 1.0 + ((delta >= 0.0) ? attack_amount * norm
                                            : sustain_amount * norm);
        if (gain < 0.0) gain = 0.0;
        env = new_env;
        out[i] = in[i] * gain;
    }
    state[0] = env;
}

// ---------------------------------------------------------------------------
// Lookahead limiter golden kernel — the delayed program path driven by
// an EARLY detector (processors.py:LookaheadLimiter, capability parity
// with lookahead_limiter.go:23-36,185-210). The detector is the
// limiter-preset feedforward core (peak detector, hard knee 100:1);
// the program signal is delayed by `delay` samples. state: [env] then
// delay buffer of `delay` samples (oldest first), updated in place.
// ---------------------------------------------------------------------------

void lookahead_process(const double* in, const double* sc, double* out,
                       long n, int delay, double attack, double release,
                       double threshold_log2, double knee_db,
                       double knee_width_log2, double inv_knee_width_log2,
                       double comp_factor, double* state) {
    double env = state[0];
    double* dbuf = state + 1;
    for (long i = 0; i < n; ++i) {
        const double src = std::fabs(sc[i]);
        if (src > env) env += (src - env) * attack;
        else           env = src + (env - src) * release;
        const double g = dyn_gain_log2(env, threshold_log2, knee_db,
                                       knee_width_log2, inv_knee_width_log2,
                                       comp_factor);
        const long j = i - delay;
        const double delayed = (j >= 0) ? in[j] : dbuf[delay + j];
        out[i] = delayed * g;
    }
    for (int k = 0; k < delay; ++k) {
        const long j = n - delay + k;
        dbuf[k] = (j >= 0) ? in[j] : dbuf[k + (int)n];
    }
    state[0] = env;
}

// ---------------------------------------------------------------------------
// De-esser golden kernel — band-limited detector driving a compressor
// whose gain is applied to the high band (split) or whole signal
// (processors.py:DeEsser, capability parity with deesser.go:100,155).
// det_sos: 1 section; lo/hi_sos: the LR crossover cascades. state:
// [det(2), lo(2*n_lo), hi(2*n_hi), env], updated in place.
// ---------------------------------------------------------------------------

void deesser_process(const double* det_sos, const double* lo_sos, int n_lo,
                     const double* hi_sos, int n_hi, double attack,
                     double release, double threshold_log2, double knee_db,
                     double knee_width_log2, double inv_knee_width_log2,
                     double comp_factor, double range_lin, int split_band,
                     int listen, const double* in, double* out, long n,
                     double* state) {
    double* det_st = state;
    double* lo_st = state + 2;
    double* hi_st = lo_st + 2 * n_lo;
    double* env_p = hi_st + 2 * n_hi;
    double env = *env_p;
    for (long i = 0; i < n; ++i) {
        const double xv = in[i];
        const double det = bq_tick(det_sos, det_st, xv);
        const double src = std::fabs(det);
        if (src > env) env += (src - env) * attack;
        else           env = src + (env - src) * release;
        double g = dyn_gain_log2(env, threshold_log2, knee_db,
                                 knee_width_log2, inv_knee_width_log2,
                                 comp_factor);
        if (g < range_lin) g = range_lin;
        if (split_band) {
            const double lo = bq_cascade_tick(lo_sos, n_lo, lo_st, xv);
            const double hi = bq_cascade_tick(hi_sos, n_hi, hi_st, xv);
            out[i] = listen ? hi * g : lo + hi * g;
        } else {
            out[i] = xv * g;
        }
    }
    *env_p = env;
}

// ---------------------------------------------------------------------------
// Multiband compressor golden kernel — crossover tree + per-band
// feedforward cores (processors.py:MultibandCompressor, capability
// parity with multiband.go:27-160). xo_sos: n_stages blocks of
// [lp (n_sec x 5) | hp (n_sec x 5)]; band params arrays are length
// n_stages+1. state: per stage [lp(2*n_sec), hp(2*n_sec)] then
// env[n_bands], updated in place. Scratch `bands` must hold n_bands.
// ---------------------------------------------------------------------------

void multiband_process(const double* xo_sos, int n_stages, int n_sec,
                       const double* attack, const double* release,
                       const double* threshold_log2, const double* knee_db,
                       const double* knee_width_log2,
                       const double* inv_knee_width_log2,
                       const double* comp_factor, const double* makeup,
                       const double* in, double* out, long n,
                       double* state, double* bands) {
    const int n_bands = n_stages + 1;
    double* env = state + 4 * n_sec * n_stages;
    for (long i = 0; i < n; ++i) {
        double rest = in[i];
        for (int st = 0; st < n_stages; ++st) {
            const double* lp = xo_sos + st * 10 * n_sec;
            const double* hp = lp + 5 * n_sec;
            double* lp_st = state + st * 4 * n_sec;
            double* hp_st = lp_st + 2 * n_sec;
            bands[st] = bq_cascade_tick(lp, n_sec, lp_st, rest);
            rest = bq_cascade_tick(hp, n_sec, hp_st, rest);
        }
        bands[n_stages] = rest;
        double acc = 0.0;
        for (int b = 0; b < n_bands; ++b) {
            const double src = std::fabs(bands[b]);
            if (src > env[b]) env[b] += (src - env[b]) * attack[b];
            else              env[b] = src + (env[b] - src) * release[b];
            const double g = dyn_gain_log2(
                env[b], threshold_log2[b], knee_db[b], knee_width_log2[b],
                inv_knee_width_log2[b], comp_factor[b]);
            acc += bands[b] * g * makeup[b];
        }
        out[i] = acc;
    }
}

// ---------------------------------------------------------------------------
// Dither quantizer golden kernels — the FIR error-feedback shaper loop
// (dither/quantizer.py:_process_codes, capability parity with
// quantizer.go:87-120 + shaper_fir.go:5-59) and the IIR shelf shaper
// (shaper_iir.go:20-57). Dither noise is drawn by the JAX PRNG and
// passed in, so the oracle checks the shaping/quantization loop with
// identical noise. Outputs are the integer codes as doubles.
// ---------------------------------------------------------------------------

// state: err history (order doubles, newest first). order == 0 -> plain
// floor quantization.
void dither_fir_process(const double* scaled, const double* noise,
                        double* out_q, long n, const double* coeffs,
                        int order, int limit, double limit_lo,
                        double limit_hi, double* state) {
    for (long i = 0; i < n; ++i) {
        double shaped = scaled[i];
        for (int k = 0; k < order; ++k) shaped -= coeffs[k] * state[k];
        double q = std::floor(shaped + noise[i]);
        if (limit) {
            if (q < limit_lo) q = limit_lo;
            if (q > limit_hi) q = limit_hi;
        }
        if (order > 0) {
            for (int k = order - 1; k > 0; --k) state[k] = state[k - 1];
            state[0] = q - shaped;
        }
        out_q[i] = q;
    }
}

// state: [d0, d1, last_err] of the DF2T shelf on the previous error.
void dither_iir_process(const double* scaled, const double* noise,
                        double* out_q, long n, const double* shelf_sos,
                        int limit, double limit_lo, double limit_hi,
                        double* state) {
    double d0 = state[0], d1 = state[1], lerr = state[2];
    const double b0 = shelf_sos[0], b1 = shelf_sos[1], b2 = shelf_sos[2];
    const double a1 = shelf_sos[3], a2 = shelf_sos[4];
    for (long i = 0; i < n; ++i) {
        const double fo = b0 * lerr + d0;
        const double d0n = b1 * lerr - a1 * fo + d1;
        const double d1n = b2 * lerr - a2 * fo;
        const double shaped = scaled[i] - fo;
        double q = std::floor(shaped + noise[i]);
        if (limit) {
            if (q < limit_lo) q = limit_lo;
            if (q > limit_hi) q = limit_hi;
        }
        d0 = d0n; d1 = d1n; lerr = q - shaped;
        out_q[i] = q;
    }
    state[0] = d0; state[1] = d1; state[2] = lerr;
}

// ---------------------------------------------------------------------------
// Stereo widener golden kernel — mid/side width with optional bass-mono
// crossover (spatial.py:StereoWidener, capability parity with
// stereo_widener.go:142-178). n_lp == 0 -> pure mid/side. state:
// [lpL(2*n_lp), lpR, hpL(2*n_hp), hpR], updated in place.
// ---------------------------------------------------------------------------

void widener_process(const double* lp_sos, int n_lp, const double* hp_sos,
                     int n_hp, double width, const double* inL,
                     const double* inR, double* outL, double* outR,
                     long n, double* state) {
    double* lpL = state;
    double* lpR = lpL + 2 * n_lp;
    double* hpL = lpR + 2 * n_lp;
    double* hpR = hpL + 2 * n_hp;
    for (long i = 0; i < n; ++i) {
        const double l = inL[i], r = inR[i];
        if (n_lp == 0) {
            const double mid = (l + r) * 0.5;
            const double side = (l - r) * 0.5;
            outL[i] = mid + side * width;
            outR[i] = mid - side * width;
            continue;
        }
        const double bl = bq_cascade_tick(lp_sos, n_lp, lpL, l);
        const double br = bq_cascade_tick(lp_sos, n_lp, lpR, r);
        const double hl = bq_cascade_tick(hp_sos, n_hp, hpL, l);
        const double hr = bq_cascade_tick(hp_sos, n_hp, hpR, r);
        const double bass_mono = (bl + br) * 0.5;
        const double mid_h = (hl + hr) * 0.5;
        const double side_h = (hl - hr) * 0.5;
        outL[i] = bass_mono + mid_h + side_h * width;
        outR[i] = bass_mono + mid_h - side_h * width;
    }
}

// ---------------------------------------------------------------------------
// Crosstalk canceller golden kernel — staged delayed + high-shelf
// crossfeed subtraction (spatial.py:CrosstalkCanceller, capability
// parity with crosstalk_canceller.go:204-218). Each stage reads the
// OPPOSITE channel delayed by delays[s] and shelved; out = x - sum.
// state: per stage [dbufL(delays[s]) from R-feed, dbufR(delays[s])
// from L-feed, shelfL(2), shelfR(2)] — i.e. dbufL carries the history
// of the signal feeding LEFT's crossfeed (the right channel).
// ---------------------------------------------------------------------------

void crosstalk_cancel_process(int stages, const int* delays,
                              const double* gains, const double* shelf_sos,
                              const double* inL, const double* inR,
                              double* outL, double* outR, long n,
                              double* state) {
    // per-sample would force one pass per stage anyway; loop stages
    // outer and accumulate into the outputs (linear, order-free)
    for (long i = 0; i < n; ++i) { outL[i] = inL[i]; outR[i] = inR[i]; }
    double* sp = state;
    for (int s = 0; s < stages; ++s) {
        const int d = delays[s];
        double* dbufL = sp;            // history of R (feeds L)
        double* dbufR = sp + d;        // history of L (feeds R)
        double* shL = sp + 2 * d;
        double* shR = sp + 2 * d + 2;
        sp += 2 * d + 4;
        const double* row = shelf_sos + 5 * s;
        const double g = gains[s];
        for (long i = 0; i < n; ++i) {
            const long j = i - d;
            const double delL = (j >= 0) ? inR[j] : dbufL[d + j];
            const double delR = (j >= 0) ? inL[j] : dbufR[d + j];
            outL[i] -= bq_tick(row, shL, delL) * g;
            outR[i] -= bq_tick(row, shR, delR) * g;
        }
        for (int k = 0; k < d; ++k) {
            const long j = n - d + k;
            dbufL[k] = (j >= 0) ? inR[j] : dbufL[k + (int)n];
            dbufR[k] = (j >= 0) ? inL[j] : dbufR[k + (int)n];
        }
    }
}

// ---------------------------------------------------------------------------
// Crosstalk simulator golden kernels (spatial.py:CrosstalkSimulator).
// Parametric mode: single delayed, shelved crossfeed with mix
// (capability parity with crosstalk_simulator.go:171-185). state:
// [dbufL(d) (R-feed), dbufR(d) (L-feed), shelfL(2), shelfR(2)].
// ---------------------------------------------------------------------------

void crosstalk_sim_process(int delay, const double* shelf_sos, double mix,
                           int invert, const double* inL, const double* inR,
                           double* outL, double* outR, long n,
                           double* state) {
    double* dbufL = state;
    double* dbufR = state + delay;
    double* shL = state + 2 * delay;
    double* shR = state + 2 * delay + 2;
    const double sgn = invert ? -1.0 : 1.0;
    for (long i = 0; i < n; ++i) {
        const long j = i - delay;
        const double delL = (j >= 0) ? inR[j] : dbufL[delay + j];
        const double delR = (j >= 0) ? inL[j] : dbufR[delay + j];
        const double crL = bq_tick(shelf_sos, shL, delL) * sgn;
        const double crR = bq_tick(shelf_sos, shR, delR) * sgn;
        outL[i] = inL[i] * (1.0 - mix) + crL * mix;
        outR[i] = inR[i] * (1.0 - mix) + crR * mix;
    }
    for (int k = 0; k < delay; ++k) {
        const long j = n - delay + k;
        dbufL[k] = (j >= 0) ? inR[j] : dbufL[k + (int)n];
        dbufR[k] = (j >= 0) ? inL[j] : dbufR[k + (int)n];
    }
}

// HRTF-set mode: full 4-path FIR routing (capability parity with
// crosstalk_simulator_hrtf.go:121-137; whole-signal, zero-state like
// the Python path). complete=0 -> crossfeed_only.
void crosstalk_hrtf_process(const double* ld, int n_ld, const double* lc,
                            int n_lc, const double* rd, int n_rd,
                            const double* rc, int n_rc, int complete,
                            const double* inL, const double* inR,
                            double* outL, double* outR, long n) {
    for (long i = 0; i < n; ++i) {
        double cl = 0.0, cr = 0.0;
        for (int k = 0; k < n_lc && k <= i; ++k) cl += lc[k] * inR[i - k];
        for (int k = 0; k < n_rc && k <= i; ++k) cr += rc[k] * inL[i - k];
        if (complete) {
            double dl = 0.0, dr = 0.0;
            for (int k = 0; k < n_ld && k <= i; ++k) dl += ld[k] * inL[i - k];
            for (int k = 0; k < n_rd && k <= i; ++k) dr += rd[k] * inR[i - k];
            outL[i] = dl + cl;
            outR[i] = dr + cr;
        } else {
            outL[i] = inL[i] + cl;
            outR[i] = inR[i] + cr;
        }
    }
}

// ---------------------------------------------------------------------------
// Transformer simulation golden kernel — pre-emphasis HP -> saturate
// (4x oversampled exact tanh in high quality, odd polynomial in
// lightweight) -> damping LP -> mix (waveshape.py:TransformerSimulation,
// capability parity with transformer_simulation.go:333-430). High
// quality: zero-stuff upsample scaled by os, AA cascade, tanh, damped,
// AA down, take sample (os-1) of each group. state layout: hp(2),
// then HIGH: up_aa(2*n_aa), damp_os(2), down_aa(2*n_aa);
// LIGHTWEIGHT: damp(2).
// ---------------------------------------------------------------------------

void transformer_process(int high_quality, int oversampling,
                         const double* hp_sos, const double* aa_sos,
                         int n_aa, const double* damp_sos, double drive,
                         double mix, double output_level, const double* in,
                         double* out, long n, double* state) {
    double* hp_st = state;
    if (high_quality) {
        double* up_st = state + 2;
        double* dos_st = up_st + 2 * n_aa;
        double* dn_st = dos_st + 2;
        const int os = oversampling;
        for (long i = 0; i < n; ++i) {
            const double pre = bq_tick(hp_sos, hp_st, in[i]);
            double wet = 0.0;
            for (int k = 0; k < os; ++k) {
                double u = (k == 0) ? pre * (double)os : 0.0;
                u = bq_cascade_tick(aa_sos, n_aa, up_st, u);
                u = std::tanh(u * drive);
                u = bq_tick(damp_sos, dos_st, u);
                u = bq_cascade_tick(aa_sos, n_aa, dn_st, u);
                if (k == os - 1) wet = u;
            }
            wet *= output_level;
            if (!std::isfinite(wet)) wet = 0.0;
            out[i] = in[i] * (1.0 - mix) + wet * mix;
        }
    } else {
        double* damp_st = state + 2;
        for (long i = 0; i < n; ++i) {
            const double pre = bq_tick(hp_sos, hp_st, in[i]);
            // the lightweight odd-poly saturation IS moog_fast_tanh
            double wet = moog_fast_tanh(pre * drive);
            wet = bq_tick(damp_sos, damp_st, wet);
            wet *= output_level;
            if (!std::isfinite(wet)) wet = 0.0;
            out[i] = in[i] * (1.0 - mix) + wet * mix;
        }
    }
}

// ---------------------------------------------------------------------------
// Frequency shifter golden kernel — analytic signal (full-rate Hilbert
// allpass pair, as hilbert_process) x quadrature carrier
// (modulation.py:FrequencyShifter, capability parity with
// frequency_shifter.go:78-210). Zero-state Hilbert per call, matching
// the Python one-shot. Returns 0, or -1 on allocation failure.
// ---------------------------------------------------------------------------

int freqshift_process(const double* coeffs, int n_coeffs,
                      double sample_rate, double shift_hz, double* phase,
                      const double* in, double* out_up, double* out_down,
                      long n) {
    const int n_state = 1 + 4 * n_coeffs;
    double* hstate = new (std::nothrow) double[n_state]();
    double* a = new (std::nothrow) double[n];
    double* b = new (std::nothrow) double[n];
    if (!hstate || !a || !b) {
        delete[] hstate; delete[] a; delete[] b;
        return -1;
    }
    hilbert_process(coeffs, n_coeffs, hstate, in, a, b, n);
    const double two_pi = 2.0 * M_PI;
    const double inc = two_pi * std::fabs(shift_hz) / sample_rate;
    const double phase0 = *phase;
    for (long i = 0; i < n; ++i) {
        const double ph = phase0 + (double)i * inc;
        const double c = std::cos(ph), s = std::sin(ph);
        const double up = a[i] * c - b[i] * s;
        const double down = a[i] * c + b[i] * s;
        if (shift_hz < 0.0) { out_up[i] = down; out_down[i] = up; }
        else                { out_up[i] = up;   out_down[i] = down; }
    }
    *phase = std::fmod(phase0 + (double)n * inc, two_pi);
    delete[] hstate; delete[] a; delete[] b;
    return 0;
}

// ---------------------------------------------------------------------------
// Gate hold-timer golden kernel — the full Gate path (processors.py:
// Gate.process, capability parity with gate.go:83-376): feedforward
// expansion gain (dynamics_expand machinery) followed by the hold
// timer: while gain >= 1 the counter resets to hold_samples; otherwise
// unity gain is held until it expires. state layout as
// dynamics_expand_process plus [hold counter] appended.
// ---------------------------------------------------------------------------

void gate_hold_process(const double* in, const double* sc, double* out,
                       double* gains, long n, double lp_coeff,
                       double hp_coeff, int rms_window, double attack,
                       double release, double threshold_log2,
                       double knee_db, double knee_width_log2,
                       double inv_knee_width_log2, double ratio,
                       double range_lin, long hold_samples,
                       double* state) {
    double lp = state[0];
    double hp_lp = state[1];
    double env = state[2];
    const int h = rms_window - 1;
    double* ring = state + 3;
    long hold = (long)state[3 + (h > 0 ? h : 0)];
    for (long i = 0; i < n; ++i) {
        const double level = dyn_detect_tick(
            &lp, &hp_lp, &env, ring, rms_window, lp_coeff, hp_coeff,
            attack, release, sc[i]);
        double g = dyn_expansion_gain_log2(
            level, threshold_log2, knee_db, knee_width_log2,
            inv_knee_width_log2, ratio, range_lin);
        // hold timer (gate.go:360-367 / Gate.process step scan)
        const int reset = g >= 1.0;
        const int held = (!reset) && hold > 0;
        const double g_out = held ? 1.0 : g;
        hold = reset ? hold_samples : (hold > 0 ? hold - 1 : 0);
        if (gains) gains[i] = g_out;
        out[i] = in[i] * g_out;
    }
    state[0] = lp;
    state[1] = hp_lp;
    state[2] = env;
    state[3 + (h > 0 ? h : 0)] = (double)hold;
}

// ---------------------------------------------------------------------------
// Distortion golden kernel — per-sample oracle for all 15 waveshaper
// modes of waveshape.py:Distortion (capability parity with
// distortion.go:537-744), incl. Chebyshev harmonic shaping with its
// DC-bypass one-pole. mode codes follow the Python enum order:
// 0 soft_clip, 1 hard_clip, 2 tanh, 3-10 waveshaper1-8, 11 saturate,
// 12 saturate2, 13 soft_sat, 14 chebyshev. state: [dc_in, dc_out].
// ---------------------------------------------------------------------------

static inline double dist_clamp1(double v) {
    if (v > 1.0) return 1.0;
    if (v < -1.0) return -1.0;
    return v;
}

static inline double dist_sign(double v) {
    return (v > 0.0) - (v < 0.0);
}

void distortion_process(int mode, double drive, double shape, double bias,
                        double clip_level, double output_level, double mix,
                        int cheb_order, const double* cheb_weights,
                        double cheb_gain, int cheb_invert,
                        int cheb_dc_bypass, double* state,
                        const double* in, double* out, long n) {
    double dc_in = state[0];
    double dc_out = state[1];
    int has_w = 0;
    for (int k = 0; k < cheb_order; ++k)
        if (cheb_weights[k] != 0.0) has_w = 1;
    for (long i = 0; i < n; ++i) {
        const double x = (in[i] + bias) * drive;
        double w;
        switch (mode) {
        case 0: w = std::fabs(x) < 1.0 ? 1.5 * (x - x * x * x / 3.0)
                                       : dist_sign(x); break;
        case 1: {
            double c = x;
            if (c > clip_level) c = clip_level;
            if (c < -clip_level) c = -clip_level;
            w = c / clip_level; break;
        }
        case 2: w = std::tanh(x); break;
        case 3: w = dist_clamp1(x / (1.0 + shape * std::fabs(x))); break;
        case 4: w = dist_clamp1((1.0 + shape) * x
                                / (1.0 + shape * std::fabs(x))); break;
        case 5: w = dist_clamp1(x - shape * x * x * x / 3.0); break;
        case 6: w = dist_clamp1(3.0 * x / (2.0 + std::fabs(2.0 * x))); break;
        case 7: {
            const double sc = 1.0 + 4.0 * shape;
            w = dist_clamp1(std::atan(x * sc) / std::atan(sc)); break;
        }
        case 8: w = dist_clamp1((1.0 + shape) * x
                                / (1.0 + shape * x * x)); break;
        case 9: w = std::tanh(x * (1.0 + 6.0 * shape)); break;
        case 10: {
            const double a = 1.0 + 6.0 * shape;
            w = dist_clamp1(dist_sign(x)
                            * (1.0 - std::exp(-std::fabs(x) * a))); break;
        }
        case 11: w = dist_clamp1(x / (1.0 + std::fabs(x))); break;
        case 12: {
            const double x2 = x * (1.0 + 2.0 * shape);
            w = std::fabs(x2) < 1.0 ? 1.5 * (x2 - x2 * x2 * x2 / 3.0)
                                    : dist_sign(x2); break;
        }
        case 13: w = dist_clamp1((2.0 / M_PI)
                                 * std::atan((M_PI / 2.0) * x)); break;
        default: {                                    // 14 chebyshev
            const double xc = dist_clamp1(x);
            double t0 = 1.0, t1 = xc, tn = t1;
            double acc = has_w ? cheb_weights[0] * t1 : 0.0;
            for (int k = 2; k <= cheb_order; ++k) {
                tn = 2.0 * xc * t1 - t0;
                if (has_w) acc += cheb_weights[k - 1] * tn;
                t0 = t1; t1 = tn;
            }
            w = dist_clamp1((has_w ? acc : tn) * cheb_gain
                            * (cheb_invert ? -1.0 : 1.0));
        }
        }
        w *= output_level;
        if (mode == 14 && cheb_dc_bypass) {
            // y_n = x_n - x_{n-1} + pole * y_{n-1}
            const double y = w - dc_in + 0.995 * dc_out;
            dc_in = w;
            dc_out = y;
            w = y;
        }
        if (!std::isfinite(w)) w = 0.0;
        out[i] = in[i] * (1.0 - mix) + w * mix;
    }
    state[0] = dc_in;
    state[1] = dc_out;
}

// ---------------------------------------------------------------------------
// Harmonic bass golden kernel — crossover split, quadratic shaper,
// harmonics HP + limiter-core gain, recombination (waveshape.py:
// HarmonicBass, capability parity with harmonic_bass.go:262-300).
// lp/hp: Butterworth-4 cascades (n_sec sections); hhp: 1 RBJ section.
// Limiter core: peak detector, ratio 100, knee 0, makeup 1. state:
// [lp(2*n_sec), hp(2*n_sec), hhp(2), env], updated in place.
// ---------------------------------------------------------------------------

void harmonic_bass_process(const double* lp_sos, const double* hp_sos,
                           int n_sec, const double* hhp_sos,
                           double input_level, double decay,
                           double hf_gain, double orig_gain,
                           double harm_gain, double lim_attack,
                           double lim_release, double lim_threshold_log2,
                           double lim_comp_factor, const double* in,
                           double* out, long n, double* state) {
    double* lp_st = state;
    double* hp_st = state + 2 * n_sec;
    double* hhp_st = state + 4 * n_sec;
    double env = state[4 * n_sec + 2];
    for (long i = 0; i < n; ++i) {
        const double x = in[i] * input_level;
        const double low = bq_cascade_tick(lp_sos, n_sec, lp_st, x);
        const double high = bq_cascade_tick(hp_sos, n_sec, hp_st, x);
        double shaped = decay + low * (1.0 + low * (-2.0 * decay));
        shaped = bq_tick(hhp_sos, hhp_st, shaped);
        const double lim_in = 4.0 * shaped;
        const double src = std::fabs(lim_in);
        if (src > env) env += (src - env) * lim_attack;
        else           env = src + (env - src) * lim_release;
        const double g = dyn_gain_log2(env, lim_threshold_log2, 0.0, 0.0,
                                       0.0, lim_comp_factor);
        shaped = 0.5 * lim_in * g;
        if (shaped > 1.0) shaped = 1.0;
        if (shaped < -1.0) shaped = -1.0;
        out[i] = orig_gain * low + harm_gain * shaped + hf_gain * high;
    }
    state[4 * n_sec + 2] = env;
}

// ---------------------------------------------------------------------------
// Feedback delay golden kernel — the smoothed-lag fractional delay of
// effects/delay_effect.py (capability parity with delay.go:140-206):
// closed-form smoothing trajectory cur[n] = target +
// (cur0 - target)*(1-sc)^(n+1) clamped to [1, L-2], linear-interp ring
// read, feedback write, wet/dry mix. state: [buf (L,), write, current].
// ---------------------------------------------------------------------------

void delay_effect_process(int buf_len, double feedback, double mix,
                          double target, double smooth_coeff,
                          double* state, const double* in, double* out,
                          long n) {
    double* buf = state;
    long w = (long)state[buf_len];
    double cur0 = state[buf_len + 1];
    const double L = (double)buf_len;
    double c = cur0;
    for (long i = 0; i < n; ++i) {
        c = target + (cur0 - target)
            * std::pow(1.0 - smooth_coeff, (double)(i + 1));
        if (c < 1.0) c = 1.0;
        if (c > L - 2.0) c = L - 2.0;
        double pos = std::fmod((double)w - c, L);
        if (pos < 0.0) pos += L;
        const long i0 = (long)std::floor(pos);
        const double frac = pos - (double)i0;
        const double delayed = buf[i0 % buf_len] * (1.0 - frac)
                               + buf[(i0 + 1) % buf_len] * frac;
        buf[w % buf_len] = in[i] + delayed * feedback;
        ++w;
        out[i] = in[i] * (1.0 - mix) + delayed * mix;
    }
    state[buf_len] = (double)(w % buf_len);
    state[buf_len + 1] = c;   // the clamped smoothed lag, like the engine
}

// ---------------------------------------------------------------------------
// Iterative radix-2 complex FFT (power-of-two n) — the independent
// transform behind the spectral oracles below. Deliberately a
// different algorithm family from XLA's FFT so spectral-effect parity
// checks two implementations, not one.
// ---------------------------------------------------------------------------

static void fft_radix2(double* re, double* im, int n, int inverse) {
    // bit-reversal permutation
    for (int i = 1, j = 0; i < n; ++i) {
        int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) {
            std::swap(re[i], re[j]);
            std::swap(im[i], im[j]);
        }
    }
    for (int len = 2; len <= n; len <<= 1) {
        const double ang = (inverse ? 2.0 : -2.0) * M_PI / (double)len;
        const double wr = std::cos(ang), wi = std::sin(ang);
        for (int i = 0; i < n; i += len) {
            double cr = 1.0, ci = 0.0;
            for (int k = 0; k < len / 2; ++k) {
                const int a = i + k, b = i + k + len / 2;
                const double tr = re[b] * cr - im[b] * ci;
                const double ti = re[b] * ci + im[b] * cr;
                re[b] = re[a] - tr; im[b] = im[a] - ti;
                re[a] += tr;        im[a] += ti;
                const double ncr = cr * wr - ci * wi;
                ci = cr * wi + ci * wr;
                cr = ncr;
            }
        }
    }
    if (inverse) {
        for (int i = 0; i < n; ++i) { re[i] /= n; im[i] /= n; }
    }
}

// ---------------------------------------------------------------------------
// Spectral freeze golden kernel — per-frame STFT freeze oracle
// (effects/spectral.py:SpectralFreeze, capability parity with
// spectral_freeze.go:193-320): Hann-windowed frames every hop, frozen
// frames resynthesize from frame 0's magnitude with held or
// omega*hop-advanced phase, windowed overlap-add with w^2
// normalization floored at norm_floor, wet/dry mix. Framing: n_frames
// = 1 + (n-1)/hop, zero-filled beyond the signal. phase_mode: 0 hold,
// 1 advance. Returns 0, or -1 on allocation failure.
// ---------------------------------------------------------------------------

int spectral_freeze_process(int frame_size, int hop, int frozen,
                            int phase_mode, double mix, double norm_floor,
                            const double* window, const double* x, long n,
                            double* out) {
    const int fs = frame_size;
    const long n_frames = 1 + (n - 1) / hop;
    const int bins = fs / 2 + 1;
    const long total = (n_frames - 1) * hop + fs;
    double* wet = new (std::nothrow) double[total]();
    double* norm = new (std::nothrow) double[total]();
    double* re = new (std::nothrow) double[fs];
    double* im = new (std::nothrow) double[fs];
    double* m0 = new (std::nothrow) double[bins];
    double* p0 = new (std::nothrow) double[bins];
    if (!wet || !norm || !re || !im || !m0 || !p0) {
        delete[] wet; delete[] norm; delete[] re; delete[] im;
        delete[] m0; delete[] p0;
        return -1;
    }
    for (long f = 0; f < n_frames; ++f) {
        const long start = f * hop;
        for (int k = 0; k < fs; ++k) {
            const long j = start + k;
            re[k] = (j < n ? x[j] : 0.0) * window[k];
            im[k] = 0.0;
        }
        fft_radix2(re, im, fs, 0);
        // resynthesis spectrum (full fs bins, conjugate-symmetric)
        double mag, ph;
        for (int b = 0; b < bins; ++b) {
            mag = std::hypot(re[b], im[b]);
            ph = std::atan2(im[b], re[b]);
            if (frozen) {
                if (f == 0) { m0[b] = mag; p0[b] = ph; }
                mag = m0[b];
                ph = p0[b];
                if (phase_mode == 1)
                    ph += 2.0 * M_PI * (double)b / fs * hop * (double)f;
            }
            re[b] = mag * std::cos(ph);
            im[b] = mag * std::sin(ph);
        }
        for (int b = bins; b < fs; ++b) {       // mirror (irfft input)
            re[b] = re[fs - b];
            im[b] = -im[fs - b];
        }
        fft_radix2(re, im, fs, 1);
        for (int k = 0; k < fs; ++k) {
            wet[start + k] += re[k] * window[k];
            norm[start + k] += window[k] * window[k];
        }
    }
    for (long i = 0; i < n; ++i) {
        double w = 0.0;
        if (i < total) {
            const double nz = norm[i] > norm_floor ? norm[i] : norm_floor;
            w = wet[i] / nz;
        }
        out[i] = x[i] * (1.0 - mix) + w * mix;
    }
    delete[] wet; delete[] norm; delete[] re; delete[] im;
    delete[] m0; delete[] p0;
    return 0;
}

// ---------------------------------------------------------------------------
// Spectral pitch-shifter golden kernels (effects/pitch/spectral.py,
// capability parity with pitch_shift_spectral.go:20-36): the bin-shift
// path for |ratio-1| <= 0.15, and the phase-vocoder time-stretch path
// (identity-phase-locking Laroche-Dolson) whose resample-back step the
// Python wrapper runs through the golden polyphase resampler. Framing:
// n_frames = max(1 + (n - fs)/hop, 1) with edge-replicated reads.
// Returns 0 / -1 (allocation).
// ---------------------------------------------------------------------------

static long pv_frames(long n, int fs, int hop) {
    const long nf = 1 + (n - fs) / hop;
    return nf > 1 ? nf : 1;
}

int pitch_binshift_process(int frame_size, int hop, double ratio,
                           double norm_floor, const double* window,
                           const double* x, long n, double* out) {
    if (n <= 0) return 0;                 // edge-replicate needs x[n-1]
    const int fs = frame_size;
    const int bins = fs / 2 + 1;
    const long nf = pv_frames(n, fs, hop);
    const long total = (nf - 1) * hop + fs;
    double* wet = new (std::nothrow) double[total]();
    double* norm = new (std::nothrow) double[total]();
    double* re = new (std::nothrow) double[fs];
    double* im = new (std::nothrow) double[fs];
    double* mag = new (std::nothrow) double[bins];
    double* ph = new (std::nothrow) double[bins];
    if (!wet || !norm || !re || !im || !mag || !ph) {
        delete[] wet; delete[] norm; delete[] re; delete[] im;
        delete[] mag; delete[] ph;
        return -1;
    }
    for (long f = 0; f < nf; ++f) {
        const long start = f * hop;
        for (int k = 0; k < fs; ++k) {
            long j = start + k;
            if (j > n - 1) j = n - 1;            // edge-replicate framing
            re[k] = x[j] * window[k];
            im[k] = 0.0;
        }
        fft_radix2(re, im, fs, 0);
        for (int b = 0; b < bins; ++b) {
            mag[b] = std::hypot(re[b], im[b]);
            ph[b] = std::atan2(im[b], re[b]);
        }
        for (int b = 0; b < bins; ++b) {
            const double src = (double)b / ratio;
            const long i0 = (long)std::floor(src);
            const double frac = src - (double)i0;
            const long i0c = i0 < 0 ? 0 : (i0 > bins - 2 ? bins - 2 : i0);
            double m = 0.0;
            if (i0 < bins - 1)
                m = mag[i0c] * (1.0 - frac) + mag[i0c + 1] * frac;
            const double acc = 2.0 * M_PI * (double)b * hop / fs
                               * (ratio - 1.0) * (double)(f + 1);
            const double p = ph[i0c] + acc;
            re[b] = m * std::cos(p);
            im[b] = m * std::sin(p);
        }
        for (int b = bins; b < fs; ++b) {
            re[b] = re[fs - b];
            im[b] = -im[fs - b];
        }
        fft_radix2(re, im, fs, 1);
        for (int k = 0; k < fs; ++k) {
            wet[start + k] += re[k] * window[k];
            norm[start + k] += window[k] * window[k];
        }
    }
    for (long i = 0; i < n; ++i) {
        double w = 0.0;
        if (i < total) {
            const double nz = norm[i] > norm_floor ? norm[i] : norm_floor;
            w = wet[i] / nz;
        }
        out[i] = w;
    }
    delete[] wet; delete[] norm; delete[] re; delete[] im;
    delete[] mag; delete[] ph;
    return 0;
}

// Stretch path: returns the STRETCHED signal (length (nf-1)*hs + fs)
// into `out` (caller sizes it); the wrapper resamples by ha/hs through
// the golden polyphase kernel.
int pitch_stretch_process(int frame_size, int ha, int hs,
                          double norm_floor, const double* window,
                          const double* x, long n, double* out) {
    if (n <= 0) return 0;                 // edge-replicate needs x[n-1]
    const int fs = frame_size;
    const int bins = fs / 2 + 1;
    const long nf = pv_frames(n, fs, ha);
    const long total = (nf - 1) * (long)hs + fs;
    double* wet = new (std::nothrow) double[total]();
    double* norm = new (std::nothrow) double[total]();
    double* re = new (std::nothrow) double[fs];
    double* im = new (std::nothrow) double[fs];
    double* prev_ph = new (std::nothrow) double[bins];
    double* sum_ph = new (std::nothrow) double[bins];
    if (!wet || !norm || !re || !im || !prev_ph || !sum_ph) {
        delete[] wet; delete[] norm; delete[] re; delete[] im;
        delete[] prev_ph; delete[] sum_ph;
        return -1;
    }
    for (long f = 0; f < nf; ++f) {
        const long start = f * (long)ha;
        for (int k = 0; k < fs; ++k) {
            long j = start + k;
            if (j > n - 1) j = n - 1;
            re[k] = x[j] * window[k];
            im[k] = 0.0;
        }
        fft_radix2(re, im, fs, 0);
        for (int b = 0; b < bins; ++b) {
            const double mag = std::hypot(re[b], im[b]);
            const double ph = std::atan2(im[b], re[b]);
            const double omega = 2.0 * M_PI * (double)b / fs;
            // inst freq from the frame-to-frame phase difference
            // (frame 0 diffs against itself: dphi = -omega*ha wrapped)
            double dphi = ph - (f == 0 ? ph : prev_ph[b]) - omega * ha;
            dphi = std::fmod(dphi + M_PI, 2.0 * M_PI);
            if (dphi < 0.0) dphi += 2.0 * M_PI;
            dphi -= M_PI;
            const double inst = omega + dphi / ha;
            if (f == 0) {
                sum_ph[b] = ph;          // synth phase starts at phase[0]
            } else {
                sum_ph[b] += inst * hs;
            }
            prev_ph[b] = ph;
            re[b] = mag * std::cos(sum_ph[b]);
            im[b] = mag * std::sin(sum_ph[b]);
        }
        for (int b = bins; b < fs; ++b) {
            re[b] = re[fs - b];
            im[b] = -im[fs - b];
        }
        fft_radix2(re, im, fs, 1);
        const long ostart = f * (long)hs;
        for (int k = 0; k < fs; ++k) {
            wet[ostart + k] += re[k] * window[k];
            norm[ostart + k] += window[k] * window[k];
        }
    }
    for (long i = 0; i < total; ++i) {
        const double nz = norm[i] > norm_floor ? norm[i] : norm_floor;
        out[i] = wet[i] / nz;
    }
    delete[] wet; delete[] norm; delete[] re; delete[] im;
    delete[] prev_ph; delete[] sum_ph;
    return 0;
}

// ---------------------------------------------------------------------------
// SPSC ring buffer for real-time block streaming (float32 frames)
// ---------------------------------------------------------------------------

struct RingBuffer {
    float* data;
    long capacity;              // in samples
    std::atomic<long> read_pos;
    std::atomic<long> write_pos;
};

RingBuffer* ring_create(long capacity) {
    if (capacity <= 0) return nullptr;
    auto* rb = new (std::nothrow) RingBuffer();
    if (!rb) return nullptr;
    rb->data = new (std::nothrow) float[capacity]();
    if (!rb->data) { delete rb; return nullptr; }
    rb->capacity = capacity;
    rb->read_pos.store(0);
    rb->write_pos.store(0);
    return rb;
}

void ring_destroy(RingBuffer* rb) {
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

long ring_readable(const RingBuffer* rb) {
    const long w = rb->write_pos.load(std::memory_order_acquire);
    const long r = rb->read_pos.load(std::memory_order_acquire);
    return w - r;
}

long ring_writable(const RingBuffer* rb) {
    return rb->capacity - ring_readable(rb);
}

// Returns samples written (may be < n when full).
long ring_write(RingBuffer* rb, const float* src, long n) {
    const long avail = ring_writable(rb);
    if (n > avail) n = avail;
    long w = rb->write_pos.load(std::memory_order_relaxed);
    for (long i = 0; i < n; ++i) {
        rb->data[(w + i) % rb->capacity] = src[i];
    }
    rb->write_pos.store(w + n, std::memory_order_release);
    return n;
}

// Returns samples read (may be < n when empty).
long ring_read(RingBuffer* rb, float* dst, long n) {
    const long avail = ring_readable(rb);
    if (n > avail) n = avail;
    long r = rb->read_pos.load(std::memory_order_relaxed);
    for (long i = 0; i < n; ++i) {
        dst[i] = rb->data[(r + i) % rb->capacity];
    }
    rb->read_pos.store(r + n, std::memory_order_release);
    return n;
}

}  // extern "C"
