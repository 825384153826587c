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
