"""Prototype: fully-fused Pallas FDL convolution kernel.

Per grid step (channel, frame): load two (rB,128) sample blocks,
4-step matmul FFT in VMEM (full-grid (k1,k2) layout, no transposes),
P-tap spectral MAC against a VMEM ring of the last P frame spectra,
4-step inverse producing only the kept half (overlap-save discard).
Spectra never touch HBM.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _plan(B: int, P: int):
    """Host-side constants for frame FFT size n=2B with n2=128 lanes."""
    n = 2 * B
    n2 = LANES
    n1 = n // n2
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    # forward: X[k1,k2] = sum_{j2} W_n2^{j2 k2} [W_n^{j2 k1}] sum_{j1} W_n1^{j1 k1} x[j1,j2]
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)          # (k1, j1)
    F1s = np.concatenate([F1.real, F1.imag], 0)                # (2n1, n1)
    T = np.exp(-2j * np.pi * np.outer(j1, j2) / n)             # (k1, j2)
    F2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)           # (j2->k2 right-mult: (j2, k2))
    # inverse (scaled by 1/n), output rows j1 in [n1/2, n1)
    E2 = np.exp(2j * np.pi * np.outer(j2, j2) / n2)            # (k2, j2)
    j1h = np.arange(n1 // 2, n1)
    E1 = np.exp(2j * np.pi * np.outer(j1h, j1) / n1) / n       # (j1half, k1)
    f32 = lambda a: jnp.asarray(np.ascontiguousarray(a), jnp.float32)
    return dict(n1=n1, n2=n2,
                F1s=f32(F1s), Tr=f32(T.real), Ti=f32(T.imag),
                F2r=f32(F2.real), F2i=f32(F2.imag),
                E2r=f32(E2.real), E2i=f32(E2.imag),
                E1r=f32(E1.real), E1i=f32(E1.imag))


def kernel_spectra(kernel: np.ndarray, B: int, P: int) -> np.ndarray:
    """(P, 2, n1, n2) partition spectra on the (k1, k2) grid."""
    n = 2 * B
    n1, n2 = n // LANES, LANES
    padded = np.zeros(P * B)
    padded[:kernel.size] = kernel
    parts = padded.reshape(P, B)
    full = np.fft.fft(parts, n, axis=-1)                       # (P, n)
    grid = full.reshape(P, n2, n1).transpose(0, 2, 1)          # X[k2*n1+k1] -> [k1,k2]
    return np.stack([grid.real, grid.imag], 1).astype(np.float32)  # (P,2,n1,n2)


def fdl_conv_pallas(x, hgrid, B: int, P: int, precision):
    """x: (C, N) f32, N % B == 0. Returns y: (C, N) causal conv."""
    C, N = x.shape
    n = 2 * B
    n1, n2 = n // LANES, LANES
    nf = N // B
    plan = _plan(B, P)
    F1s, Tr, Ti = plan["F1s"], plan["Tr"], plan["Ti"]
    F2r, F2i = plan["F2r"], plan["F2i"]
    E2r, E2i = plan["E2r"], plan["E2i"]
    E1r, E1i = plan["E1r"], plan["E1i"]
    rows_per_blk = B // n2                                      # = n1/2

    # ext = [zeros(B), x] viewed as (C, rows, 128)
    ext = jnp.concatenate([jnp.zeros((C, B), x.dtype), x], -1)
    ext = ext.reshape(C, -1, n2)

    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                           precision=precision)

    def kern(prev_ref, cur_ref, h_ref, f1_ref, tr_ref, ti_ref,
             f2r_ref, f2i_ref, e2r_ref, e2i_ref, e1r_ref, e1i_ref,
             y_ref, ring_ref):
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        frame = jnp.concatenate([prev_ref[0], cur_ref[0]], 0)   # (n1, n2)
        # forward FFT
        Y = mm(f1_ref[...], frame)                              # (2n1, n2)
        Yr, Yi = Y[:n1], Y[n1:]
        Zr = Yr * tr_ref[...] - Yi * ti_ref[...]
        Zi = Yr * ti_ref[...] + Yi * tr_ref[...]
        Xr = mm(Zr, f2r_ref[...]) - mm(Zi, f2i_ref[...])        # (n1, n2)
        Xi = mm(Zr, f2i_ref[...]) + mm(Zi, f2r_ref[...])
        slot = jax.lax.rem(f, P)
        ring_ref[slot, 0] = Xr
        ring_ref[slot, 1] = Xi
        # P-tap spectral MAC over the ring
        acc_r = jnp.zeros((n1, n2), jnp.float32)
        acc_i = jnp.zeros((n1, n2), jnp.float32)
        for p in range(P):
            s = jax.lax.rem(slot - p + P, P)
            xr = ring_ref[s, 0]
            xi = ring_ref[s, 1]
            hr = h_ref[p, 0]
            hi = h_ref[p, 1]
            acc_r = acc_r + xr * hr - xi * hi
            acc_i = acc_i + xr * hi + xi * hr
        # inverse FFT, keep rows j1 in [n1/2, n1)
        Ar = mm(acc_r, e2r_ref[...]) - mm(acc_i, e2i_ref[...])
        Ai = mm(acc_r, e2i_ref[...]) + mm(acc_i, e2r_ref[...])
        Br = Ar * tr_ref[...] + Ai * ti_ref[...]
        Bi = Ai * tr_ref[...] - Ar * ti_ref[...]
        y_ref[0] = mm(e1r_ref[...], Br) - mm(e1i_ref[...], Bi)  # (n1/2, n2)

    const = lambda shp: pl.BlockSpec(shp, lambda c, f: tuple([0]*len(shp)),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(C, nf),
        in_specs=[
            pl.BlockSpec((1, rows_per_blk, n2), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_blk, n2), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            const((P, 2, n1, n2)),
            const((2 * n1, n1)),
            const((n1, n2)), const((n1, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n1 // 2, n1)), const((n1 // 2, n1)),
        ],
        out_specs=pl.BlockSpec((1, rows_per_blk, n2), lambda c, f: (c, f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nf * rows_per_blk, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, 2, n1, n2), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(ext[:, :-rows_per_blk], ext[:, rows_per_blk:], jnp.asarray(hgrid),
      F1s, Tr, Ti, F2r, F2i, E2r, E2i, E1r, E1i)
    return out.reshape(C, N)


if __name__ == "__main__":
    import sys
    prec = jax.lax.Precision.HIGHEST
    B, P = 1 << 14, 8
    C, N = 8, 1 << 20
    rng = np.random.default_rng(0)
    ir = (rng.standard_normal(P * B) * np.exp(-np.arange(P * B) / 3e4)).astype(np.float32)
    hg = kernel_spectra(ir, B, P)
    x = rng.standard_normal((C, N)).astype(np.float32)
    f = jax.jit(lambda a: fdl_conv_pallas(a, hg, B, P, prec))
    xj = jnp.asarray(x)
    y = f(xj); _ = float(jnp.ravel(y)[-1])
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        y = f(xj)
    _ = float(jnp.ravel(y)[-1])
    dt = (time.time() - t0) / reps
    print(f"fused FDL kernel: {dt*1e3:.2f} ms  ({C*N/dt/1e6:.0f} Msamp/s)")
    # oracle on a slice
    M = 3 * B
    want = np.stack([np.convolve(xi.astype(np.float64), ir.astype(np.float64))[:M]
                     for xi in x[:, :M]])
    got = np.asarray(y)[:, :M]
    snr = -20 * np.log10(np.linalg.norm(got - want) / np.linalg.norm(want))
    print(f"SNR vs f64 oracle (first {M} samples): {snr:.1f} dB")
