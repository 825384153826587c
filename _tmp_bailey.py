import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp

def timeit(fn, *a, reps=10):
    y = fn(*a); _ = float(jnp.abs(jnp.ravel(y if not isinstance(y, tuple) else y[0]))[-1])
    t0 = time.time()
    for _ in range(reps): y = fn(*a)
    _ = float(jnp.abs(jnp.ravel(y if not isinstance(y, tuple) else y[0]))[-1])
    return (time.time()-t0)/reps

def factor(n):
    # pick n1 ~ sqrt(n), both pow2
    lg = n.bit_length() - 1
    l1 = lg // 2
    return 1 << l1, 1 << (lg - l1)

def plan(n, dtype=np.float32):
    n1, n2 = factor(n)
    j1 = np.arange(n1)
    F1 = np.exp(-2j*np.pi*np.outer(j1, j1)/n1)          # (n1,n1)
    Fh = n//2 + 1
    # output index k = k2*n1 + k1; need k <= n/2 -> k2 over full? k2 in [0,n2), k1 in [0,n1)
    # simpler: compute full then slice? avoid: compute outer DFT only for k2 rows needed.
    # k = k2*n1+k1 <= n/2 -> since we want all k in [0, n/2], the set {(k1,k2)} is k2 < n2/2 full, plus k2 = n2/2 with k1=0.. only k1 <= 0? n/2 = (n2/2)*n1. So k2 in [0, n2/2] and for k2=n2/2 only k1=0.
    j2 = np.arange(n2)
    k2 = np.arange(n2//2 + 1)
    F2 = np.exp(-2j*np.pi*np.outer(k2, j2)/n2)          # (n2/2+1, n2)
    T = np.exp(-2j*np.pi*np.outer(j1, j2)/n)            # twiddle (n1, n2) for W^{k1 j2}
    c = lambda M: (jnp.asarray(M.real.astype(dtype)), jnp.asarray(M.imag.astype(dtype)))
    return n1, n2, c(F1), c(F2), c(T)

@functools.partial(jax.jit, static_argnums=(1, 2))
def rfft4(x, n, prec):
    # x: (..., m) real, returns (..., n//2+1) complex
    P = plans[n]
    n1, n2, (F1r, F1i), (F2r, F2i), (Tr, Ti) = P
    m = x.shape[-1]
    if m < n:
        x = jnp.pad(x, [(0,0)]*(x.ndim-1) + [(0, n-m)])
    xr = x.reshape(x.shape[:-1] + (n1, n2))              # j1, j2
    dn = (((1,), (1,)), ((), ()))
    mm = lambda A, B: jax.lax.dot_general(A, B, (((A.ndim-2,), (1,)), ((), ())), precision=prec)
    # inner DFT over j1: Y[k1, j2] = sum_j1 F1[k1,j1] x[j1,j2]
    # einsum 'rab,Ka->rKb'
    Yr = jnp.einsum('...ab,Ka->...Kb', xr, F1r, precision=prec)
    Yi = jnp.einsum('...ab,Ka->...Kb', xr, F1i, precision=prec)
    # twiddle
    Zr = Yr*Tr - Yi*Ti
    Zi = Yr*Ti + Yi*Tr
    # outer DFT over j2: X[k1, k2] = sum_j2 F2[k2,j2] Z[k1,j2]
    Xr = jnp.einsum('...Kb,Cb->...KC', Zr, F2r, precision=prec) - jnp.einsum('...Kb,Cb->...KC', Zi, F2i, precision=prec)
    Xi = jnp.einsum('...Kb,Cb->...KC', Zr, F2i, precision=prec) + jnp.einsum('...Kb,Cb->...KC', Zi, F2r, precision=prec)
    # X index k = k2*n1 + k1 -> transpose to (..., k2, k1) then flatten, keep first n//2+1
    Xr = jnp.swapaxes(Xr, -1, -2).reshape(x.shape[:-1] + (-1,))[..., :n//2+1]
    Xi = jnp.swapaxes(Xi, -1, -2).reshape(x.shape[:-1] + (-1,))[..., :n//2+1]
    return Xr, Xi

rng = np.random.default_rng(0)
for (R, n) in [(520, 32768), (512, 2048)]:
    plans = {n: plan(n)}
    x = rng.standard_normal((R, n)).astype(np.float32)
    xj = jnp.asarray(x)
    f_ref = jax.jit(lambda a: (jnp.real(jnp.fft.rfft(a, n)), jnp.imag(jnp.fft.rfft(a, n))))
    want = np.fft.rfft(x.astype(np.float64), n)
    for prec in ["default", "high", "highest"]:
        f = lambda a: rfft4(a, n, getattr(jax.lax.Precision, prec.upper()))
        t = timeit(f, xj)
        gr, gi = f(xj)
        got = np.asarray(gr) + 1j*np.asarray(gi)
        err = np.abs(got - want).max() / np.abs(want).max()
        snr = -20*np.log10(np.linalg.norm(got-want)/np.linalg.norm(want))
        print(f"R={R} n={n} 4step/{prec:8s}: {t*1e3:7.2f} ms  relerr {err:.2e}  snr {snr:5.1f} dB")
    t0 = timeit(f_ref, xj)
    gr, gi = f_ref(xj)
    got = np.asarray(gr) + 1j*np.asarray(gi)
    snr = -20*np.log10(np.linalg.norm(got-want)/np.linalg.norm(want))
    print(f"R={R} n={n} jnp.rfft       : {t0*1e3:7.2f} ms  snr {snr:5.1f} dB")
