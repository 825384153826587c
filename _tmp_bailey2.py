import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
P = jax.lax.Precision.HIGHEST

def timeit(fn, *a, reps=10):
    y = fn(*a); _ = float(jnp.abs(jnp.ravel(y[0] if isinstance(y, tuple) else y))[-1])
    t0 = time.time()
    for _ in range(reps): y = fn(*a)
    _ = float(jnp.abs(jnp.ravel(y[0] if isinstance(y, tuple) else y))[-1])
    return (time.time()-t0)/reps

n = 32768; n1, n2 = 256, 128
R = 520
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((R, n)).astype(np.float32))

j1 = np.arange(n1); j2 = np.arange(n2)
F1 = np.exp(-2j*np.pi*np.outer(j1, j1)/n1)
k2 = np.arange(n2//2+1)
F2 = np.exp(-2j*np.pi*np.outer(j2, k2)/n2)       # (n2, n2/2+1) right-multiply form
T = np.exp(-2j*np.pi*np.outer(j1, j2)/n)
F1s = jnp.asarray(np.concatenate([F1.real, F1.imag], 0).astype(np.float32))  # (2n1, n1)
F2r = jnp.asarray(F2.real.astype(np.float32)); F2i = jnp.asarray(F2.imag.astype(np.float32))
Tr = jnp.asarray(T.real.astype(np.float32)); Ti = jnp.asarray(T.imag.astype(np.float32))

@jax.jit
def stage1(x):
    xr = x.reshape(R, n1, n2)
    # one stacked matmul: (2n1, n1) @ (R, n1, n2) -> einsum
    Y = jnp.einsum('Ka,rab->rKb', F1s, xr, precision=P)   # (R, 2n1, n2)
    return Y

@jax.jit
def stage2(Y):
    Yr, Yi = Y[:, :n1], Y[:, n1:]
    Zr = Yr*Tr - Yi*Ti
    Zi = Yr*Ti + Yi*Tr
    return Zr, Zi

@jax.jit
def stage3(Z):
    Zr, Zi = Z
    Xr = jnp.einsum('rKb,bC->rKC', Zr, F2r, precision=P) - jnp.einsum('rKb,bC->rKC', Zi, F2i, precision=P)
    Xi = jnp.einsum('rKb,bC->rKC', Zr, F2i, precision=P) + jnp.einsum('rKb,bC->rKC', Zi, F2r, precision=P)
    return Xr, Xi

@jax.jit
def stage4(X):
    Xr, Xi = X
    a = jnp.swapaxes(Xr, -1, -2).reshape(R, -1)[..., :n//2+1]
    b = jnp.swapaxes(Xi, -1, -2).reshape(R, -1)[..., :n//2+1]
    return a, b

@jax.jit
def full(x):
    return stage4(stage3(stage2(stage1(x))))

Y = stage1(x); Z = stage2(Y); X = stage3(Z)
print(f"stage1 inner-DFT : {timeit(stage1, x)*1e3:6.2f} ms")
print(f"stage2 twiddle   : {timeit(stage2, Y)*1e3:6.2f} ms")
print(f"stage3 outer-DFT : {timeit(stage3, Z)*1e3:6.2f} ms")
print(f"stage4 transpose : {timeit(stage4, X)*1e3:6.2f} ms")
print(f"full             : {timeit(full, x)*1e3:6.2f} ms")
# correctness
a, b = full(x)
got = np.asarray(a) + 1j*np.asarray(b)
want = np.fft.rfft(np.asarray(x).astype(np.float64), n)
snr = -20*np.log10(np.linalg.norm(got-want)/np.linalg.norm(want))
print("snr:", round(float(snr),1), "dB")
