import os, time
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
R = 520; REP = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((R, n)).astype(np.float32))

j1 = np.arange(n1); j2 = np.arange(n2)
F1 = np.exp(-2j*np.pi*np.outer(j1, j1)/n1)
k2 = np.arange(n2//2+1)
F2 = np.exp(-2j*np.pi*np.outer(j2, k2)/n2)
T = np.exp(-2j*np.pi*np.outer(j1, j2)/n)
F1s = jnp.asarray(np.concatenate([F1.real, F1.imag], 0).astype(np.float32))
F2r, F2i = jnp.asarray(F2.real.astype(np.float32)), jnp.asarray(F2.imag.astype(np.float32))
Tr, Ti = jnp.asarray(T.real.astype(np.float32)), jnp.asarray(T.imag.astype(np.float32))

def rfft4(x):
    xr = x.reshape(x.shape[0], n1, n2)
    Y = jnp.einsum('Ka,rab->rKb', F1s, xr, precision=P)
    Yr, Yi = Y[:, :n1], Y[:, n1:]
    Zr = Yr*Tr - Yi*Ti
    Zi = Yr*Ti + Yi*Tr
    Xr = jnp.einsum('rKb,bC->rKC', Zr, F2r, precision=P) - jnp.einsum('rKb,bC->rKC', Zi, F2i, precision=P)
    Xi = jnp.einsum('rKb,bC->rKC', Zr, F2i, precision=P) + jnp.einsum('rKb,bC->rKC', Zi, F2r, precision=P)
    a = jnp.swapaxes(Xr, -1, -2).reshape(x.shape[0], -1)[..., :n//2+1]
    b = jnp.swapaxes(Xi, -1, -2).reshape(x.shape[0], -1)[..., :n//2+1]
    return a, b

@jax.jit
def loop4(x):
    def body(i, acc):
        a, b = rfft4(x + i.astype(x.dtype))
        return acc + a[:, -1] + b[:, -1]
    return jax.lax.fori_loop(0, REP, body, jnp.zeros((R,), x.dtype))

@jax.jit
def loopj(x):
    def body(i, acc):
        s = jnp.fft.rfft(x + i.astype(x.dtype), n)
        return acc + jnp.real(s[:, -1]) + jnp.imag(s[:, -1])
    return jax.lax.fori_loop(0, REP, body, jnp.zeros((R,), x.dtype))

t4 = timeit(loop4, x); tj = timeit(loopj, x)
print(f"in-graph per-FFT  4step: {t4/REP*1e3:6.2f} ms   jnp.rfft: {tj/REP*1e3:6.2f} ms   speedup {tj/t4:.2f}x")
