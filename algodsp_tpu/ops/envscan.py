"""Envelope-follower scan: one-pole smoothing with branching
attack/release coefficients.

This is the recurrence behind `signal.EnvelopeFollower`
(`dsp/signal/generate.go:322-350`) and the dynamics-core envelope
(`dsp/effects/dynamics/core.go:339-359`):

    env_n = env_{n-1} + a_n * (t_n - env_{n-1}),
    a_n   = attack  if t_n > env_{n-1} else release.

Because a_n depends on the running output, this recurrence is *not*
linear and cannot be turned into an associative scan exactly. It is the
one op in the framework that stays sequential along time; we keep it
fast by running all channels/batches in the carry (VPU lanes advance
together each step) via `lax.scan`. A Pallas kernel variant keeps the
whole signal in VMEM with channels on the 128-lane axis (see
`ops/pallas_kernels.py`).

Differentiability: the op carries a custom VJP, so every dynamics
processor built on it (compressor/gate/limiter/...) is differentiable
on BOTH backends — including the TPU Pallas forward, which JAX cannot
autodiff through. The recurrence is piecewise affine in
(targets, env0, attack, release) once the per-sample attack/release
selection is fixed, and the selection itself has zero gradient almost
everywhere, so the adjoint is the exact reverse-time linear recurrence

    s_n = G_n + (1 - a_{n+1}) s_{n+1}        (s_N seeded by the carry
                                              cotangent),
    dL/dt_n   = a_n s_n,
    dL/denv_0 = (1 - a_1) s_1,
    dL/dattack  = sum_n s_n (t_n - env_{n-1}) [a_n = attack],
    dL/drelease = sum_n s_n (t_n - env_{n-1}) [a_n = release],

which matches jax.grad of the plain lax.scan formulation exactly
(asserted in tests/test_diff.py). The adjoint re-uses the saved
forward trajectory, so the backward pass is ONE reversed scan — no
recomputation of the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unbroadcast(grad, shape):
    """Reduce `grad` back to `shape` by summing broadcasted axes."""
    if grad.shape == tuple(shape):
        return grad
    extra = grad.ndim - len(shape)
    if extra > 0:
        grad = jnp.sum(grad, axis=tuple(range(extra)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and grad.shape[i] != 1)
    if axes:
        grad = jnp.sum(grad, axis=axes, keepdims=True)
    return grad.reshape(shape)


def _forward(targets, env0, attack, release, unroll):
    """Backend-dispatched forward (Pallas on TPU where supported)."""
    if jax.default_backend() == "tpu" and targets.ndim >= 2:
        from algodsp_tpu.ops.pallas_kernels import envelope_scan_pallas
        lead = targets.shape[:-1]
        t = targets.shape[-1]
        if attack.ndim == 0 and release.ndim == 0:
            # scalar ballistics: flatten leading dims onto the kernel's
            # channel-lane axis (one fused VMEM loop)
            e0 = jnp.broadcast_to(env0, lead).reshape(-1)
            envf, traj = envelope_scan_pallas(targets.reshape(-1, t), e0,
                                              attack, release)
            return envf.reshape(lead), traj.reshape(lead + (t,))
        if targets.ndim == 2 and attack.ndim <= 1 and release.ndim <= 1:
            # per-channel ballistics on a (C, T) batch
            e0 = jnp.broadcast_to(env0, lead)
            return envelope_scan_pallas(targets, e0, attack, release)

    # scan over time: move time to axis 0
    xs = jnp.moveaxis(targets, -1, 0)
    e0 = jnp.broadcast_to(env0, targets.shape[:-1])

    def step(env, t):
        coeff = jnp.where(t > env, attack, release)
        env = env + coeff * (t - env)
        return env, env

    env_final, ys = jax.lax.scan(step, e0, xs, unroll=unroll)
    return env_final, jnp.moveaxis(ys, 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _envelope_vjp(targets, env0, attack, release, unroll):
    return _forward(targets, env0, attack, release, unroll)


def _envelope_fwd(targets, env0, attack, release, unroll):
    out = _forward(targets, env0, attack, release, unroll)
    return out, (targets, env0, attack, release, out[1])


def _envelope_bwd(unroll, res, cot):
    targets, env0, attack, release, traj = res
    g_final, G = cot
    lead = targets.shape[:-1]
    env_prev = jnp.concatenate(
        [jnp.broadcast_to(env0, lead)[..., None], traj[..., :-1]], axis=-1)
    sel = targets > env_prev
    # ballistics broadcast over the *lead* axes; add the time axis
    att_b = jnp.broadcast_to(attack, lead)[..., None]
    rel_b = jnp.broadcast_to(release, lead)[..., None]
    a = jnp.where(sel, att_b, rel_b)                          # (..., T)
    m = 1.0 - a
    delta = targets - env_prev

    # reverse-time adjoint: s_n = G_n + m_{n+1} s_{n+1}
    Gs = jnp.moveaxis(G, -1, 0)
    ms = jnp.moveaxis(m, -1, 0)

    def step(carry, gm):
        g_n, m_n = gm
        s = g_n + carry
        return m_n * s, s

    denv0, ss = jax.lax.scan(step, g_final, (Gs, ms), reverse=True,
                             unroll=unroll)
    s = jnp.moveaxis(ss, 0, -1)                               # (..., T)

    dtargets = a * s
    sd = s * delta
    datt = _unbroadcast(jnp.sum(jnp.where(sel, sd, 0.0), axis=-1),
                        attack.shape)
    drel = _unbroadcast(jnp.sum(jnp.where(sel, 0.0, sd), axis=-1),
                        release.shape)
    denv0 = _unbroadcast(denv0, env0.shape)
    return dtargets, denv0, datt, drel


_envelope_vjp.defvjp(_envelope_fwd, _envelope_bwd)


def envelope_scan(targets, env0, attack, release, *, unroll: int = 8):
    """Run the branching one-pole envelope along the last axis.

    Args:
      targets: (..., T) detector inputs (already rectified/squared as the
        caller requires).
      env0: (...,) initial envelope (carry state).
      attack, release: scalar coefficients in [0, 1], or arrays
        broadcastable to (...,) for per-channel ballistics.
      unroll: scan unroll factor (amortizes per-step overhead).

    Returns:
      (env_final, envelopes): carry after the block, and the (..., T)
      envelope trajectory. Differentiable w.r.t. every array argument
      in REVERSE mode only (custom VJP; see module docstring) —
      forward-mode (`jax.jvp`/`jax.jacfwd`) through this op raises,
      because `jax.custom_vjp` removes the JVP rule. Use
      `jax.jacrev`, or the plain-scan formulation in tests, if a
      forward-mode Jacobian is genuinely needed.
    """
    targets = jnp.asarray(targets)
    dtype = targets.dtype
    attack = jnp.asarray(attack, dtype=dtype)
    release = jnp.asarray(release, dtype=dtype)
    env0 = jnp.asarray(env0, dtype=dtype)
    return _envelope_vjp(targets, env0, attack, release, unroll)
