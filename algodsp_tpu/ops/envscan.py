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
`ops/pallas/envscan_pallas.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
      envelope trajectory.
    """
    targets = jnp.asarray(targets)
    dtype = targets.dtype
    attack = jnp.asarray(attack, dtype=dtype)
    release = jnp.asarray(release, dtype=dtype)
    env0 = jnp.asarray(env0, dtype=dtype)

    # scalar ballistics on TPU: flatten leading dims onto the Pallas
    # kernel's channel-lane axis (one fused VMEM loop)
    if (jax.default_backend() == "tpu" and targets.ndim >= 2
            and attack.ndim == 0 and release.ndim == 0):
        from algodsp_tpu.ops.pallas_kernels import envelope_scan_pallas
        lead = targets.shape[:-1]
        t = targets.shape[-1]
        e0 = jnp.broadcast_to(env0, lead).reshape(-1)
        envf, traj = envelope_scan_pallas(targets.reshape(-1, t), e0,
                                          attack, release)
        return envf.reshape(lead), traj.reshape(lead + (t,))

    # scan over time: move time to axis 0
    xs = jnp.moveaxis(targets, -1, 0)

    def step(env, t):
        coeff = jnp.where(t > env, attack, release)
        env = env + coeff * (t - env)
        return env, env

    env_final, ys = jax.lax.scan(step, env0, xs, unroll=unroll)
    return env_final, jnp.moveaxis(ys, 0, -1)
