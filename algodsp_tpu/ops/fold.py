"""Exact lane-packing ("folding") for IIR cascades.

Problem: the fused Pallas cascade kernel (`ops/pallas_kernels.py`)
puts channels on the 128-lane axis, so an 8-channel stream uses 6% of
the VPU/MXU lanes. Folding reshapes (C, N) -> (C*F, N/F) so all lanes
work, but each fold's IIR state at its left edge is unknown until the
previous fold has run.

Solution (exact, by linearity — the cascade is LTI): run the folded
cascade with ZERO initial conditions, then add the response to the
true initial state:

    y_true(n) = y_zeroIC(n) + D[n] @ s_f          (within fold f)
    s_{f+1}   = T @ s_f + w_f                      (across folds)

where s_f is the full cascade state at the start of fold f (stacked
per-section [x_{n-1}, x_{n-2}, y_{n-1}, y_{n-2}], dimension 4S), w_f is
the zero-IC final state of fold f (emitted by the Pallas kernel), T is
the 4S x 4S homogeneous state-transfer matrix over one fold, and
D (fold_len, 4S) is the cascade's zero-input output response to each
unit initial-state component. T and D are precomputed host-side in
float64 by doubling (D_{2m} = [D_m; D_m @ A^m]), so the device-side
cost is one tiny F-step scan plus one (C*F, 4S) @ (4S, fold_len)
matmul — ~2*4S FLOPs/sample vs 2*128 per section for the cascade
itself.

This mirrors the reference's streaming-state contract
(`dsp/filter/biquad/chain.go:122-137`): the stitched state is the same
(x1, x2, y1, y2)-per-section vector BiquadChain threads explicitly.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def _cascade_step_matrix(sos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-input single-sample state transition of an SOS cascade.

    State layout: index 4s+j, j in {0: x1, 1: x2, 2: y1, 3: y2} for
    section s, where x1/x2 are the section's input history and y1/y2
    its output history (the BiquadChain state basis).

    Returns (A, c) with s_{n+1} = A @ s_n and y_out(n) = c @ s_n under
    zero external input.
    """
    s_count = sos.shape[0]
    d = 4 * s_count
    A = np.zeros((d, d), dtype=np.float64)

    def e(i):
        v = np.zeros(d)
        v[i] = 1.0
        return v

    v_coef = np.zeros(d)  # external input is zero
    for s in range(s_count):
        b0, b1, b2, a1, a2 = sos[s]
        f = b0 * v_coef + b1 * e(4 * s) + b2 * e(4 * s + 1)
        y = f - a1 * e(4 * s + 2) - a2 * e(4 * s + 3)
        A[4 * s + 0] = v_coef          # new x1 = this section's input
        A[4 * s + 1] = e(4 * s)        # new x2 = old x1
        A[4 * s + 2] = y               # new y1 = this section's output
        A[4 * s + 3] = e(4 * s + 2)    # new y2 = old y1
        v_coef = y                     # feeds the next section
    return A, v_coef


@lru_cache(maxsize=64)
def _transfer_cached(sos_key: bytes, s_count: int, fold_len: int):
    sos = np.frombuffer(sos_key, dtype=np.float64).reshape(s_count, 5)
    A, c = _cascade_step_matrix(sos)
    d = A.shape[0]

    # D by doubling: D_m holds rows c @ A^n for n < m; A^m alongside.
    m = min(fold_len, 128)
    cap = 1
    while cap < fold_len:
        cap *= 2
    D = np.empty((cap, d), dtype=np.float64)
    M = np.eye(d)
    for n in range(m):
        D[n] = c @ M
        M = A @ M
    P = M  # A^m
    while m < fold_len:
        take = min(m, cap - m)
        D[m:m + take] = D[:take] @ P
        if 2 * m < fold_len:
            P = P @ P
        m += take
    D = D[:fold_len]

    # T = A^fold_len by square-and-multiply (fold_len need not be 2^k)
    T = np.eye(d)
    Q = A
    n = fold_len
    while n:
        if n & 1:
            T = Q @ T
        Q = Q @ Q
        n >>= 1
    return T, D


def cascade_transfer(sos, fold_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(T, D) for an (S, 5) SOS cascade over folds of `fold_len` samples.

    T: (4S, 4S) state transfer; D: (fold_len, 4S) output response.
    Host-side float64, cached per (coefficients, fold length).
    """
    sos = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    if sos.ndim != 2 or sos.shape[1] != 5:
        raise ValueError(f"sos must be (S, 5), got {sos.shape}")
    return _transfer_cached(sos.tobytes(), sos.shape[0], int(fold_len))


@lru_cache(maxsize=64)
def _transfer_modal_cached(sos_key: bytes, s_count: int, fold_len: int):
    sos = np.frombuffer(sos_key, dtype=np.float64).reshape(s_count, 5)
    T, D = _transfer_cached(sos_key, s_count, fold_len)
    d = 4 * s_count
    # per-section modal basis on the y-history rows (same construction
    # and rationale as linrec.AR2Kernels: slow complex poles otherwise
    # put entries of magnitude peak(h) into T/D that cancel in f32)
    V = np.eye(d)
    modal = False
    for s in range(s_count):
        b0, b1, b2, a1, a2 = sos[s]
        disc = a1 * a1 - 4.0 * a2
        if disc >= 0.0:
            continue
        m = min(fold_len, 4096)
        hp = np.zeros(m + 1)
        hp[0] = 1.0
        if m >= 1:
            hp[1] = -a1
        for i in range(2, m + 1):
            hp[i] = -a1 * hp[i - 1] - a2 * hp[i - 2]
        if np.max(np.abs(hp)) <= 4.0:
            continue
        alpha, beta = -a1 / 2.0, np.sqrt(-disc) / 2.0
        V[4 * s + 2:4 * s + 4, 4 * s + 2:4 * s + 4] = \
            np.array([[alpha, beta], [1.0, 0.0]])
        modal = True
    if not modal:
        return T, D, None, None, False
    Vinv = np.linalg.inv(V)
    return Vinv @ T @ V, D @ V, V, Vinv, True


def cascade_transfer_modal(sos, fold_len: int):
    """(T', D', V, Vinv, modal): the fold-stitching kernels with slow
    complex-pole sections carried in the modal basis (s' = Vinv @ s).
    When `modal` is False, (T', D') are the direct-basis kernels and
    V/Vinv are None."""
    sos = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    if sos.ndim != 2 or sos.shape[1] != 5:
        raise ValueError(f"sos must be (S, 5), got {sos.shape}")
    return _transfer_modal_cached(sos.tobytes(), sos.shape[0], int(fold_len))


def propagate_fold_states(T, w, s_init):
    """True fold-entry states from zero-IC fold-final states.

    T: (d, d); w: (C, F, d) zero-IC final state of each fold;
    s_init: (C, d) state entering fold 0. Returns (states (C, F, d)
    where states[:, f] = s_f, and s_final (C, d) after the last fold).
    """
    Tj = jnp.asarray(T, w.dtype)

    def step(s, wf):  # wf: (C, d)
        # full-f32 matmul: the TPU default would truncate T to bf16 and
        # recirculate the error through every fold
        nxt = jnp.einsum("cd,ed->ce", s, Tj,
                         preferred_element_type=w.dtype,
                         precision=jax.lax.Precision.HIGHEST) + wf
        return nxt, s

    s_final, entries = jax.lax.scan(step, s_init, jnp.moveaxis(w, 1, 0))
    return jnp.moveaxis(entries, 0, 1), s_final


def fold_correction(states, D, *, precision=jax.lax.Precision.HIGHEST):
    """Output correction D @ s_f for every fold.

    states: (C, F, d); D: (fold_len, d). Returns (C, F, fold_len).
    One MXU matmul — the whole cost of exact fold stitching.
    """
    Dj = jnp.asarray(D, states.dtype)
    return jnp.einsum("cfd,nd->cfn", states, Dj,
                      preferred_element_type=states.dtype,
                      precision=precision)
