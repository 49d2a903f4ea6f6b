"""Matrix-state parallel Kalman: exact state-space marginals for additive
OU / Matern32 / Matern52 / Constant / Linear (+ Noise) formulas.

Generalizes ops/markov.py's scalar OU path to a d-dimensional Gauss-Markov
state.  Each kernel leaf contributes a state block:

  OU(l)        d=1  F = -λ,  λ = 1/l,        P∞ = 1,              H = [1]
  Matern32(l)  d=2  λ = √3/l, F companion,   P∞ = diag(1, λ²),    H = [1,0]
  Matern52(l)  d=3  λ = √5/l, F companion,   P∞ = [[1,0,-λ²/3],
                                                    [0,λ²/3,0],
                                                    [-λ²/3,0,λ⁴]], H = [1,0,0]
  Constant(c)  d=1  A = 1, Q = 0,            P∞ = c,              H = [1]
  Linear(:x,c) d=2  A = I, Q = 0,            P∞ = diag(1, c),     H_k = [x_k, 1]
                    (k(x,x') = x·x' + c = [x,1] diag(1,c) [x',1]ᵀ)
  Noise        —    adds to the observation variance R

Critically damped Matern blocks have transition exp(FΔ) = e^{-λΔ} Σ (NΔ)^j/j!
with N = F + λI nilpotent (char. poly (s+λ)^ν), so A_k is a short polynomial
— no matrix exponential.  Process noise over a step is Q_k = P∞ − A_k P∞ A_kᵀ
for every stationary block (and 0 for the static A=I blocks), so one formula
covers all leaves.  The Matern52 P∞ comes from the Lyapunov equation
F P + P Fᵀ + L q Lᵀ = 0 with q = 16/3 λ⁵ (unit marginal variance).

Filtering uses the associative element algebra of ops/markov.py with the
matrix combine

    D = I + C1 J2
    A = A2 D⁻¹ A1               η = A1ᵀ Dᵀ⁻¹ (η2 − J2 b1) + η1
    b = A2 D⁻¹ (b1 + C1 η2) + b2    (Dᵀ = I + J2 C1)
    C = A2 D⁻¹ C1 A2ᵀ + C2      J = A1ᵀ Dᵀ⁻¹ J2 A1 + J1

evaluated with ``lax.associative_scan``: O(n log n · d³) work, O(log n)
depth.  Exact vs the dense MVN marginal (tested).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_LOG_2PI = math.log(2.0 * math.pi)


class _MElems(NamedTuple):
    A: jnp.ndarray    # (n, d, d)
    b: jnp.ndarray    # (n, d)
    C: jnp.ndarray    # (n, d, d)
    eta: jnp.ndarray  # (n, d)
    J: jnp.ndarray    # (n, d, d)


#: max state dim whose elimination is fully UNROLLED into the caller's HLO.
#: The combine functions below are themselves inlined at every level of an
#: unrolled ``lax.associative_scan``, so an unrolled d-step elimination
#: multiplies into O(d · log n) HLO ops — fine to d≈21 (the Periodic
#: block), but at the RQ block's d=48 the program reaches hour-scale XLA
#: compile times.  Above the threshold the SAME elimination runs as a
#: ``lax.scan`` over pivot indices: one traced body, compile cost O(1) in d.
_SOLVE_UNROLL_MAX_D = 24


def _solve_scan(M: jnp.ndarray, d: int) -> jnp.ndarray:
    """Gauss-Jordan sweep over the (..., d, d+k) augmented matrix as a
    lax.scan over pivot indices (reverse-mode differentiable)."""

    def step(M, i):
        row = lax.dynamic_slice_in_dim(M, i, 1, axis=-2)        # (...,1,w)
        piv = lax.dynamic_slice_in_dim(row, i, 1, axis=-1)      # (...,1,1)
        row = row / piv
        col = lax.dynamic_slice_in_dim(M, i, 1, axis=-1)        # (...,d,1)
        M = M - col * row
        # restore the pivot row (eliminated itself to 0 above)
        return lax.dynamic_update_slice_in_dim(M, row, i, axis=-2), None

    M, _ = lax.scan(step, M, jnp.arange(d))
    return M


def solve_small(D: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched D⁻¹B via UNPIVOTED Gauss-Jordan elimination — pure HLO
    (elementwise + broadcasts), never a LAPACK/custom-call solve.

    Replaces ``jnp.linalg.solve`` in the filter/smoother combines:
    (1) the axon TPU worker kernel-faults on batched LU custom calls in
    exactly these programs (the whitened-sde ChEES probe crashed the worker
    with NO cholesky anywhere — batched LU was the remaining custom call);
    (2) at d ≤ ~21 an unrolled elimination fuses into the surrounding
    elementwise work instead of paying per-op dispatch for the LU pair.
    No pivoting is safe here: every solved system is I + (PSD)(PSD) or a
    predicted covariance + noise — eigenvalues bounded away from 0 with
    real part ≥ 1 (combine docstring), so leading minors stay well
    -conditioned.  d ≤ 24 unrolls into the caller (fusion + zero loop
    overhead); larger d runs the identical sweep as a lax.scan (see
    _SOLVE_UNROLL_MAX_D — compile-time-safe for the RQ block's d=48 and
    any Kronecker product dimension, with no custom call at ANY size)."""
    d = D.shape[-1]
    M = jnp.concatenate([D, B], axis=-1)            # (..., d, d+k) augmented
    if d > _SOLVE_UNROLL_MAX_D:
        return _solve_scan(M, d)[..., :, d:]
    for i in range(d):
        piv = M[..., i:i + 1, :] / M[..., i:i + 1, i:i + 1]
        M = M - M[..., :, i:i + 1] * piv
        # restore the pivot row (eliminated itself to 0 above)
        M = jnp.concatenate([M[..., :i, :], piv, M[..., i + 1:, :]], axis=-2)
    return M[..., :, d:]


def _mcombine(e1: _MElems, e2: _MElems) -> _MElems:
    d = e1.A.shape[-1]
    I = jnp.eye(d, dtype=e1.A.dtype)
    D = I + e1.C @ e2.J                       # (n, d, d)
    Dt = I + e2.J @ e1.C
    # (I + C J) with C, J PSD is nonsingular (eigenvalues of CJ are >= 0).
    # ONE factorization per system: all D-solves share a concatenated RHS
    # [A1 | b1 + C1 η2 | C1] (and Dt-solves [η2 − J2 b1 | J2]) — 2 LUs per
    # combine instead of 5, which matters both for FLOPs at the Periodic
    # block's d=21 and for op count on the dispatch-bound TPU backend.
    bC = (e1.b + (e1.C @ e2.eta[..., None])[..., 0])[..., None]
    X = solve_small(D, jnp.concatenate([e1.A, bC, e1.C], axis=-1))
    XA, Xb, XC = X[..., :d], X[..., d], X[..., d + 1:]
    A = e2.A @ XA
    b = (e2.A @ Xb[..., None])[..., 0] + e2.b
    C = e2.A @ XC @ jnp.swapaxes(e2.A, -1, -2) + e2.C
    rhs = (e2.eta - (e2.J @ e1.b[..., None])[..., 0])[..., None]
    Y = solve_small(Dt, jnp.concatenate([rhs, e2.J], axis=-1))
    A1t = jnp.swapaxes(e1.A, -1, -2)
    eta = (A1t @ Y[..., :1])[..., 0] + e1.eta
    J = A1t @ Y[..., 1:] @ e1.A + e1.J
    return _MElems(A, b, C, eta, J)


class _CElems(NamedTuple):
    """Covariance-only filter element (the _MElems mean parts dropped)."""

    A: jnp.ndarray    # (n, d, d)
    C: jnp.ndarray    # (n, d, d)
    J: jnp.ndarray    # (n, d, d)


def _ccombine(e1: _CElems, e2: _CElems) -> _CElems:
    # _mcombine restricted to the covariance recursion: with y ≡ 0 the mean
    # parts (b, η) are identically zero through EVERY combine (b' = solve
    # terms of zeros, η' likewise), so they can be dropped rather than
    # computed-and-discarded.  The fused [A|b|C] augmented solve in
    # _mcombine couples the dead mean column into the elimination, which
    # defeats XLA's dead-code elimination — this variant is the DCE done by
    # hand for the covariance-only consumers (ss_innovation_coeffs: the
    # whitened-sde leapfrog hot path, where the scan is op-count-bound).
    d = e1.A.shape[-1]
    I = jnp.eye(d, dtype=e1.A.dtype)
    D = I + e1.C @ e2.J
    Dt = I + e2.J @ e1.C
    X = solve_small(D, jnp.concatenate([e1.A, e1.C], axis=-1))
    XA, XC = X[..., :d], X[..., d:]
    A = e2.A @ XA
    C = e2.A @ XC @ jnp.swapaxes(e2.A, -1, -2) + e2.C
    Y = solve_small(Dt, e2.J)
    A1t = jnp.swapaxes(e1.A, -1, -2)
    J = A1t @ Y @ e1.A + e1.J
    return _CElems(A, C, J)


# ---------------------------------------------------------------------------
# Tiny-d struct-of-arrays (SoA) fast path
# ---------------------------------------------------------------------------
#
# TPU HBM layout pads the two MINOR dims of every array to the (8, 128)
# f32 tile.  The (n, d, d) / (n, d) element arrays above put (d, d) in the
# minor dims, so tiny state dims pay catastrophic padding: measured on v5e,
# (particles, n, 2, 2) scan elements expand ~64x (15.75 GB of padding per
# 256 MB logical array — the 128-particle Matern32 SMC at n=2^17 OOM'd AT
# COMPILE; benchmarks/results_v5e.txt round-5).  The scalar OU path
# (ops/markov.py) is immune because every array it stores is 1-D (n,).
#
# This section generalizes that immunity to d <= SOA_MAX_D: a matrix is a
# row-major tuple-of-tuples of d**2 SEPARATE (n,) arrays, a vector a tuple
# of d arrays ("struct of arrays").  ``lax.associative_scan`` composes over
# arbitrary pytrees, so the filter/smoother scans carry only 1-D leaves —
# zero tile padding in the scan storage AND in autodiff's per-level
# residuals (where the memory multiplier actually bites).  The combine
# algebra is identical to _mcombine/_ccombine/_scombine; the d**3 products
# unroll into elementwise (n,)-array ops that XLA fuses.  EVERY block kind
# has a SoA-native emitter (_block_APH_soa — the SqExp/Periodic transitions
# are damped/pure rotations over static modal constants, and Kronecker
# products compose entrywise), so the only routing criterion is the total
# state dim gate below: the unrolled combine traces O(d^3) vector ops per
# element, which is the practical ceiling, not emitter coverage.

#: max TOTAL state dim routed through the SoA path (env
#: GAPLAC_SDE_SOA_MAX_D; 0 disables — used by the parity tests).  Default 4:
#: the unrolled combine emits O(d^2) HLO leaves per element, and by d ~ 6
#: the dense tile padding (8/d) is modest while the SoA trace grows.
SOA_MAX_D = int(__import__("os").environ.get("GAPLAC_SDE_SOA_MAX_D", "4"))

#: also use SoA on the CPU backend (env GAPLAC_SDE_SOA_CPU).  Default off:
#: CPU has no tile padding to save, and the d^2-leaf elements multiply
#: TRACE time (paid per program, uncached) — measured ~1.7x on the CPU
#: test suite.  TPU/other accelerators always route SoA for d <= SOA_MAX_D.
SOA_ON_CPU = bool(int(__import__("os").environ.get("GAPLAC_SDE_SOA_CPU", "0")))


def _soa_active(d: int) -> bool:
    if d > SOA_MAX_D:
        return False
    return SOA_ON_CPU or jax.default_backend() != "cpu"


#: max TOTAL state dim routed through the DIMS-TO-FRONT (d, d, n) layout
#: for SOA_MAX_D < d <= DTF_MAX_D (env GAPLAC_SDE_DTF_MAX_D; 0 disables).
#: Mid-d states in the (n, d, d) layout still pay TPU tile padding —
#: measured 17x on the d=22 augmented-solve remat temps, 8/d on the
#: elements — while the SoA unroll's trace cost grows O(d^3) per
#: associative-scan level (measured 119 s trace+lower at d=6 vs 7.8 s at
#: d=2).  Dims-to-front keeps n in the minor (lane) dim and the d's in
#: leading/sublane dims: padding is only ceil(d/8)·8/d on ONE dim and the
#: combine is O(d) traced ops (einsums + the unrolled pivot loop).
DTF_MAX_D = int(__import__("os").environ.get("GAPLAC_SDE_DTF_MAX_D", "24"))

#: also use dims-to-front on CPU (env GAPLAC_SDE_DTF_CPU) — default off
#: (no tile padding to save); the parity tests opt in.
DTF_ON_CPU = bool(int(__import__("os").environ.get("GAPLAC_SDE_DTF_CPU", "0")))


def _dtf_active(d: int) -> bool:
    if d <= SOA_MAX_D or d > DTF_MAX_D:
        return False
    return DTF_ON_CPU or jax.default_backend() != "cpu"


def _soa_mat(A, d):
    """(n, d, d) -> row-major tuple-of-tuples of (n,) arrays."""
    return tuple(tuple(A[..., i, j] for j in range(d)) for i in range(d))


def _soa_vec(v, d):
    return tuple(v[..., i] for i in range(d))


def _soa_to_mat(X):
    return jnp.stack([jnp.stack(row, -1) for row in X], -2)


def _soa_to_vec(x):
    return jnp.stack(x, -1)


def steps_are_soa(A) -> bool:
    """True when a per-step model piece is in the SoA-native layout (a
    tuple of (n,) leaves) produced by ``build_steps(layout='auto')``."""
    return isinstance(A, tuple)


def _steps_nd(A):
    """(n, d) of a per-step transition in either layout."""
    if isinstance(A, tuple):
        return A[0][0].shape[-1], len(A)
    return A.shape[-3], A.shape[-1]


def _steps_dtype(A):
    return A[0][0].dtype if isinstance(A, tuple) else A.dtype


def densify_steps(A, Q, H):
    """Convert SoA-native steps back to dense (n,d,d)/(n,d) arrays (no-op on
    dense input).  For consumers whose math is dense (eigendecompositions,
    windowed slicing) — NOT for the filter/smoother/loglik scans, which
    consume the SoA form directly and must never materialize the padded
    dense buffers (the measured 64x TPU tile expansion at d = 2-3)."""
    if isinstance(A, tuple):
        return _soa_to_mat(A), _soa_to_mat(Q), _soa_to_vec(H)
    return A, Q, H


def measure_row(H, m):
    """Per-step measurement H_k·m_k -> (n,) for dense H (n, d) or SoA H
    (length-d tuple of (n,) leaves), with m dense (n, d)."""
    if isinstance(H, tuple):
        return sum(h * m[..., i] for i, h in enumerate(H))
    return jnp.einsum("nd,nd->n", H, m)


def _soa_eye_plus(M):
    return tuple(
        tuple(M[i][j] + 1.0 if i == j else M[i][j] for j in range(len(M)))
        for i in range(len(M))
    )


def _soa_mm(X, Y):
    return tuple(
        tuple(sum(X[i][k] * Y[k][j] for k in range(len(Y)))
              for j in range(len(Y[0])))
        for i in range(len(X))
    )


def _soa_mv(X, v):
    return tuple(sum(X[i][k] * v[k] for k in range(len(v)))
                 for i in range(len(X)))


def _soa_vm(v, X):
    """Row-vector times matrix: (vᵀX)_j = Σ_i v_i X_ij."""
    return tuple(sum(v[i] * X[i][j] for i in range(len(v)))
                 for j in range(len(X[0])))


def _soa_t(X):
    return tuple(tuple(X[i][j] for i in range(len(X)))
                 for j in range(len(X[0])))


def _soa_madd(X, Y):
    return tuple(tuple(X[i][j] + Y[i][j] for j in range(len(X[0])))
                 for i in range(len(X)))


def _soa_vadd(x, y):
    return tuple(a + b for a, b in zip(x, y))


def _soa_solve(D, B):
    """D⁻¹B on SoA operands (B row-major d×k) — the same UNPIVOTED
    Gauss-Jordan as ``solve_small`` (same conditioning argument: every
    system is I + PSD·PSD or predicted-cov + noise), fully unrolled into
    scalar (n,)-array ops."""
    d, k = len(D), len(B[0])
    M = [list(D[i]) + list(B[i]) for i in range(d)]
    for i in range(d):
        inv = 1.0 / M[i][i]
        piv = [m * inv for m in M[i]]
        for r in range(d):
            if r != i:
                f = M[r][i]
                M[r] = [M[r][j] - f * piv[j] for j in range(d + k)]
        M[i] = piv
    return tuple(tuple(M[i][d + j] for j in range(k)) for i in range(d))


def _soa_shift(x):
    """Per-leaf prepend-zero shift: x_k -> x_{k-1} (x_0 -> 0)."""
    return jax.tree_util.tree_map(
        lambda v: jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]]), x)


def _mcombine_soa(e1, e2):
    """_mcombine on SoA elements (A, b, C, eta, J) — identical algebra."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    d = len(A1)
    D = _soa_eye_plus(_soa_mm(C1, J2))
    Dt = _soa_eye_plus(_soa_mm(J2, C1))
    bC = _soa_vadd(b1, _soa_mv(C1, eta2))
    X = _soa_solve(D, tuple(
        A1[i] + (bC[i],) + C1[i] for i in range(d)))
    XA = tuple(X[i][:d] for i in range(d))
    Xb = tuple(X[i][d] for i in range(d))
    XC = tuple(X[i][d + 1:] for i in range(d))
    A = _soa_mm(A2, XA)
    b = _soa_vadd(_soa_mv(A2, Xb), b2)
    C = _soa_madd(_soa_mm(_soa_mm(A2, XC), _soa_t(A2)), C2)
    rhs = tuple(eta2[i] - sum(J2[i][k] * b1[k] for k in range(d))
                for i in range(d))
    Y = _soa_solve(Dt, tuple((rhs[i],) + J2[i] for i in range(d)))
    Y0 = tuple(Y[i][0] for i in range(d))
    YJ = tuple(Y[i][1:] for i in range(d))
    A1t = _soa_t(A1)
    eta = _soa_vadd(_soa_mv(A1t, Y0), eta1)
    J = _soa_madd(_soa_mm(_soa_mm(A1t, YJ), A1), J1)
    return A, b, C, eta, J


def _ccombine_soa(e1, e2):
    """_ccombine (covariance-only) on SoA elements (A, C, J)."""
    A1, C1, J1 = e1
    A2, C2, J2 = e2
    d = len(A1)
    D = _soa_eye_plus(_soa_mm(C1, J2))
    Dt = _soa_eye_plus(_soa_mm(J2, C1))
    X = _soa_solve(D, tuple(A1[i] + C1[i] for i in range(d)))
    XA = tuple(X[i][:d] for i in range(d))
    XC = tuple(X[i][d:] for i in range(d))
    A = _soa_mm(A2, XA)
    C = _soa_madd(_soa_mm(_soa_mm(A2, XC), _soa_t(A2)), C2)
    Y = _soa_solve(Dt, J2)
    A1t = _soa_t(A1)
    J = _soa_madd(_soa_mm(_soa_mm(A1t, Y), A1), J1)
    return A, C, J


def _scombine_soa(a, b):
    """_scombine (backward smoothing recurrence) on SoA elements (E, g, L)."""
    E = _soa_mm(b[0], a[0])
    g = _soa_vadd(_soa_mv(b[0], a[1]), b[1])
    L = _soa_madd(_soa_mm(_soa_mm(b[0], a[2]), _soa_t(b[0])), b[2])
    return E, g, L


def _soa_filter_elems(A, Q, H, y, R, obs, with_mean=True):
    """SoA filtering elements from per-step (A, Q, H) in either layout.

    SoA-native input (from ``build_steps(layout='auto')``) is used as-is —
    no (n, d, d) array exists anywhere in the trace.  Dense input is
    consumed via (n,)-slices, so XLA fuses the slice into each element
    expression and the padded form does not round-trip through the scan —
    but the dense CONSTRUCTION buffers still exist upstream and XLA's
    remat-with-compression pass can materialize padded copies of them (the
    measured 8 GB/64x bf16 copies at (128, 2^17, 2, 2) — see
    benchmarks/results_v5e.txt round-5); prefer SoA-native steps at scale."""
    if isinstance(A, tuple):
        d = len(A)
        n = A[0][0].shape[-1]
        dtype = A[0][0].dtype
        As, Qs, Hs = A, Q, H
    else:
        n, d, _ = A.shape
        dtype = A.dtype
        As = _soa_mat(A, d)
        Qs = _soa_mat(Q, d)
        Hs = _soa_vec(H, d)
    Rv = jnp.broadcast_to(jnp.asarray(R, dtype), (n,))
    QH = _soa_mv(Qs, Hs)
    S = sum(Hs[i] * QH[i] for i in range(d)) + Rv
    w = (jnp.ones((n,), dtype) if obs is None else jnp.asarray(obs, dtype))
    K = tuple(QH[i] * w / S for i in range(d))
    ImKH = tuple(
        tuple((1.0 if i == j else 0.0) - K[i] * Hs[j] for j in range(d))
        for i in range(d))
    eA = _soa_mm(ImKH, As)
    eC = _soa_mm(ImKH, Qs)
    HA = _soa_vm(Hs, As)
    eJ = tuple(tuple(HA[i] * HA[j] * (w / S) for j in range(d))
               for i in range(d))
    if not with_mean:
        return (eA, eC, eJ), (As, Qs, Hs, Rv, S)
    eb = tuple(K[i] * y for i in range(d))
    eeta = tuple(HA[i] * (w * y / S) for i in range(d))
    return (eA, eb, eC, eeta, eJ), (As, Qs, Hs, Rv, S)


def _ss_filter_soa(A, Q, H, y, R, obs=None):
    """SoA parallel Kalman filter: returns (m_f, P_f) as SoA plus the SoA
    per-step model (As, Qs, Hs, Rv)."""
    elems, (As, Qs, Hs, Rv, _) = _soa_filter_elems(A, Q, H, y, R, obs)
    pre = lax.associative_scan(_mcombine_soa, elems)
    return pre[1], pre[2], (As, Qs, Hs, Rv)


def _ss_loglik_parts_soa(A, Q, H, y, R):
    m_f, P_f, (As, Qs, Hs, Rv) = _ss_filter_soa(A, Q, H, y, R)
    d = len(Hs)
    m_prev = _soa_shift(m_f)
    P_prev = _soa_shift(P_f)
    m_pred = _soa_mv(As, m_prev)
    P_pred = _soa_madd(_soa_mm(_soa_mm(As, P_prev), _soa_t(As)), Qs)
    mean = sum(Hs[i] * m_pred[i] for i in range(d))
    S = sum(Hs[i] * P_pred[i][j] * Hs[j]
            for i in range(d) for j in range(d)) + Rv
    r = y - mean
    return jnp.sum(r * r / S), jnp.sum(jnp.log(S))


def _ss_filter_cov_soa(A, Q, H, R, obs=None):
    """SoA covariance-only filter; returns P_f SoA + SoA model pieces."""
    elems, (As, Qs, Hs, Rv, _) = _soa_filter_elems(
        A, Q, H, None, R, obs, with_mean=False)
    pre = lax.associative_scan(_ccombine_soa, elems)
    return pre[1], (As, Qs, Hs, Rv)


def _ss_smooth_soa(A, Q, H, y, R, obs=None):
    """SoA parallel RTS smoother — ``ss_smooth`` with 1-D scan storage."""
    n, d = _steps_nd(A)
    dtype = _steps_dtype(A)
    m_f, P_f, (As, Qs, Hs, Rv) = _ss_filter_soa(A, Q, H, y, R, obs=obs)
    head = lambda x: jax.tree_util.tree_map(lambda v: v[:-1], x)
    tail = lambda x: jax.tree_util.tree_map(lambda v: v[1:], x)
    A1 = tail(As)
    Pfm = head(P_f)
    mfm = head(m_f)
    Pp = _soa_madd(_soa_mm(_soa_mm(A1, Pfm), _soa_t(A1)), tail(Qs))
    E = _soa_t(_soa_solve(Pp, _soa_mm(A1, Pfm)))
    g = tuple(mfm[i] - sum(E[i][k] * v for k, v in
                           enumerate(_soa_mv(A1, mfm)))
              for i in range(d))
    L = tuple(tuple(Pfm[i][j] - s for j, s in enumerate(row))
              for i, row in enumerate(_soa_mm(_soa_mm(E, Pp), _soa_t(E))))
    zero = jnp.zeros((1,), dtype)
    cat = lambda v, last: jnp.concatenate([v, last])
    elems = (
        tuple(tuple(cat(E[i][j], zero) for j in range(d)) for i in range(d)),
        tuple(cat(g[i], m_f[i][-1:]) for i in range(d)),
        tuple(tuple(cat(L[i][j], P_f[i][j][-1:]) for j in range(d))
              for i in range(d)),
    )
    suf = lax.associative_scan(_scombine_soa, elems, reverse=True)
    return suf[1], suf[2]


# ---------------------------------------------------------------------------
# Mid-d dims-to-front (DTF) fast path
# ---------------------------------------------------------------------------
#
# The SoA unroll above is ideal for d <= 4 but its trace cost is O(d^3)
# per associative-scan level (the combine is re-traced per halving level),
# measured 119 s trace+lower for the d=6 SqExp value+grad vs 7.8 s at
# d=2.  For SOA_MAX_D < d <= DTF_MAX_D the elements are instead stored
# DIMS-TO-FRONT: matrices (d, d, n), vectors (d, 1, n) — n stays in the
# minor (lane) dim, so TPU tiling pads only the second-minor dim to 8
# (e.g. (6, 13, n) augmented solves pad 13->16, ~1.2x, vs the (n, d, d)
# layout's 8/d-to-64x).  The combine algebra is identical to
# _mcombine/_scombine with einsum contractions batched over trailing n:
# O(d) traced ops (the unrolled pivot loop), O(1) einsums.


def _dtf_mm(X, Y):
    return jnp.einsum("ikn,kjn->ijn", X, Y)


def _dtf_t(X):
    return jnp.swapaxes(X, 0, 1)


def _dtf_eye(d, dtype):
    return jnp.eye(d, dtype=dtype)[:, :, None]


def _dtf_solve(D, B):
    """D⁻¹B for D (d, d, n), B (d, k, n) — the same unpivoted Gauss-Jordan
    as ``solve_small`` (same conditioning argument) with rows on axis 0 and
    columns on axis 1; the (d, d+k, n) augmented buffer keeps n minor."""
    d = D.shape[0]
    M = jnp.concatenate([D, B], axis=1)
    for i in range(d):
        piv = M[i:i + 1] / M[i:i + 1, i:i + 1]
        M = M - M[:, i:i + 1] * piv
        # restore the pivot row (eliminated itself to 0 above)
        M = jnp.concatenate([M[:i], piv, M[i + 1:]], axis=0)
    return M[:, d:]


def _mcombine_dtf(e1, e2):
    """_mcombine on dims-to-front elements (A, b, C, eta, J): matrices
    (d, d, n), vectors (d, 1, n) — identical algebra."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    d = A1.shape[0]
    I = _dtf_eye(d, A1.dtype)
    D = I + _dtf_mm(C1, J2)
    Dt = I + _dtf_mm(J2, C1)
    bC = b1 + _dtf_mm(C1, eta2)
    X = _dtf_solve(D, jnp.concatenate([A1, bC, C1], axis=1))
    XA, Xb, XC = X[:, :d], X[:, d:d + 1], X[:, d + 1:]
    A = _dtf_mm(A2, XA)
    b = _dtf_mm(A2, Xb) + b2
    C = _dtf_mm(_dtf_mm(A2, XC), _dtf_t(A2)) + C2
    rhs = eta2 - _dtf_mm(J2, b1)
    Y = _dtf_solve(Dt, jnp.concatenate([rhs, J2], axis=1))
    A1t = _dtf_t(A1)
    eta = _dtf_mm(A1t, Y[:, :1]) + eta1
    J = _dtf_mm(_dtf_mm(A1t, Y[:, 1:]), A1) + J1
    return A, b, C, eta, J


def _dtf_steps(A, Q, H):
    """Per-step (A, Q, H) in any layout -> dims-to-front (d, d, n) /
    (d, n).  SoA-native input stacks its (n,) leaves (no padded buffer was
    ever built); dense input transposes."""
    if isinstance(A, tuple):
        As = jnp.stack([jnp.stack(row) for row in A])
        Qs = jnp.stack([jnp.stack(row) for row in Q])
        Hs = jnp.stack(H)
        return As, Qs, Hs
    return (jnp.moveaxis(A, -3, -1), jnp.moveaxis(Q, -3, -1),
            jnp.moveaxis(H, -2, -1))


def _dtf_filter_elems(A, Q, H, y, R, obs):
    """Filtering elements in the dims-to-front layout — the same gain-form
    construction as _soa_filter_elems, as einsums over (d, ·, n)."""
    As, Qs, Hs = _dtf_steps(A, Q, H)
    d, n = Hs.shape
    dtype = As.dtype
    Rv = jnp.broadcast_to(jnp.asarray(R, dtype), (n,))
    QH = jnp.einsum("ikn,kn->in", Qs, Hs)
    S = jnp.einsum("in,in->n", Hs, QH) + Rv
    w = (jnp.ones((n,), dtype) if obs is None else jnp.asarray(obs, dtype))
    K = QH * (w / S)                                   # (d, n)
    ImKH = _dtf_eye(d, dtype) - K[:, None, :] * Hs[None, :, :]
    eA = _dtf_mm(ImKH, As)
    eC = _dtf_mm(ImKH, Qs)
    HA = jnp.einsum("in,ijn->jn", Hs, As)
    eJ = HA[:, None, :] * HA[None, :, :] * (w / S)
    eb = (K * y)[:, None, :]
    eeta = (HA * (w * y / S))[:, None, :]
    return (eA, eb, eC, eeta, eJ), (As, Qs, Hs, Rv, S)


def _ss_filter_dtf(A, Q, H, y, R, obs=None):
    """Dims-to-front parallel Kalman filter: (m_f (d, n), P_f (d, d, n))
    plus the DTF per-step model."""
    elems, (As, Qs, Hs, Rv, _) = _dtf_filter_elems(A, Q, H, y, R, obs)
    pre = lax.associative_scan(_mcombine_dtf, elems, axis=-1)
    return pre[1][:, 0], pre[2], (As, Qs, Hs, Rv)


def _ss_loglik_parts_dtf(A, Q, H, y, R):
    m_f, P_f, (As, Qs, Hs, Rv) = _ss_filter_dtf(A, Q, H, y, R)
    shift = lambda x: jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]], axis=-1)
    m_pred = jnp.einsum("ikn,kn->in", As, shift(m_f))
    P_pred = _dtf_mm(_dtf_mm(As, shift(P_f)), _dtf_t(As)) + Qs
    mean = jnp.einsum("in,in->n", Hs, m_pred)
    S = jnp.einsum("in,ijn,jn->n", Hs, P_pred, Hs) + Rv
    r = y - mean
    return jnp.sum(r * r / S), jnp.sum(jnp.log(S))


# ---------------------------------------------------------------------------
# Leaf state blocks
# ---------------------------------------------------------------------------

#: leaf block kinds understood by build_blocks
(BLOCK_OU, BLOCK_M32, BLOCK_M52, BLOCK_CONST, BLOCK_LINEAR, BLOCK_SQEXP,
 BLOCK_PERIODIC, BLOCK_RQ) = range(8)

#: Periodic harmonic count (Solin & Särkkä 2014): the kernel's Fourier
#: series exp((cosθ−1)/l²) = Σ_j q_j²(l) cos(jθ) truncated at J harmonics
#: (state dim 2J+1).  Truncation error grows as l shrinks (more harmonics
#: matter); measured envelope: at l >= 0.7 even J=5 is <= 1e-3 nats, the
#: J=10 default covers l >= 0.4 (benchmarks/results_v5e.txt) — so J is a
#: USER KNOB (`--sde-harmonics`): in PRODUCT blocks the state dim
#: multiplies (quasi-periodic Periodic*Matern32 is d = (2J+1)*2), and the
#: sde gradient path is d^3-bound, so J=5 makes quasi-periodic SAMPLING
#: ~7x cheaper than the J=10 default at zero accuracy cost for l >= 0.7.
PERIODIC_J = 10


def set_periodic_harmonics(J: int) -> None:
    """Set the Periodic block's harmonic count (state dim 2J+1) for
    subsequently built structures.  Process-wide by design: the harmonic
    count participates in STATIC state-space structure (block dims), so it
    must be fixed before a formula's structure is extracted and never
    changed between building and running a program."""
    global PERIODIC_J
    if not (1 <= int(J) <= 64):
        raise ValueError(f"--sde-harmonics must be in [1, 64], got {J}")
    PERIODIC_J = int(J)


def set_rq_nodes(K: int) -> None:
    """Set the RQ block's Gamma-mixture node count (state dim K*SQEXP_ORDER);
    same static-structure caveat as ``set_periodic_harmonics``."""
    global RQ_MIX_K
    if not (1 <= int(K) <= 32):
        raise ValueError(f"--sde-rq-nodes must be in [1, 32], got {K}")
    RQ_MIX_K = int(K)

#: quadrature nodes for the Bessel coefficients q_j² = (2−δ_j0) e^{−x}I_j(x),
#: evaluated as the midpoint rule on (1/π)∫₀^π e^{x(cosθ−1)} cos(jθ) dθ —
#: spectrally accurate for a periodic integrand, jit/grad-safe in the
#: DYNAMIC lengthscale x = 1/l² (no Bessel special function needed)
_PERIODIC_QUAD_M = 256

#: SqExp spectral-Taylor order (Hartikainen & Särkkä 2010): 1/S(ω) is
#: Taylor-truncated at ω^{2N}, giving an order-N stable rational spectrum.
#: N=6 has max kernel error 4.3e-3 (measured; N=4: 2.2e-2, N=8: 9e-4 but
#: its companion eigenbasis is too ill-conditioned to be worth it).
SQEXP_ORDER = 6

#: RQ Gamma-mixture size: RQ(τ; l, α) = E_{v~Γ(α,1)} exp(−v τ²/(2αl²)) is
#: EXACTLY a Gamma mixture of SqExp kernels with lengthscales l√(α/v)
#: (Gamma MGF), so the RQ block is K SqExp SSM sub-blocks at generalized
#: Gauss–Laguerre nodes (weight v^{α−1}e^{−v}) — quadrature error measured
#: in tests/results alongside the SqExp block's own truncation error.
RQ_MIX_K = 8

_BLOCK_DIM = {BLOCK_OU: 1, BLOCK_M32: 2, BLOCK_M52: 3, BLOCK_CONST: 1,
              BLOCK_LINEAR: 2, BLOCK_SQEXP: SQEXP_ORDER}


def block_dim(kind) -> int:
    """State dimension of a block kind; a tuple of kinds is a PRODUCT
    kernel (Kronecker-composed SSM) whose dimension multiplies.  Periodic
    and RQ dims follow the CURRENT harmonic/node knobs."""
    if isinstance(kind, tuple):
        d = 1
        for k in kind:
            d *= block_dim(k)
        return d
    if kind == BLOCK_PERIODIC:
        return 2 * PERIODIC_J + 1
    if kind == BLOCK_RQ:
        return SQEXP_ORDER * RQ_MIX_K
    return _BLOCK_DIM[kind]


def _kron_mat(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product of (n,a,a) and (n,b,b) -> (n,ab,ab)."""
    n, a, _ = A.shape
    b = B.shape[-1]
    return jnp.einsum("nij,nkl->nikjl", A, B).reshape(n, a * b, a * b)


def _kron_vec(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product of (n,a) and (n,b) row vectors -> (n,ab)."""
    n = u.shape[0]
    return jnp.einsum("ni,nk->nik", u, v).reshape(n, -1)


def _sqexp_modal_constants(order: int = SQEXP_ORDER):
    """Static (l-independent) real modal realization of the order-N
    spectral-Taylor SqExp SSM, precomputed once in f64 numpy.

    The l=1 spectrum is S(ω) ≈ q / P(ω²) with P the Taylor truncation of
    1/S ∝ exp(ω²/2); its stable spectral factor's companion matrix is
    diagonalized and converted to REAL modal form (2×2 rotation-scale
    blocks), where the time-dilation property of lengthscale scaling makes
    everything l-independent except the step phase τ = Δt/l:

      A(Δt, l) = blockdiag( e^{α_p τ} R(β_p τ) ),   P∞, H constant.

    The ill-conditioned eigenbasis (cond ≈ 1.2e4 at N=6) is confined to
    this f64 precomputation; runtime math is rotations — f32/TPU-safe.
    Returns (modes [(α, β)...], P∞ (N,N), h (N,)), P∞ normalized to unit
    marginal variance."""
    import numpy as _np
    from scipy.linalg import solve_continuous_lyapunov

    coefs = _np.zeros(2 * order + 1)
    for k in range(order + 1):
        coefs[2 * k] = (-0.5) ** k / math.factorial(k)
    roots = _np.roots(coefs[::-1])
    stable = roots[roots.real < 0]
    assert len(stable) == order, "spectral factorization lost a root"
    a = _np.real(_np.poly(stable))           # monic, highest power first
    F = _np.zeros((order, order))
    F[:-1, 1:] = _np.eye(order - 1)
    F[-1, :] = -a[1:][::-1]
    q = math.sqrt(2.0 * math.pi) * math.factorial(order) * 2.0 ** order
    L = _np.zeros((order, 1))
    L[-1, 0] = 1.0
    P1 = solve_continuous_lyapunov(F, -q * (L @ L.T))
    d, V = _np.linalg.eig(F)
    cols, modes = [], []
    for k in range(order):
        if d[k].imag > 1e-12:
            cols += [_np.real(V[:, k]), _np.imag(V[:, k])]
            modes.append((float(d[k].real), float(d[k].imag)))
        elif abs(d[k].imag) <= 1e-12:
            cols.append(_np.real(V[:, k]))
            modes.append((float(d[k].real), None))
    T = _np.stack(cols, axis=1)
    Ti = _np.linalg.inv(T)
    Pz = Ti @ P1 @ Ti.T
    Pz = 0.5 * (Pz + Pz.T)
    h = T[0, :]
    Pz = Pz / float(h @ Pz @ h)              # unit marginal variance
    return tuple(modes), Pz, h


_SQEXP_CONST_CACHE: dict = {}


def _sqexp_constants_cached(order: int = SQEXP_ORDER):
    if order not in _SQEXP_CONST_CACHE:
        _SQEXP_CONST_CACHE[order] = _sqexp_modal_constants(order)
    return _SQEXP_CONST_CACHE[order]


_RQ_CONST_CACHE: dict = {}


def rq_mixture_constants(alpha: float, K: int = None):
    """Static (f64 numpy) Gamma-mixture quadrature for the RQ block:
    per-component lengthscale multipliers c_k = √(α/v_k) and normalized
    weights w_k (Σw = 1, so k(0) = 1 exactly), with (v_k, w_k) the K-node
    generalized Gauss–Laguerre rule for weight v^{α−1}e^{−v} — exact for
    polynomial integrands of degree < 2K against the Gamma(α,1) density.
    α is STATIC (nodes are polynomial roots — not differentiable), matching
    the rff path's static-shape-parameter contract.

    Two candidate rules are built and the one with smaller max kernel error
    on a τ ∈ [0, 30] grid kept (all f64 numpy, cached per (α, K)):
    (a) the GGL rule itself — near-optimal for α ≳ 2 where the mixture
    density is light-tailed; (b) Gamma-QUANTILE nodes with NNLS-fitted
    nonnegative weights (soft Σw=1) — far better for heavy-tailed α ≲ 1,
    where GGL's bulk-optimal nodes miss the polynomial kernel tail
    (measured: α=0.5, K=8: 8.8e-3 vs GGL 1.3e-1)."""
    if K is None:
        K = RQ_MIX_K
    key = (float(alpha), K)
    if key not in _RQ_CONST_CACHE:
        import numpy as _np
        from scipy.optimize import nnls
        from scipy.special import gammaln, roots_genlaguerre
        from scipy.stats import gamma as _gamma

        tau = _np.concatenate([_np.linspace(0.0, 30.0, 400),
                               _np.geomspace(0.01, 30.0, 200)])
        krq = (1.0 + tau ** 2 / (2.0 * alpha)) ** (-alpha)

        def max_err(v, w):
            kmix = _np.exp(-v[None, :] * tau[:, None] ** 2 / (2 * alpha)) @ w
            return _np.abs(kmix - krq).max()

        v1, w1 = roots_genlaguerre(K, alpha - 1.0)
        w1 = w1 / _np.exp(gammaln(alpha))
        w1 = w1 / w1.sum()
        v2 = _gamma.ppf((_np.arange(K) + 0.5) / K, alpha)
        Phi = _np.exp(-v2[None, :] * tau[:, None] ** 2 / (2 * alpha))
        w2, _ = nnls(_np.vstack([Phi, 10.0 * _np.ones((1, K))]),
                     _np.concatenate([krq, [10.0]]))
        w2 = w2 / w2.sum()
        v, w = min(((v1, w1), (v2, w2)), key=lambda vw: max_err(*vw))
        _RQ_CONST_CACHE[key] = (_np.sqrt(alpha / v), w)
    return _RQ_CONST_CACHE[key]


def _block_APH(kind: int, dt: jnp.ndarray, param, x: jnp.ndarray):
    """Per-step transition A (n,d,d), stationary P∞ (n,d,d) and measurement
    row H (n,d) for one leaf block.  ``dt`` is (n,) with dt[0] arbitrary
    (the first element uses A=0); ``x`` is the leaf's data column (Linear)."""
    n = dt.shape[0]
    dtype = dt.dtype
    if isinstance(kind, tuple):
        # PRODUCT kernel k = Π k_i: Kronecker-composed SSM (the quasi-periodic
        # construction of Solin & Särkkä 2014 generalized to any factor mix).
        # With factor blocks (A_i, P_i, H_i), the composite
        #   A = ⊗ A_i,  P∞ = ⊗ P_i,  H = ⊗ H_i,  Q = P∞ − A P∞ Aᵀ
        # has covariance H A(Δ) P∞ Hᵀ = Π H_i A_i(Δ) P_i H_iᵀ = Π k_i(Δ):
        # A(Δ) stays a semigroup (Kron of semigroups), and Q ⪰ 0 since
        # P₁⊗P₂ − S₁⊗S₂ = (P₁−S₁)⊗P₂ + S₁⊗(P₂−S₂) with S_i = A_iP_iA_iᵀ ⪯ P_i.
        # EXACT for products of exact factor blocks (OU/Matern/Const/Linear);
        # products with SqExp/Periodic inherit only those factors' measured
        # truncation error.  Ref parity: the reference composes products via
        # AbstractGPs kernel multiplication (src/gplac.jl formula products).
        A = P = H = None
        for k, pr, xk in zip(kind, param, x):
            Ak, Pk, Hk = _block_APH(k, dt, pr, xk)
            if A is None:
                A, P, H = Ak, Pk, Hk
            else:
                A, P, H = _kron_mat(A, Ak), _kron_mat(P, Pk), _kron_vec(H, Hk)
        return A, P, H
    if kind == BLOCK_OU:
        lam = 1.0 / param
        A = jnp.exp(-lam * dt)[:, None, None]
        P = jnp.ones((n, 1, 1), dtype)
        H = jnp.ones((n, 1), dtype)
        return A, P, H
    if kind == BLOCK_M32:
        lam = 3.0 ** 0.5 / param
        e = jnp.exp(-lam * dt)
        # N = F + λI = [[λ, 1], [-λ², -λ]], N² = 0 → A = e^{-λΔ}(I + NΔ)
        A = e[:, None, None] * jnp.stack([
            jnp.stack([1.0 + lam * dt, dt], -1),
            jnp.stack([-(lam ** 2) * dt, 1.0 - lam * dt], -1),
        ], -2)
        P1 = jnp.asarray([[1.0, 0.0], [0.0, 0.0]], dtype)
        P2 = jnp.asarray([[0.0, 0.0], [0.0, 1.0]], dtype)
        P = jnp.broadcast_to(P1 + lam ** 2 * P2, (n, 2, 2))
        H = jnp.broadcast_to(jnp.asarray([1.0, 0.0], dtype), (n, 2))
        return A, P, H
    if kind == BLOCK_M52:
        lam = 5.0 ** 0.5 / param
        e = jnp.exp(-lam * dt)
        l2 = lam * lam
        # N = F + λI with F companion of (s+λ)³; N³ = 0:
        # N = [[λ,1,0],[0,λ,1],[-λ³,-3λ²,-2λ]] + ... derive rows directly:
        # F = [[0,1,0],[0,0,1],[-λ³,-3λ²,-3λ]], N = F + λI
        # A = e^{-λΔ}(I + NΔ + N²Δ²/2)
        one = jnp.ones_like(dt)
        N = jnp.stack([
            jnp.stack([lam * one, one, 0.0 * one], -1),
            jnp.stack([0.0 * one, lam * one, one], -1),
            jnp.stack([-(lam ** 3) * one, -3.0 * l2 * one, -2.0 * lam * one], -1),
        ], -2)
        N2 = N @ N
        I3 = jnp.eye(3, dtype=dtype)
        A = e[:, None, None] * (
            I3 + N * dt[:, None, None] + 0.5 * N2 * (dt ** 2)[:, None, None]
        )
        P = jnp.broadcast_to(jnp.stack([
            jnp.stack([jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype), -l2 / 3.0]),
            jnp.stack([jnp.asarray(0.0, dtype), l2 / 3.0, jnp.asarray(0.0, dtype)]),
            jnp.stack([-l2 / 3.0, jnp.asarray(0.0, dtype), l2 * l2]),
        ]), (n, 3, 3))
        H = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype), (n, 3))
        return A, P, H
    if kind == BLOCK_CONST:
        A = jnp.ones((n, 1, 1), dtype)
        # clamp: a zero-variance static state makes the smoother's predicted
        # covariance singular (e.g. Constant(0)); 1e-12 is exact to f64 fp
        c = jnp.maximum(jnp.asarray(param, dtype).reshape(()), 1e-12)
        P = jnp.broadcast_to(jnp.reshape(c, (1, 1)), (n, 1, 1))
        H = jnp.ones((n, 1), dtype)
        return A, P, H
    if kind == BLOCK_SQEXP:
        # order-N spectral-Taylor SE block (approximate; error measured in
        # tests/test_markov.py + benchmarks/results): modal transition is a
        # block-diagonal of damped rotations in the step phase τ = Δt/l
        modes, Pz, h = _sqexp_constants_cached()
        N = h.shape[0]
        tau = dt / param
        A = jnp.zeros((n, N, N), dtype)
        off = 0
        for al, be in modes:
            e = jnp.exp(al * tau)
            if be is None:
                A = A.at[:, off, off].set(e)
                off += 1
            else:
                c, s = jnp.cos(be * tau), jnp.sin(be * tau)
                A = A.at[:, off, off].set(e * c)
                A = A.at[:, off, off + 1].set(e * s)
                A = A.at[:, off + 1, off].set(-e * s)
                A = A.at[:, off + 1, off + 1].set(e * c)
                off += 2
        P = jnp.broadcast_to(jnp.asarray(Pz, dtype), (n, N, N))
        H = jnp.broadcast_to(jnp.asarray(h, dtype), (n, N))
        return A, P, H
    if kind == BLOCK_PERIODIC:
        # random-Fourier-series SSM: k(τ) = Σ_j q_j²(l) cos(j·2π/p·τ)
        # truncated at J harmonics.  ``param`` = (l, period); each harmonic
        # is a deterministic 2-d rotation (Q = 0 — the j=0 term a constant),
        # so the state is an exact J-harmonic random periodic function.
        l, period = param
        J = PERIODIC_J
        M = _PERIODIC_QUAD_M
        theta = (jnp.arange(M, dtype=dtype) + 0.5) * (math.pi / M)
        xq = 1.0 / (l * l)
        wgt = jnp.exp(xq * (jnp.cos(theta) - 1.0))             # (M,)
        js = jnp.arange(J + 1, dtype=dtype)
        cos_tab = jnp.cos(js[:, None] * theta[None, :])        # static table
        q2 = (cos_tab @ wgt) * (1.0 / M) * jnp.where(js == 0, 1.0, 2.0)
        dtot = 2 * J + 1
        A = jnp.zeros((n, dtot, dtot), dtype).at[:, 0, 0].set(1.0)
        P = jnp.zeros((n, dtot, dtot), dtype).at[:, 0, 0].set(q2[0])
        Hrow = jnp.zeros((dtot,), dtype).at[0].set(1.0)
        w0 = 2.0 * math.pi / period
        for j in range(1, J + 1):
            ang = j * w0 * dt                                  # (n,)
            c, s = jnp.cos(ang), jnp.sin(ang)
            o = 2 * j - 1
            A = A.at[:, o, o].set(c).at[:, o, o + 1].set(s)
            A = A.at[:, o + 1, o].set(-s).at[:, o + 1, o + 1].set(c)
            P = P.at[:, o, o].set(q2[j]).at[:, o + 1, o + 1].set(q2[j])
            Hrow = Hrow.at[o].set(1.0)
        H = jnp.broadcast_to(Hrow, (n, dtot))
        return A, P, H
    if kind == BLOCK_RQ:
        # Gamma-mixture of SqExp blocks (exact mixture identity; see
        # rq_mixture_constants): K independent SqExp sub-blocks at
        # lengthscales l·c_k, measurement scaled by √w_k so the mixture
        # covariance Σ w_k k_se(τ/(l c_k)) ≈ RQ(τ; l, α).
        l, c, w = param
        K = c.shape[0]
        dse = SQEXP_ORDER
        d = K * dse
        A = jnp.zeros((n, d, d), dtype)
        P = jnp.zeros((n, d, d), dtype)
        Hs = []
        for k in range(K):
            Ak, Pk, Hk = _block_APH(BLOCK_SQEXP, dt, l * c[k], None)
            o = k * dse
            A = A.at[:, o:o + dse, o:o + dse].set(Ak)
            P = P.at[:, o:o + dse, o:o + dse].set(Pk)
            Hs.append(jnp.sqrt(w[k]) * Hk)
        return A, P, jnp.concatenate(Hs, -1)
    if kind == BLOCK_LINEAR:
        A = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (n, 2, 2))
        c = jnp.maximum(jnp.asarray(param, dtype).reshape(()), 1e-12)
        P = jnp.broadcast_to(
            jnp.stack([
                jnp.stack([jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)]),
                jnp.stack([jnp.asarray(0.0, dtype), c]),
            ]), (n, 2, 2))
        H = jnp.stack([x, jnp.ones((n,), dtype)], -1)
        return A, P, H
    raise ValueError(f"unknown block kind {kind}")


#: block kinds with a SoA-native emitter.  Every kernel block is
#: symbolically expressible (the SqExp/Periodic transitions are damped /
#: pure rotations over static modal constants), so all kinds — including
#: Kronecker products of them — can emit SoA leaves; whether a given model
#: actually routes SoA is still gated by total state dim (SOA_MAX_D) in
#: ``build_steps``.  The trace emits O(d³) vector ops per combine, so the
#: layout is for small d (the default gate is 4; ≲8 is the sane ceiling —
#: a d=21 Periodic would trace ~10⁴ ops per combine expression).
_SOA_BLOCK_KINDS = frozenset(
    {BLOCK_OU, BLOCK_M32, BLOCK_M52, BLOCK_CONST, BLOCK_LINEAR,
     BLOCK_SQEXP, BLOCK_PERIODIC, BLOCK_RQ})


def _soa_emitter_ok(kind) -> bool:
    """True when ``kind`` (int block kind or tuple Kronecker product) has a
    SoA-native emitter for every factor."""
    if isinstance(kind, tuple):
        return all(_soa_emitter_ok(k) for k in kind)
    return kind in _SOA_BLOCK_KINDS


def _soa_kron_mat(A, B):
    """SoA Kronecker product — entry (i1·db+i2, j1·db+j2) = A[i1][j1]·B[i2][j2],
    matching the dense ``_kron_mat`` index order."""
    da, db = len(A), len(B)
    return tuple(tuple(A[i1][j1] * B[i2][j2]
                       for j1 in range(da) for j2 in range(db))
                 for i1 in range(da) for i2 in range(db))


def _soa_kron_vec(u, v):
    return tuple(x * y for x in u for y in v)


def _block_APH_soa(kind: int, dt: jnp.ndarray, param, x, dtype):
    """``_block_APH`` emitted directly as SoA leaves: (A rows, P∞ rows, H)
    as tuples of (n,) arrays.  No (n, d, d) array is ever constructed, so
    nothing exists for XLA's remat-with-compression pass to materialize in
    the 64x-padded tiled layout (the round-5 OOM root cause,
    benchmarks/results_v5e.txt).  Same math as the dense emitters above."""
    n = dt.shape[0]
    one = jnp.ones((n,), dtype)
    zero = jnp.zeros((n,), dtype)
    bb = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (n,))
    if isinstance(kind, tuple):
        # Kronecker product block (kernel multiplication), SoA end-to-end
        A = P = H = None
        for k, pr, xk in zip(kind, param, x):
            Ak, Pk, Hk = _block_APH_soa(k, dt, pr, xk, dtype)
            if A is None:
                A, P, H = Ak, Pk, Hk
            else:
                A, P, H = (_soa_kron_mat(A, Ak), _soa_kron_mat(P, Pk),
                           _soa_kron_vec(H, Hk))
        return A, P, H
    if kind == BLOCK_OU:
        return ((jnp.exp(-dt / param),),), ((one,),), (one,)
    if kind == BLOCK_M32:
        lam = 3.0 ** 0.5 / param
        e = jnp.exp(-lam * dt)
        A = ((e * (1.0 + lam * dt), e * dt),
             (-e * (lam * lam) * dt, e * (1.0 - lam * dt)))
        P = ((one, zero), (zero, bb(lam * lam)))
        return A, P, (one, zero)
    if kind == BLOCK_M52:
        lam = 5.0 ** 0.5 / param
        l2 = lam * lam
        e = jnp.exp(-lam * dt)
        # N = F + λI (N³ = 0): A = e^{-λΔ}(I + NΔ + N²Δ²/2), with the 3x3
        # scalar entries of N and N² expanded symbolically
        N = ((lam, 1.0, 0.0), (0.0, lam, 1.0), (-lam * l2, -3.0 * l2, -2.0 * lam))
        N2 = tuple(tuple(sum(N[i][k] * N[k][j] for k in range(3))
                         for j in range(3)) for i in range(3))
        h2 = 0.5 * dt * dt
        A = tuple(tuple(
            e * ((1.0 if i == j else 0.0) + N[i][j] * dt + N2[i][j] * h2)
            for j in range(3)) for i in range(3))
        P = ((one, zero, bb(-l2 / 3.0)),
             (zero, bb(l2 / 3.0), zero),
             (bb(-l2 / 3.0), zero, bb(l2 * l2)))
        return A, P, (one, zero, zero)
    if kind == BLOCK_CONST:
        c = jnp.maximum(jnp.asarray(param, dtype).reshape(()), 1e-12)
        return ((one,),), ((bb(c),),), (one,)
    if kind == BLOCK_SQEXP:
        # order-N spectral-Taylor SE modal block: damped rotations in the
        # step phase τ = Δt/l over static (l-independent) modal constants —
        # the dense emitter's .at[] scatter writes become direct leaves
        modes, Pz, h = _sqexp_constants_cached()
        N = h.shape[0]
        tau = dt / param
        rows = [[zero] * N for _ in range(N)]
        off = 0
        for al, be in modes:
            e = jnp.exp(al * tau)
            if be is None:
                rows[off][off] = e
                off += 1
            else:
                c, s = jnp.cos(be * tau), jnp.sin(be * tau)
                rows[off][off] = e * c
                rows[off][off + 1] = e * s
                rows[off + 1][off] = -e * s
                rows[off + 1][off + 1] = e * c
                off += 2
        A = tuple(tuple(r) for r in rows)
        P = tuple(tuple(bb(float(Pz[i, j])) for j in range(N))
                  for i in range(N))
        return A, P, tuple(bb(float(h[i])) for i in range(N))
    if kind == BLOCK_PERIODIC:
        # J-harmonic random-Fourier-series SSM: constant j=0 state plus J
        # deterministic 2-d rotations; q²_j(l) via the same midpoint
        # quadrature as the dense emitter
        l, period = param
        J = PERIODIC_J
        M = _PERIODIC_QUAD_M
        theta = (jnp.arange(M, dtype=dtype) + 0.5) * (math.pi / M)
        xq = 1.0 / (l * l)
        wgt = jnp.exp(xq * (jnp.cos(theta) - 1.0))
        js = jnp.arange(J + 1, dtype=dtype)
        cos_tab = jnp.cos(js[:, None] * theta[None, :])
        q2 = (cos_tab @ wgt) * (1.0 / M) * jnp.where(js == 0, 1.0, 2.0)
        dtot = 2 * J + 1
        Ar = [[zero] * dtot for _ in range(dtot)]
        Pr = [[zero] * dtot for _ in range(dtot)]
        Ar[0][0] = one
        Pr[0][0] = bb(q2[0])
        Hs = [one] + [zero] * (dtot - 1)
        w0 = 2.0 * math.pi / period
        for j in range(1, J + 1):
            ang = j * w0 * dt
            c, s = jnp.cos(ang), jnp.sin(ang)
            o = 2 * j - 1
            Ar[o][o] = c
            Ar[o][o + 1] = s
            Ar[o + 1][o] = -s
            Ar[o + 1][o + 1] = c
            Pr[o][o] = bb(q2[j])
            Pr[o + 1][o + 1] = bb(q2[j])
            Hs[o] = one
        return (tuple(tuple(r) for r in Ar), tuple(tuple(r) for r in Pr),
                tuple(Hs))
    if kind == BLOCK_RQ:
        # Gamma-mixture of SqExp sub-blocks at lengthscales l·c_k,
        # measurement scaled √w_k — block-diagonal assembly in SoA leaves
        l, c, w = param
        K = c.shape[0]
        dse = SQEXP_ORDER
        d = K * dse
        Ar = [[zero] * d for _ in range(d)]
        Pr = [[zero] * d for _ in range(d)]
        Hs = []
        for k in range(K):
            Ak, Pk, Hk = _block_APH_soa(BLOCK_SQEXP, dt, l * c[k], None,
                                        dtype)
            o = k * dse
            for i in range(dse):
                for j in range(dse):
                    Ar[o + i][o + j] = Ak[i][j]
                    Pr[o + i][o + j] = Pk[i][j]
            sw = jnp.sqrt(jnp.asarray(w[k], dtype))
            Hs.extend(sw * hk for hk in Hk)
        return (tuple(tuple(r) for r in Ar), tuple(tuple(r) for r in Pr),
                tuple(Hs))
    if kind == BLOCK_LINEAR:
        c = jnp.maximum(jnp.asarray(param, dtype).reshape(()), 1e-12)
        A = ((one, zero), (zero, one))
        P = ((one, zero), (zero, bb(c)))
        return A, P, (jnp.asarray(x, dtype), one)
    raise ValueError(f"no SoA emitter for block kind {kind}")


def _build_steps_soa(kinds, params, dt, xs, resets, dtype):
    """Block-diagonal (A, Q, H) assembled entirely in SoA leaves — the
    tiny-d build that never materializes an (n, d, d) array.  Mirrors the
    dense tail of ``build_steps`` exactly: Q = P∞ − A P∞ Aᵀ, per-block
    resets zero the transition, step 0 uses A = 0 / Q = P∞."""
    n = dt.shape[0]
    zero = jnp.zeros((n,), dtype)
    blocks = []
    for kind, p, x, rs in zip(kinds, params, xs, resets):
        if rs is None:
            Ab, Pb, Hb = _block_APH_soa(kind, dt, p, x, dtype)
        else:
            rs = jnp.asarray(rs)
            keep = 1.0 - rs.astype(dtype)
            Ab, Pb, Hb = _block_APH_soa(
                kind, jnp.where(rs, 0.0, dt), p, x, dtype)
            Ab = tuple(tuple(a * keep for a in row) for row in Ab)
        blocks.append((Ab, Pb, Hb))
    d = sum(len(b[0]) for b in blocks)
    A = [[zero] * d for _ in range(d)]
    P = [[zero] * d for _ in range(d)]
    Hs = []
    off = 0
    for Ab, Pb, Hb in blocks:
        db = len(Ab)
        for i in range(db):
            for j in range(db):
                A[off + i][off + j] = Ab[i][j]
                P[off + i][off + j] = Pb[i][j]
        Hs.extend(Hb)
        off += db
    A = tuple(tuple(r) for r in A)
    P = tuple(tuple(r) for r in P)
    S = _soa_mm(_soa_mm(A, P), _soa_t(A))
    Q = tuple(tuple(P[i][j] - S[i][j] for j in range(d)) for i in range(d))
    z1 = jnp.zeros((1,), dtype)
    A = tuple(tuple(jnp.concatenate([z1, a[1:]]) for a in row) for row in A)
    Q = tuple(tuple(jnp.concatenate([p0[:1], q[1:]])
                    for p0, q in zip(prow, qrow))
              for prow, qrow in zip(P, Q))
    return A, Q, tuple(Hs)


def build_steps(
    kinds: Sequence[int],
    params: Sequence,
    t: jnp.ndarray,
    xs: Sequence,
    resets: Sequence = None,
    layout: str = "dense",
):
    """Assemble block-diagonal per-step (A, Q, H) for the additive model on
    SORTED t.  ``params`` per leaf (lengthscale / variance), ``xs`` per leaf
    data column (only used by Linear; pass None otherwise).  Step 0's A is
    zeroed and its Q set to P∞ (the stationary prior).

    ``layout="auto"`` returns SoA-native steps (tuples of (n,) leaves) when
    the total state dim is <= SOA_MAX_D on an accelerator and every block
    has a SoA emitter — the form the filter/smoother/loglik consume with
    zero (n, d, d) buffers anywhere in the trace (the round-5 remat-copy
    OOM fix).  The default "dense" always returns (n,d,d)/(n,d) arrays;
    ``densify_steps`` converts.

    ``resets`` (per block: None or bool (n,)) implements kernel × Cat
    grouping (k(t,t')·1[g==g']): at a True row the block's transition is
    zeroed, so Q = P∞ − A P∞ Aᵀ restarts the block from its stationary
    prior — consecutive groups become independent draws, which IS the
    block-diagonal-in-groups covariance when each group's rows are
    contiguous in the sort order (validated by the structure extractor,
    inference/model.py::_markov_structure)."""
    n = t.shape[0]
    dtype = t.dtype
    # dt can be negative at group boundaries (t restarts per group); every
    # Markov block resets there (A zeroed), so clamp keeps exp() finite
    dt = jnp.maximum(
        jnp.concatenate([jnp.zeros((1,), dtype), jnp.diff(t)]), 0.0
    )
    if resets is None:
        resets = (None,) * len(kinds)
    _td = sum(block_dim(k) for k in kinds)
    if (layout == "auto"
            and all(_soa_emitter_ok(k) for k in kinds)
            and (_soa_active(_td) or _dtf_active(_td))):
        # tiny d consumes the SoA leaves directly; mid-d (DTF) stacks them
        # to (d, d, n) — either way no (n, d, d) buffer is ever built
        # SoA-native build: callers on the loglik/filter/smoother paths opt
        # in with layout="auto"; consumers that need dense math call
        # densify_steps (or keep the default dense layout)
        return _build_steps_soa(kinds, params, dt, xs, resets, dtype)
    As, Ps, Hs = [], [], []
    for kind, p, x, rs in zip(kinds, params, xs, resets):
        if rs is None:
            A, P, H = _block_APH(kind, dt, p, x)
        else:
            rs = jnp.asarray(rs)
            A, P, H = _block_APH(kind, jnp.where(rs, 0.0, dt), p, x)
            A = A * (1.0 - rs.astype(dtype))[:, None, None]
        As.append(A)
        Ps.append(P)
        Hs.append(H)
    d = sum(block_dim(k) for k in kinds)
    A = jnp.zeros((n, d, d), dtype)
    P = jnp.zeros((n, d, d), dtype)
    off = 0
    for kind, Ab, Pb in zip(kinds, As, Ps):
        db = block_dim(kind)
        A = A.at[:, off:off + db, off:off + db].set(Ab)
        P = P.at[:, off:off + db, off:off + db].set(Pb)
        off += db
    H = jnp.concatenate(Hs, -1)
    Q = P - A @ P @ jnp.swapaxes(A, -1, -2)
    # first step: stationary prior
    A = A.at[0].set(0.0)
    Q = Q.at[0].set(P[0])
    return A, Q, H


def ss_filter(A, Q, H, y, R, obs=None):
    """Parallel Kalman filter: filtered means (n,d) and covariances (n,d,d)
    for x_k = A_k x_{k-1} + N(0, Q_k), y_k = H_k·x_k + N(0, R_k).  ``obs``
    (bool (n,)) masks out unobserved points (they contribute no update).
    Accepts SoA-native steps from ``build_steps(layout='auto')``."""
    n, d = _steps_nd(A)
    if (steps_are_soa(A) and d <= SOA_MAX_D) or _soa_active(d):
        m_f, P_f, _ = _ss_filter_soa(A, Q, H, y, R, obs=obs)
        return _soa_to_vec(m_f), _soa_to_mat(P_f)
    # mid-d SoA-native input: densify — the dense scan is correct at any
    # d, and unrolling the SoA combine above SOA_MAX_D explodes TRACE time
    A, Q, H = densify_steps(A, Q, H)
    dtype = A.dtype
    Rv = jnp.broadcast_to(jnp.asarray(R, dtype), (n,))
    QH = (Q @ H[..., None])[..., 0]                        # (n, d)
    S = jnp.einsum("nd,nd->n", H, QH) + Rv                 # (n,)
    K = QH / S[:, None]                                    # (n, d)
    w = (jnp.ones((n,), dtype) if obs is None
         else jnp.asarray(obs, dtype))
    K = K * w[:, None]
    I = jnp.eye(d, dtype=dtype)
    ImKH = I - K[:, :, None] * H[:, None, :]
    HA = jnp.einsum("nd,nde->ne", H, A)                    # (n, d) = Hᵀ A
    elems = _MElems(
        A=ImKH @ A,
        b=K * y[:, None],
        C=ImKH @ Q,
        eta=HA * (w * y / S)[:, None],
        J=HA[:, :, None] * HA[:, None, :] * (w / S)[:, None, None],
    )
    pre = lax.associative_scan(_mcombine, elems)
    return pre.b, pre.C


def ss_filter_cov(A, Q, H, R, obs=None):
    """Filtered covariances P_f only — ``ss_filter`` for y ≡ 0 with the
    identically-zero mean recursion elided (see _ccombine).  The filtered
    covariances never depend on the observations, so this serves any
    caller that needs P_f alone (ss_innovation_coeffs, i.e. every
    whitened-sde leapfrog) at ~2/3 of the full filter's op count."""
    n, d = _steps_nd(A)
    if (steps_are_soa(A) and d <= SOA_MAX_D) or _soa_active(d):
        P_f, _ = _ss_filter_cov_soa(A, Q, H, R, obs=obs)
        return _soa_to_mat(P_f)
    A, Q, H = densify_steps(A, Q, H)
    dtype = A.dtype
    Rv = jnp.broadcast_to(jnp.asarray(R, dtype), (n,))
    QH = (Q @ H[..., None])[..., 0]
    S = jnp.einsum("nd,nd->n", H, QH) + Rv
    K = QH / S[:, None]
    w = (jnp.ones((n,), dtype) if obs is None
         else jnp.asarray(obs, dtype))
    K = K * w[:, None]
    I = jnp.eye(d, dtype=dtype)
    ImKH = I - K[:, :, None] * H[:, None, :]
    HA = jnp.einsum("nd,nde->ne", H, A)
    elems = _CElems(
        A=ImKH @ A,
        C=ImKH @ Q,
        J=HA[:, :, None] * HA[:, None, :] * (w / S)[:, None, None],
    )
    return lax.associative_scan(_ccombine, elems).C


def ss_loglik_parts(A, Q, H, y, R):
    """Prediction-error decomposition pieces of N(y; 0, K + diag(R)):
    (quad, logdet) with quad = yᵀ(K+diag(R))⁻¹y = Σ rᵢ²/Sᵢ and
    logdet = log|K+diag(R)| = Σ log Sᵢ.  Powers both ``ss_loglik`` and the
    state-space Laplace marginal (inference/laplace.py), which needs the
    quadratic form and the determinant separately."""
    n, d = _steps_nd(A)
    soa_in = steps_are_soa(A)
    if (soa_in and d <= SOA_MAX_D) or _soa_active(d):
        return _ss_loglik_parts_soa(A, Q, H, y, R)
    if soa_in or _dtf_active(d):
        # mid-d: dims-to-front layout — O(d)-trace combines, n minor
        return _ss_loglik_parts_dtf(A, Q, H, y, R)
    dtype = A.dtype
    Rv = jnp.broadcast_to(jnp.asarray(R, dtype), (n,))
    m_f, P_f = ss_filter(A, Q, H, y, R)
    m_prev = jnp.concatenate([jnp.zeros((1, d), dtype), m_f[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P_f[:-1]])
    m_pred = (A @ m_prev[..., None])[..., 0]               # (n, d)
    P_pred = A @ P_prev @ jnp.swapaxes(A, -1, -2) + Q
    mean = jnp.einsum("nd,nd->n", H, m_pred)
    S = jnp.einsum("nd,nde,ne->n", H, P_pred, H) + Rv
    r = y - mean
    return jnp.sum(r * r / S), jnp.sum(jnp.log(S))


def ss_loglik(A, Q, H, y, R):
    """log N(y; 0, K + diag(R)) by prediction-error decomposition — the
    matrix-state generalization of markov.ou_loglik."""
    n = _steps_nd(A)[0]
    quad, logdet = ss_loglik_parts(A, Q, H, y, R)
    return -0.5 * (quad + logdet + n * _LOG_2PI)


class _SElems(NamedTuple):
    E: jnp.ndarray    # (n, d, d)
    g: jnp.ndarray    # (n, d)
    L: jnp.ndarray    # (n, d, d)


def _scombine(a: _SElems, b: _SElems) -> _SElems:
    # composes m_k = E_k m_{k+1} + g_k backward recurrences.  Under
    # associative_scan(reverse=True) (flip-scan-flip), the FIRST argument
    # is the element nearer the END of the original array: a = suffix for
    # k+1.., b = element at k.
    E = b.E @ a.E
    g = (b.E @ a.g[..., None])[..., 0] + b.g
    L = b.E @ a.L @ jnp.swapaxes(b.E, -1, -2) + b.L
    return _SElems(E, g, L)


def ss_smooth(A, Q, H, y, R, obs=None):
    """Smoothed posterior N(m_s, P_s) of the state at every point — the
    parallel RTS pass: smoothing elements (E, g, L) with
        E_k = P_f_k A_{k+1}ᵀ (A_{k+1} P_f_k A_{k+1}ᵀ + Q_{k+1})⁻¹
        g_k = m_f_k − E_k A_{k+1} m_f_k
        L_k = P_f_k − E_k (A_{k+1} P_f_k A_{k+1}ᵀ + Q_{k+1}) E_kᵀ
    composed by a REVERSE associative scan (m_s_k = E_k m_s_{k+1} + g_k)."""
    n, d = _steps_nd(A)
    if (steps_are_soa(A) and d <= SOA_MAX_D) or _soa_active(d):
        m_s, P_s = _ss_smooth_soa(A, Q, H, y, R, obs=obs)
        return _soa_to_vec(m_s), _soa_to_mat(P_s)
    A, Q, H = densify_steps(A, Q, H)
    dtype = A.dtype
    m_f, P_f = ss_filter(A, Q, H, y, R, obs=obs)
    A1 = A[1:]                                             # transition k -> k+1
    Pp = A1 @ P_f[:-1] @ jnp.swapaxes(A1, -1, -2) + Q[1:]  # predicted cov at k+1
    # E = P_f A1ᵀ Pp⁻¹  (solve on the transposed system; Pp is PD — the
    # filter preserves positive-definiteness from the PD stationary prior —
    # so the unpivoted pure-HLO solve is safe)
    E = jnp.swapaxes(
        solve_small(Pp, A1 @ P_f[:-1]), -1, -2
    )
    g = m_f[:-1] - (E @ (A1 @ m_f[:-1][..., None]))[..., 0]
    L = P_f[:-1] - E @ Pp @ jnp.swapaxes(E, -1, -2)
    zero = jnp.zeros((1, d, d), dtype)
    elems = _SElems(
        E=jnp.concatenate([E, zero]),
        g=jnp.concatenate([g, m_f[-1:]]),
        L=jnp.concatenate([L, P_f[-1:]]),
    )
    suf = lax.associative_scan(_scombine, elems, reverse=True)
    return suf.g, suf.L


def ss_innovation_coeffs(A, Q, H, jitter):
    """Data-independent innovation decomposition of K + jitter·I.

    The filtered covariances P_f of the state-space model do not depend on
    the observations, so one (parallel) covariance filter with obs variance
    ``jitter`` yields the per-step predicted covariance P_pred, innovation
    variance S_k = H P_pred Hᵀ + jitter and Kalman gain K_k = P_pred H / S_k.
    The affine innovation recurrence

        x̂_k = A_k x̂_{k-1} + K_k √S_k z_k
        f_k  = H_k A_k x̂_{k-1} + √S_k z_k,   z ~ N(0, I)

    then realizes f = L z with L·Lᵀ = K + jitter·I and L LOWER-TRIANGULAR
    in step order with positive diagonal √S — i.e. L IS the Cholesky factor
    (the innovation factorization is the unique such factorization), built
    without any Cholesky sweep: the TPU-native whitening map for
    ``build_latent_whitened_markov`` (reference parity: the whitened
    non-Gaussian path of src/liklihoods.jl at state-space cost).
    Returns (gains K (n,d), innovation variances S (n,))."""
    n, d = _steps_nd(A)
    if steps_are_soa(A) and d > SOA_MAX_D:
        A, Q, H = densify_steps(A, Q, H)
    if steps_are_soa(A) or _soa_active(d):
        P_f, (As, Qs, Hs, _) = _ss_filter_cov_soa(A, Q, H, jitter)
        P_prev = _soa_shift(P_f)
        P_pred = _soa_madd(_soa_mm(_soa_mm(As, P_prev), _soa_t(As)), Qs)
        PH = _soa_mv(P_pred, Hs)
        S = sum(Hs[i] * PH[i] for i in range(d)) + jitter
        return _soa_to_vec(tuple(p / S for p in PH)), S
    dtype = A.dtype
    P_f = ss_filter_cov(A, Q, H, jitter)
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P_f[:-1]])
    P_pred = A @ P_prev @ jnp.swapaxes(A, -1, -2) + Q
    PH = (P_pred @ H[..., None])[..., 0]                   # (n, d)
    S = jnp.einsum("nd,nd->n", H, PH) + jitter
    return PH / S[:, None], S


def _affine_scan(M, b):
    """x_k = M_k x_{k-1} + b_k as an associative scan; returns all x_k."""

    def comb(e1, e2):
        return e2[0] @ e1[0], (e2[0] @ e1[1][..., None])[..., 0] + e2[1]

    _, x = lax.associative_scan(comb, (M, b))
    return x


def ss_whiten_apply(A, H, Kg, S, z):
    """f = L z through the innovation recurrence (see ss_innovation_coeffs):
    O(n log n), differentiable in everything."""
    if steps_are_soa(A):
        A, H = _soa_to_mat(A), _soa_to_vec(H)
    n, d, _ = A.shape
    sqrtS = jnp.sqrt(S)
    xhat = _affine_scan(A, Kg * (sqrtS * z)[:, None])
    xprev = jnp.concatenate([jnp.zeros((1, d), A.dtype), xhat[:-1]])
    HA = jnp.einsum("nd,nde->ne", H, A)
    return jnp.einsum("ne,ne->n", HA, xprev) + sqrtS * z


def ss_unwhiten(A, H, Kg, S, f):
    """z = L⁻¹ f — the inverse innovation recurrence: substituting the
    measurement into the filter mean update gives
    x̂_k = (A_k − K_k Hᵀ A_k) x̂_{k-1} + K_k f_k, then
    z_k = (f_k − HᵀA x̂_{k-1}) / √S_k."""
    if steps_are_soa(A):
        A, H = _soa_to_mat(A), _soa_to_vec(H)
    n, d, _ = A.shape
    HA = jnp.einsum("nd,nde->ne", H, A)
    M = A - Kg[:, :, None] * HA[:, None, :]
    xhat = _affine_scan(M, Kg * f[:, None])
    xprev = jnp.concatenate([jnp.zeros((1, d), A.dtype), xhat[:-1]])
    return (f - jnp.einsum("ne,ne->n", HA, xprev)) / jnp.sqrt(S)


def psd_sqrt(Q: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD square root of (..., d, d) matrices via eigh with
    eigenvalue clamping: L = U √max(s, 0), L Lᵀ = Q₊.

    Robust where a Cholesky sweep is not: step-noise matrices Q = P∞ −
    A P∞ Aᵀ are exactly singular for static blocks and carry tiny NEGATIVE
    roundoff eigenvalues for near-identity transitions (SqExp blocks at
    small Δt/l), which a guarded Cholesky amplifies into huge factors.
    jnp.linalg.eigh is LAPACK on CPU and a pure-HLO Jacobi/QDWH solve on
    TPU — no cholesky custom call (the axon-fault class this module
    avoids)."""
    s, U = jnp.linalg.eigh(Q)
    return U * jnp.sqrt(jnp.maximum(s, 0.0))[..., None, :]


def ss_prior_sample(key, A, Q):
    """One exact prior state path x ~ the Gauss-Markov prior, via the matrix
    linear recurrence x_k = A_k x_{k-1} + L_k z_k (L_k L_kᵀ = Q_k) as an
    associative scan.  Q's square root is the clamped-eigh ``psd_sqrt`` —
    Q may be singular (static blocks) or indefinite-by-roundoff (SqExp
    blocks at tiny steps)."""
    if steps_are_soa(A):
        # prior sampling is a once-per-report path, not the vg hot loop:
        # densifying here is fine (psd_sqrt needs dense (n, d, d) eigh)
        A, Q = _soa_to_mat(A), _soa_to_mat(Q)
    n, d, _ = A.shape
    Lq = psd_sqrt(Q)
    z = jax.random.normal(key, (n, d), A.dtype)
    b = (Lq @ z[..., None])[..., 0]

    def comb(e1, e2):
        return e2[0] @ e1[0], (e2[0] @ e1[1][..., None])[..., 0] + e2[1]

    _, x = lax.associative_scan(comb, (A, b))
    return x


def ss_smooth_windowed(kinds, params, ts, xs, ys, Rv, obs, resets,
                       window: int, overlap: int):
    """Windowed smoothing: H·m_s and H P_s Hᵀ at every (sorted) row,
    computed in fixed-size overlapping chunks via ``lax.map``.

    Motivation: the monolithic smoother's associative scans unroll
    log2(n) combine levels; at high state dims (the quasi-periodic d=42)
    the n=2^17 predict program did not finish COMPILING in 35 min on the
    remote TPU service (CLAUDE.md round-4).  Chunks of W rows (default
    2^14) bound the traced scan depth at log2(W + 2V) with ONE traced
    window body (lax.map), so compile cost is independent of n, and
    peak memory holds one window's (L, d, d) buffers.

    Accuracy: the smoothed posterior at a row depends on remote rows only
    through the Markov semigroup, whose influence decays exponentially in
    Δt/lengthscale — each chunk carries ``overlap`` context rows on both
    sides and only its interior W rows are kept, so interior estimates
    match the monolithic smoother once overlap spans a few lengthscales
    (parity-tested; tests/test_markov.py).  Each chunk restarts from the
    stationary prior (build_steps zeroes the first transition) — exactly
    the correct unconditional state for rows beyond the overlap horizon.

    ``ts``/``ys``/``Rv``/``obs`` are the SORTED length-N arrays; ``xs``/
    ``resets`` per-block payloads in the same order (resets entries may be
    None).  Returns (mu, var) of length N."""
    N = ts.shape[0]
    dtype = ts.dtype
    W, V = int(window), int(overlap)
    nwin = -(-N // W)
    back = nwin * W - N + V

    def _pad(v, front_val, back_val):
        return jnp.concatenate([
            jnp.full((V,), front_val, v.dtype),
            v,
            jnp.full((back,), back_val, v.dtype),
        ])

    ts_p = _pad(ts, ts[0], ts[-1])
    ys_p = _pad(ys, 0.0, 0.0)
    Rv_p = _pad(jnp.broadcast_to(jnp.asarray(Rv, dtype), (N,)), 1.0, 1.0)
    obs_p = _pad(jnp.asarray(obs, bool) if obs is not None
                 else jnp.ones((N,), bool), False, False)

    def _pad_x(x):
        if x is None:
            return None
        if isinstance(x, tuple):
            return tuple(_pad_x(a) for a in x)
        return _pad(x, x[0], x[-1])

    xs_p = [_pad_x(x) for x in xs]
    resets_p = tuple(
        None if r is None else _pad(jnp.asarray(r), False, False)
        for r in (resets if resets is not None else (None,) * len(kinds))
    )
    L = W + 2 * V

    def one(w):
        lo = w * W

        def sl(v):
            if v is None:
                return None
            if isinstance(v, tuple):
                return tuple(sl(a) for a in v)
            return lax.dynamic_slice_in_dim(v, lo, L)

        A, Q, H = build_steps(kinds, params, sl(ts_p), [sl(x) for x in xs_p],
                              resets=tuple(sl(r) for r in resets_p))
        m_s, P_s = ss_smooth(A, Q, H, sl(ys_p), sl(Rv_p), obs=sl(obs_p))
        mu = jnp.einsum("nd,nd->n", H, m_s)
        var = jnp.einsum("nd,nde,ne->n", H, P_s, H)
        return mu[V:V + W], var[V:V + W]

    mus, vars_ = lax.map(one, jnp.arange(nwin))
    return mus.reshape(-1)[:N], vars_.reshape(-1)[:N]


def ss_predict(kinds, params, t, xs, y, R, t_new, xs_new,
               order=None, resets=None, window=None, overlap=None):
    """Posterior latent mean/var (H·x only) at t_new given observations
    (t, y) with obs variance R — matrix-state analogue of
    markov.ou_posterior_predict: new points join the sequence unobserved,
    one smoothing pass, read off H m_s / H P_s Hᵀ.

    ``order`` (optional) is the sort permutation over the JOINED (n+m)
    sequence and ``resets`` the per-block group-boundary masks in that
    sorted order (Markov×Cat formulas; computed by the caller from the
    static group columns).  Default: sort by joined time, no groups.

    ``window``/``overlap``: chunked smoothing (``ss_smooth_windowed``) —
    the high-state-dim large-n mode where the monolithic program is
    compile-bound; overlap defaults to window // 8."""
    n, m = t.shape[0], t_new.shape[0]
    tj = jnp.concatenate([t, t_new])
    yj = jnp.concatenate([y, jnp.zeros((m,), y.dtype)])
    obs = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((m,), bool)])
    Rv = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(R, y.dtype), (n,)),
        jnp.ones((m,), y.dtype),
    ])
    def _join(xo, xn):
        if xo is None:
            return None
        if isinstance(xo, tuple):  # product block: per-factor columns
            return tuple(_join(a, b) for a, b in zip(xo, xn))
        return jnp.concatenate([xo, xn])

    xs_j = [_join(xo, xn) for xo, xn in zip(xs, xs_new)]
    if order is None:
        order = jnp.argsort(tj)

    def _perm(x):
        if x is None:
            return None
        if isinstance(x, tuple):
            return tuple(_perm(a) for a in x)
        return x[order]

    xs_s = [_perm(x) for x in xs_j]
    if window is not None and int(window) > 0 and n + m > int(window):
        mu, var = ss_smooth_windowed(
            kinds, params, tj[order], xs_s, yj[order], Rv[order], obs[order],
            resets, int(window),
            int(overlap) if overlap else max(1, int(window) // 8),
        )
    else:
        A, Q, H = build_steps(kinds, params, tj[order], xs_s, resets=resets)
        m_s, P_s = ss_smooth(A, Q, H, yj[order], Rv[order], obs=obs[order])
        mu = jnp.einsum("nd,nd->n", H, m_s)
        var = jnp.einsum("nd,nde,ne->n", H, P_s, H)
    inv = jnp.argsort(order)
    return mu[inv][n:], var[inv][n:]
