"""Exact state-space (Gauss-Markov) GP marginal for OU kernels, parallelized
with ``lax.associative_scan`` — the TPU-native large-n EXACT path.

The OU kernel k(t,t') = exp(-|t-t'|/l) is exactly a stationary scalar
Gauss-Markov process:

    x_{k} = a_k x_{k-1} + q_k,   a_k = exp(-dt_k / l),  q_k ~ N(0, 1 - a_k^2)
    y_k   = x_k + r_k,           r_k ~ N(0, R_k)        (obs var + jitter)

so the dense MVN marginal log N(y; 0, K + R I) — O(n^3) Cholesky in the
generic path (ops/mvn.py), O(n m^2) approximate in the RFF path
(ops/lowrank.py) — collapses to a Kalman-filter prediction-error
decomposition: O(n) work.  A sequential filter would be a length-n scan
(unusable on a dispatch-bound backend at large n); instead the filter is
expressed as an ASSOCIATIVE operation on conditional-Gaussian elements and
evaluated with ``lax.associative_scan`` — O(n log n) elementwise work,
O(log n) depth, all VPU-vectorized.  Exact to floating point (tested vs
the dense marginal), differentiable by autodiff through the scan.

Replaces the L1 boundary for the reference's core longitudinal use case
(OU time-series formulas, abstractgp_translations.jl:10) at scales the
dense path cannot touch.

Element algebra (scalar-state filtering form of the parallel Kalman
smoother literature): each step k carries e_k = (A, b, C, eta, J) meaning
p(x_k | x_{k-1}, y_k) = N(A x_{k-1} + b, C) together with the information
(eta, J) the observation contributes about x_{k-1}.  Two consecutive
elements compose as

    d = 1 + C1 J2
    A = A2 A1 / d                 eta = A1 (eta2 - J2 b1) / d + eta1
    b = A2 (b1 + C1 eta2)/d + b2  J   = A1^2 J2 / d + J1
    C = A2^2 C1 / d + C2

which is associative; the inclusive prefix at k (with the prior folded
into element 1, A_1 = 0) has b = filtered mean E[x_k | y_{1:k}] and
C = filtered var.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_LOG_2PI = math.log(2.0 * math.pi)


class _Elems(NamedTuple):
    A: jnp.ndarray
    b: jnp.ndarray
    C: jnp.ndarray
    eta: jnp.ndarray
    J: jnp.ndarray


def _combine(e1: _Elems, e2: _Elems) -> _Elems:
    """Associative composition of filtering elements (elementwise over the
    scan axis; associative_scan calls it on array halves)."""
    d = 1.0 + e1.C * e2.J
    A = e2.A * e1.A / d
    b = e2.A * (e1.b + e1.C * e2.eta) / d + e2.b
    C = e2.A * e2.A * e1.C / d + e2.C
    eta = e1.A * (e2.eta - e2.J * e1.b) / d + e1.eta
    J = e1.A * e1.A * e2.J / d + e1.J
    return _Elems(A, b, C, eta, J)


def _ou_steps(t: jnp.ndarray, ell, R):
    """Per-step transition/noise for a stationary unit-variance OU process
    on SORTED times t: a_k = exp(-dt_k/ell), Q_k = 1 - a_k^2 (a_1/Q_1 slots
    hold the prior: a=0, Q=P0=1).  R broadcasts to (n,)."""
    n = t.shape[0]
    dt = jnp.diff(t)
    a = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.exp(-dt / ell)])
    Q = jnp.concatenate([jnp.ones((1,), t.dtype), 1.0 - a[1:] ** 2])
    Rv = jnp.broadcast_to(jnp.asarray(R, t.dtype), (n,))
    return a, Q, Rv


def ou_filter(
    t: jnp.ndarray,
    y: jnp.ndarray,
    ell: Union[float, jnp.ndarray],
    R: Union[float, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filtered means/vars E[x_k | y_{1:k}], Var[x_k | y_{1:k}] for the OU
    state-space model on sorted t.  R is the per-point observation variance
    (scalar or (n,))."""
    a, Q, Rv = _ou_steps(t, ell, R)
    S = Q + Rv
    K = Q / S
    elems = _Elems(
        A=(1.0 - K) * a,
        b=K * y,
        C=(1.0 - K) * Q,
        eta=a * y / S,
        J=a * a / S,
    )
    pre = lax.associative_scan(_combine, elems)
    return pre.b, pre.C


def ou_loglik(
    t: jnp.ndarray,
    y: jnp.ndarray,
    ell: Union[float, jnp.ndarray],
    R: Union[float, jnp.ndarray],
) -> jnp.ndarray:
    """log N(y; 0, K_OU(ell) + diag(R)) on SORTED t — exact, O(log n) depth.

    Equals ops/mvn.py::mvn_logpdf(gram + diag(R), y) to floating point;
    the MVN is permutation-invariant, so callers sort once at build time.
    """
    a, Q, Rv = _ou_steps(t, ell, R)
    m_f, P_f = ou_filter(t, y, ell, R)
    # innovations: predictive y_k | y_{1:k-1} ~ N(a_k m_{k-1}, a_k^2 P_{k-1} + Q_k + R_k)
    m_prev = jnp.concatenate([jnp.zeros((1,), y.dtype), m_f[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1,), y.dtype), P_f[:-1]])
    mean_pred = a * m_prev
    S_pred = a * a * P_prev + Q + Rv
    resid = y - mean_pred
    return jnp.sum(-0.5 * (resid * resid / S_pred + jnp.log(S_pred) + _LOG_2PI))


def ou_posterior_predict(
    t: jnp.ndarray,
    y: jnp.ndarray,
    ell: Union[float, jnp.ndarray],
    R: Union[float, jnp.ndarray],
    t_new: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior latent mean/var at t_new given (t, y) — exact OU GP
    regression in O((n + n_new) log(n + n_new)): t_new points enter the
    joint sequence as unobserved, then a two-filter smoother combines a
    forward and a time-reversed associative-scan filter.

    Two-filter derivation (stationary unit-variance OU is reversible, so
    the reversed sequence follows the SAME model with the SAME stationary
    N(0,1) prior):

        p(x_k | y_all) ∝ p(x_k | y_{0:k}) · p(y_{k+1:} | x_k)

    The reversed filter at original index k+1 gives the POSTERIOR
    p(x_{k+1} | y_{k+1:}) = N(m_r, P_r); Bayes against the stationary prior
    turns it into the likelihood L(x_{k+1}) with information
    J_L = 1/P_r − 1, η_L = m_r/P_r.  Propagating L through the transition
    x_{k+1} | x_k ~ N(a x_k, Q):

        J' = J_L / (1 + Q J_L),  η' = η_L / (1 + Q J_L)
        J_b = a² J',             η_b = a η'

    and the smoothed posterior combines precisions:
    P_s = 1/(1/P_f + J_b), m_s = P_s (m_f/P_f + η_b).
    """
    tj = jnp.concatenate([t, t_new])
    yj = jnp.concatenate([y, jnp.zeros(t_new.shape, y.dtype)])
    obs_flag = jnp.concatenate([
        jnp.ones(t.shape, bool), jnp.zeros(t_new.shape, bool)
    ])
    Rv = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(R, y.dtype), t.shape),
        jnp.ones(t_new.shape, y.dtype),  # placeholder; masked out below
    ])
    order = jnp.argsort(tj)
    ts, ys, Rs, obs = tj[order], yj[order], Rv[order], obs_flag[order]
    m_s, P_s = _smooth(ts, ys, Rs, obs, ell)
    inv = jnp.argsort(order)
    return m_s[inv][t.shape[0]:], P_s[inv][t.shape[0]:]


def _masked_filter(ts, ys, Rs, obs, ell):
    """Associative-scan filter with unobserved points (obs False) skipped:
    K = 0, no information contribution."""
    a, Q, _ = _ou_steps(ts, ell, 0.0)
    S = Q + Rs
    K = jnp.where(obs, Q / S, 0.0)
    elems = _Elems(
        A=(1.0 - K) * a,
        b=K * ys,
        C=(1.0 - K) * Q,
        eta=jnp.where(obs, a * ys / S, 0.0),
        J=jnp.where(obs, a * a / S, 0.0),
    )
    pre = lax.associative_scan(_combine, elems)
    return pre.b, pre.C


def _smooth(ts, ys, Rs, obs, ell):
    """Two-filter smoothed posterior N(m_s, P_s) of the OU latent at every
    point of the sorted sequence (see ou_posterior_predict docstring for
    the derivation)."""
    m_f, P_f = _masked_filter(ts, ys, Rs, obs, ell)        # p(x_k | y_{0:k})
    m_bf, P_bf = _masked_filter(-ts[::-1], ys[::-1], Rs[::-1], obs[::-1], ell)
    # reversed index j holds p(x_{n-1-j} | y_{n-1-j:}); original k+1 is j = n-2-k
    m_r = m_bf[::-1][1:]                                   # at original k+1, k=0..n-2
    P_r = P_bf[::-1][1:]
    a, Q, _ = _ou_steps(ts, ell, 0.0)
    a_next, Q_next = a[1:], Q[1:]                          # transition k -> k+1
    J_L = 1.0 / P_r - 1.0
    eta_L = m_r / P_r
    denom = 1.0 + Q_next * J_L
    J_b = a_next * a_next * J_L / denom
    eta_b = a_next * eta_L / denom
    zero = jnp.zeros((1,), ys.dtype)
    J_b = jnp.concatenate([J_b, zero])                     # k = n-1: no future
    eta_b = jnp.concatenate([eta_b, zero])
    P_s = 1.0 / (1.0 / P_f + J_b)
    m_s = P_s * (m_f / P_f + eta_b)
    return m_s, P_s


def ou_smooth(
    t: jnp.ndarray,
    y: jnp.ndarray,
    ell: Union[float, jnp.ndarray],
    R: Union[float, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed posterior mean/var of the pure-OU latent x at the OBSERVED
    sorted points: E[x|y], Var[x|y] with y = x + N(0, R).  m_s equals
    K (K + R I)^{-1} y — the building block for Matheron latent draws."""
    Rv = jnp.broadcast_to(jnp.asarray(R, y.dtype), t.shape)
    return _smooth(t, y, Rv, jnp.ones(t.shape, bool), ell)


def ou_prior_sample(
    key: jax.Array,
    t: jnp.ndarray,
    ell: Union[float, jnp.ndarray],
) -> jnp.ndarray:
    """One exact prior path x ~ N(0, K_OU(ell)) at sorted t, via the linear
    recurrence x_k = a_k x_{k-1} + sqrt(Q_k) z_k as an associative scan on
    (a, b) pairs: (a2, b2) ∘ (a1, b1) = (a2 a1, a2 b1 + b2)."""
    a, Q, _ = _ou_steps(t, ell, 0.0)
    z = jax.random.normal(key, t.shape, t.dtype)
    b = jnp.sqrt(Q) * z

    def comb(e1, e2):
        return e2[0] * e1[0], e2[0] * e1[1] + e2[1]

    _, x = lax.associative_scan(comb, (a, b))
    return x
