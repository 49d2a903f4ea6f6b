"""Low-rank (feature-space) MVN ops: N(0, Phi Phi^T + D) without n x n math.

TPU-first large-n path: with Phi an (n, m) feature matrix (kernels/features.py)
and D = diag(d) the observation/jitter diagonal, every operation reduces via
the Woodbury identity to dense (n, m) matmuls (MXU) plus one m x m Cholesky —
O(n m^2) instead of the dense path's O(n^3) (ops/mvn.py).  This is the
framework's scaling answer to the reference's dense-only FiniteGP math
(AbstractGPs logpdf/rand/posterior; /root/reference/CLI/src/select.jl:49-50,
sample.jl:25, plotting.jl:8), which is O(n^3) and capped at n ~ a few
thousand.

Identities (A := I_m + Phi^T D^-1 Phi, the "capacitance" matrix):
  (Phi Phi^T + D)^-1 = D^-1 - D^-1 Phi A^-1 Phi^T D^-1
  logdet(Phi Phi^T + D) = logdet(A) + sum(log d)

Weight-space view (used by posterior/predict/sample): y = Phi w + e with
w ~ N(0, I_m), e ~ N(0, D)  ==>  w | y ~ N(A^-1 Phi^T D^-1 y, A^-1).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from gaplac_tpu.ops import linalg

_LOG_2PI = math.log(2.0 * math.pi)


def _as_diag(d: Union[float, jnp.ndarray], n: int, dtype) -> jnp.ndarray:
    d = jnp.asarray(d, dtype)
    return jnp.broadcast_to(d, (n,))


class LowRankChol(NamedTuple):
    """Cached factorization of Phi Phi^T + diag(d).

    ``R`` is the lower Cholesky factor of A = I_m + Phi^T D^-1 Phi.
    ``phi_over_d`` caches D^-1 Phi (reused by every solve).
    """

    phi: jnp.ndarray         # (n, m)
    d: jnp.ndarray           # (n,)
    phi_over_d: jnp.ndarray  # (n, m)
    R: jnp.ndarray           # (m, m) lower


def lowrank_chol(phi: jnp.ndarray, d: Union[float, jnp.ndarray]) -> LowRankChol:
    n, m = phi.shape
    d = _as_diag(d, n, phi.dtype)
    phi_over_d = phi / d[:, None]
    A = jnp.eye(m, dtype=phi.dtype) + phi.T @ phi_over_d
    # symmetrize: phi^T D^-1 phi is symmetric up to matmul rounding only
    A = 0.5 * (A + A.T)
    # batchsafe: under multi-chain vmap this is a BATCHED (C, m, m)
    # factorization, and XLA's batched-cholesky custom call faults the axon
    # TPU worker (observed at >= 4 chains, m=512); the pure-HLO route costs
    # O(m) scan steps — invisible next to the 2 n m^2 feature matmuls
    return LowRankChol(phi, d, phi_over_d, linalg.cholesky_batchsafe(A))


def lowrank_solve(lr: LowRankChol, y: jnp.ndarray) -> jnp.ndarray:
    """(Phi Phi^T + D)^-1 y via Woodbury; y is (n,) or (n, k)."""
    y_over_d = y / (lr.d[:, None] if y.ndim == 2 else lr.d)
    b = lr.phi_over_d.T @ y
    u = linalg.solve_triangular(lr.R, b, lower=True)
    v = linalg.solve_triangular(lr.R.T, u, lower=False)
    return y_over_d - lr.phi_over_d @ v


def lowrank_logdet(lr: LowRankChol) -> jnp.ndarray:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(lr.R))) + jnp.sum(jnp.log(lr.d))


def lowrank_logpdf_chol(lr: LowRankChol, y: jnp.ndarray, mean=0.0) -> jnp.ndarray:
    """log N(y; mean, Phi Phi^T + D).  Natural log (reference lp scale,
    matching ops/mvn.py::mvn_logpdf on the dense equivalent)."""
    r = y - mean
    n = r.shape[-1]
    b = lr.phi_over_d.T @ r                            # (m,)
    u = linalg.solve_triangular(lr.R, b, lower=True)
    quad = jnp.sum(r * r / lr.d) - jnp.sum(u * u)
    return -0.5 * (quad + lowrank_logdet(lr) + n * _LOG_2PI)


def lowrank_logpdf(
    phi: jnp.ndarray, d: Union[float, jnp.ndarray], y: jnp.ndarray, mean=0.0
) -> jnp.ndarray:
    return lowrank_logpdf_chol(lowrank_chol(phi, d), y, mean)


def sample_lowrank(
    key: jax.Array, phi: jnp.ndarray, d: Union[float, jnp.ndarray], mean=0.0
) -> jnp.ndarray:
    """One draw f ~ N(mean, Phi Phi^T + D): f = mean + Phi w + sqrt(d) eta.

    Low-rank analogue of ops/mvn.py::sample_mvn (ref hot path rand(gp(X, 0.1)),
    sample.jl:25) — O(n m) instead of O(n^3)."""
    n, m = phi.shape
    d = _as_diag(d, n, phi.dtype)
    kw, ke = jax.random.split(key)
    w = jax.random.normal(kw, (m,), phi.dtype)
    eta = jax.random.normal(ke, (n,), phi.dtype)
    return mean + phi @ w + jnp.sqrt(d) * eta


class LowRankPosterior(NamedTuple):
    """Weight-space GP regression posterior (low-rank analogue of
    ops/mvn.py::GPPosterior): w | y ~ N(w_mean, (R R^T)^-1)."""

    w_mean: jnp.ndarray  # (m,)
    R: jnp.ndarray       # (m, m) lower chol of A = I + Phi^T D^-1 Phi


def lowrank_posterior(
    phi: jnp.ndarray, d: Union[float, jnp.ndarray], y: jnp.ndarray, mean=0.0
) -> LowRankPosterior:
    lr = lowrank_chol(phi, d)
    b = lr.phi_over_d.T @ (y - mean)
    u = linalg.solve_triangular(lr.R, b, lower=True)
    w_mean = linalg.solve_triangular(lr.R.T, u, lower=False)
    return LowRankPosterior(w_mean, lr.R)


def lowrank_predict_mean(
    post: LowRankPosterior, phi_t: jnp.ndarray, prior_mean=0.0
) -> jnp.ndarray:
    """Posterior mean at test features phi_t (n_t, m)."""
    return prior_mean + phi_t @ post.w_mean


def lowrank_predict_var(
    post: LowRankPosterior, phi_t: jnp.ndarray, extra_diag: Union[float, jnp.ndarray] = 0.0
) -> jnp.ndarray:
    """Posterior marginal variance of f* = Phi* w (+ optional independent
    diagonal prior variance, e.g. the jitter carried by the latent f)."""
    V = linalg.solve_triangular(post.R, phi_t.T, lower=True)  # (m, n_t)
    return jnp.sum(V * V, axis=0) + extra_diag


def lowrank_conditional_sample_at(
    key: jax.Array,
    phi: jnp.ndarray,
    d0: Union[float, jnp.ndarray],
    obs_sigma2: Union[float, jnp.ndarray],
    y: jnp.ndarray,
    phi_t: jnp.ndarray,
    d0_t: Union[float, jnp.ndarray],
) -> jnp.ndarray:
    """Exact draw of f* at TEST features from p(f* | y) by Matheron pathwise
    conditioning, where train f = Phi w + sqrt(d0) eta (w ~ N(0, I_m)),
    y = f + N(0, s2 I), and f* = Phi* w + sqrt(d0_t) eta* shares only the
    weights w with the training function (cross-covariance Phi* Phi^T; the
    diagonal parts are row-independent, matching the dense path's Noise/jitter
    semantics).  Low-rank analogue of sample_cmd's posterior draw
    (legacy samplegp, ref bin/old_options.jl:93-118) — all O((n + n_t) m)."""
    n, m = phi.shape
    d0 = _as_diag(d0, n, phi.dtype)
    d0_t = _as_diag(d0_t, phi_t.shape[0], phi.dtype)
    kw, ke, ko, kt = jax.random.split(key, 4)
    w0 = jax.random.normal(kw, (m,), phi.dtype)
    f0 = phi @ w0 + jnp.sqrt(d0) * jax.random.normal(ke, (n,), phi.dtype)
    e0 = jnp.sqrt(jnp.asarray(obs_sigma2, phi.dtype)) * jax.random.normal(
        ko, (n,), phi.dtype
    )
    lr = lowrank_chol(phi, d0 + obs_sigma2)
    v = lowrank_solve(lr, y - f0 - e0)  # (K_xx + d0 + s2 I)^-1 residual
    return phi_t @ (w0 + phi.T @ v) + jnp.sqrt(d0_t) * jax.random.normal(
        kt, (phi_t.shape[0],), phi.dtype
    )


def lowrank_conditional_sample(
    key: jax.Array,
    phi: jnp.ndarray,
    d0: Union[float, jnp.ndarray],
    obs_sigma2: Union[float, jnp.ndarray],
    y: jnp.ndarray,
) -> jnp.ndarray:
    """Exact draw from p(f | y) where f ~ N(0, C), C = Phi Phi^T + diag(d0),
    and y = f + e with e ~ N(0, obs_sigma2 I) — Matheron's rule (pathwise
    conditioning):  f_post = f0 + C (C + s2 I)^-1 (y - f0 - e0)
    with prior draws f0 ~ N(0, C), e0 ~ N(0, s2 I).  All O(n m^2).

    Used by the low-rank marginalized model's ``report`` to materialize the
    chain's fx columns exactly as the dense path does
    (inference/model.py::build_gaussian_marginal report)."""
    n = y.shape[0]
    d0 = _as_diag(d0, n, phi.dtype)
    kf, ke = jax.random.split(key)
    f0 = sample_lowrank(kf, phi, d0)
    e0 = jnp.sqrt(jnp.asarray(obs_sigma2, phi.dtype)) * jax.random.normal(ke, (n,), phi.dtype)
    lr = lowrank_chol(phi, d0 + obs_sigma2)
    v = lowrank_solve(lr, y - f0 - e0)         # (C + s2 I)^-1 residual
    return f0 + phi @ (phi.T @ v) + d0 * v     # C v  (C = Phi Phi^T + diag d0)
