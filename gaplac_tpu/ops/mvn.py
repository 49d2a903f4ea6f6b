"""MVN core: Cholesky-backed logpdf, prior sampling, and GP posterior.

Replaces the reference's AbstractGPs FiniteGP internals — the L1 boundary
where ALL linear algebra happened (SURVEY.md §1): ``logpdf(FiniteGP(gp, X,
0.1), y)`` (select.jl:49-50), ``rand(gp(X, 0.1))`` (sample.jl:25), and
``posterior`` (plotting.jl:8).  The observation variance ("jitter") 0.1 is
the reference's hard default (sample.jl:25, mcmc.jl:35, select.jl:43).

Backend seam: ``cholesky``/``solve_triangular`` route through
gaplac_tpu.ops.linalg which picks the Pallas blocked kernels on TPU for
large n and jnp/XLA otherwise.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaplac_tpu.ops import linalg

DEFAULT_JITTER = 0.1  # ref: sample.jl:25, mcmc.jl:35, select.jl:43


def add_jitter(K: jnp.ndarray, jitter: float | jnp.ndarray) -> jnp.ndarray:
    n = K.shape[-1]
    return K + jitter * jnp.eye(n, dtype=K.dtype)


def chol(K: jnp.ndarray, jitter: float | jnp.ndarray = 0.0) -> jnp.ndarray:
    """Lower Cholesky factor of K (+ jitter*I)."""
    if not (isinstance(jitter, (int, float)) and jitter == 0.0):
        K = add_jitter(K, jitter)
    return linalg.cholesky(K)


def mvn_logpdf_chol(L: jnp.ndarray, y: jnp.ndarray, mean=0.0) -> jnp.ndarray:
    """log N(y; mean, L L^T).  Natural log, matching Distributions.logpdf
    (the reference's select lp values, select.jl:49-50)."""
    n = y.shape[-1]
    alpha = linalg.solve_triangular(L, y - mean, lower=True)
    quad = jnp.sum(alpha * alpha, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))


def mvn_logpdf(K: jnp.ndarray, y: jnp.ndarray, mean=0.0, jitter: float = 0.0) -> jnp.ndarray:
    return mvn_logpdf_chol(chol(K, jitter), y, mean)


def sample_mvn_chol(key: jax.Array, L: jnp.ndarray, mean=0.0) -> jnp.ndarray:
    """One draw from N(mean, L L^T) via f = mean + L z (ref hot path:
    rand(gp(X, 0.1)), sample.jl:25)."""
    z = jax.random.normal(key, L.shape[:-1], dtype=L.dtype)
    return mean + L @ z


def sample_mvn(key: jax.Array, K: jnp.ndarray, mean=0.0, jitter: float = 0.0) -> jnp.ndarray:
    return sample_mvn_chol(key, chol(K, jitter), mean)


class GPPosterior(NamedTuple):
    """Cached solves for GP regression: given train (X, y) with obs variance
    ``noise``, predicts mean/cov at test points (AbstractGPs ``posterior``)."""

    L: jnp.ndarray       # chol(K_xx + noise I)
    alpha: jnp.ndarray   # (K_xx + noise I)^{-1} (y - mean)


def gp_posterior_cache(K_xx: jnp.ndarray, y: jnp.ndarray, noise, mean=0.0) -> GPPosterior:
    L = chol(K_xx, 0.0) if noise is None else chol(add_jitter(K_xx, noise))
    a = linalg.solve_triangular(L, y - mean, lower=True)
    alpha = linalg.solve_triangular(L.T, a, lower=False)
    return GPPosterior(L, alpha)


def gp_predict_mean(post: GPPosterior, K_tx: jnp.ndarray, prior_mean=0.0) -> jnp.ndarray:
    """Posterior mean at test points: m_t + K_tx alpha."""
    return prior_mean + K_tx @ post.alpha


def gp_predict_var(post: GPPosterior, K_tx: jnp.ndarray, K_tt_diag: jnp.ndarray) -> jnp.ndarray:
    """Posterior marginal variance (diag only): k_tt - ||L^{-1} K_xt||^2.

    This is ``mean_and_var`` in the reference's plotting path
    (plotting.jl:12)."""
    V = linalg.solve_triangular(post.L, K_tx.T, lower=True)
    return K_tt_diag - jnp.sum(V * V, axis=0)


def gp_predict_cov(post: GPPosterior, K_tx: jnp.ndarray, K_tt: jnp.ndarray) -> jnp.ndarray:
    V = linalg.solve_triangular(post.L, K_tx.T, lower=True)
    return K_tt - V.T @ V
