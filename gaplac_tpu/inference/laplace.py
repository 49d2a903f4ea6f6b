"""Laplace approximation for latent-GP posteriors (legacy capability:
``laplace_approx``, /root/reference/test/oldtests.jl:57-58; SURVEY.md §2.11).

Standard GPML Algorithm 3.1 (Rasmussen & Williams): Newton iteration for the
mode of p(f | y, theta) with the stabilized B = I + sqrt(W) K sqrt(W)
parameterization, giving

    log q(y | theta) = -1/2 a^T f_hat + loglik(f_hat) - 1/2 log|B|

— an approximate marginal likelihood that powers (a) a fast MAP-style
hyperparameter path for non-Gaussian likelihoods (the analogue of the exact
marginalized model used for Gaussian data) and (b) Gaussian posterior
predictions around the mode.  Fixed Newton iteration count -> jit/grad-safe
(gradients flow through the unrolled iterations).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaplac_tpu.inference.likelihoods import make_loglik
from gaplac_tpu.inference.priors import as_prior
from gaplac_tpu.inference.model import (
    DEFAULT_PRIOR_BOUNDS,
    GPModel,
    _params_from,
)
from gaplac_tpu.kernels.covariance import CompiledKernel
from gaplac_tpu.ops import linalg, mvn


class LaplaceFit(NamedTuple):
    f_mode: jnp.ndarray
    log_marginal: jnp.ndarray
    W: jnp.ndarray          # negative loglik curvature at the mode


def laplace_approx(
    K: jnp.ndarray,
    y: jnp.ndarray,
    loglik_fn: Callable,
    aux: Optional[jnp.ndarray] = None,
    num_iters: int = 15,
) -> LaplaceFit:
    """Newton mode-finding + Laplace marginal for latent f ~ N(0, K)."""
    n = y.shape[0]
    dtype = K.dtype
    eye = jnp.eye(n, dtype=dtype)

    ll = lambda f: jnp.sum(loglik_fn(y, f, aux))
    grad_ll = jax.grad(ll)

    def newton(carry, _):
        f, _a = carry
        g = grad_ll(f)
        W = jnp.maximum(-_diag_hess(loglik_fn, y, f, aux), 1e-9)
        sw = jnp.sqrt(W)
        B = eye + sw[:, None] * K * sw[None, :]
        L = linalg.cholesky(B)
        b = W * f + g
        Kb = K @ b
        v = linalg.solve_triangular(L, sw * Kb, lower=True)
        a = b - sw * linalg.solve_triangular(L.T, v, lower=False)
        f_new = K @ a
        return (f_new, a), None

    f0 = jnp.zeros((n,), dtype)
    (f_hat, a_hat), _ = jax.lax.scan(newton, (f0, f0), None, length=num_iters)

    # final quantities at the mode; f_hat = K a_hat, so the GPML Alg 3.1
    # quadratic term -0.5 f^T K^{-1} f = -0.5 a^T f needs no extra Cholesky
    W = jnp.maximum(-_diag_hess(loglik_fn, y, f_hat, aux), 1e-9)
    sw = jnp.sqrt(W)
    B = eye + sw[:, None] * K * sw[None, :]
    L = linalg.cholesky(B)
    log_marginal = (
        -0.5 * jnp.dot(a_hat, f_hat)
        + ll(f_hat)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
    )
    return LaplaceFit(f_hat, log_marginal, W)


def _diag_hess(loglik_fn, y, f, aux):
    """Diagonal Hessian of the per-point loglik w.r.t. f (exact — the
    likelihood factorizes over points)."""
    def one(yi, fi, ai):
        return jax.grad(jax.grad(lambda v: jnp.sum(loglik_fn(yi, v, ai))))(fi)

    if aux is None:
        return jax.vmap(lambda yi, fi: one(yi, fi, None))(y, f)
    return jax.vmap(one)(y, f, aux)




def build_laplace_marginal_markov(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    likelihood,
    aux: Optional[jnp.ndarray] = None,
    jitter: float = mvn.DEFAULT_JITTER,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
    num_iters: int = 15,
) -> GPModel:
    """State-space Laplace marginal (--approx sde, non-Gaussian
    likelihoods): the same GPML Alg 3.1 objective as
    ``build_laplace_marginal``, with every O(n³) dense solve replaced by an
    O(n log n) parallel-Kalman pass —

      Newton step    f ← K(K + diag(1/W))⁻¹ z  = heteroscedastic smoothing
                     of the working response z = f + ∇ll/W,
      −½ f̂ᵀK⁻¹f̂    = the filter's quadratic form at R = j_eff,
      −½ log|B|      = −½(Σ log Sᵢ at R = j_eff + 1/W  +  Σ log Wᵢ),

    so non-Gaussian longitudinal GP inference (Bernoulli/Poisson/StudentT/
    Binomial) runs at observation counts the dense Laplace cannot touch.
    Supports the full --approx sde formula class incl. Cat grouping."""
    import numpy as _np

    from gaplac_tpu.inference.model import (
        _markov_structure,
        markov_block_xs,
        markov_param_vals,
    )
    from gaplac_tpu.ops import markov_ss as mss

    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    st = _markov_structure(ck, _np.asarray(X),
                           dynamic_slots={s for g in slot_groups for s in g})
    idx = jnp.asarray(st.sort_idx)
    inv_idx = jnp.asarray(_np.argsort(st.sort_idx))
    ts = jnp.asarray(st.t_sorted, dtype)
    ys = jnp.asarray(y, dtype)[idx]
    aux_s = None if aux is None else jnp.asarray(aux, dtype)[idx]
    kinds = tuple(b[0] for b in st.blocks)
    xs_sorted = tuple(markov_block_xs(st, jnp.asarray(X, dtype), idx=idx))
    resets_j = tuple(None if r is None else jnp.asarray(r)
                     for r in st.resets)
    loglik_fn = make_loglik(likelihood)
    #: O(n) arrays exposed as GPModel.data so large-n callers (segmented
    #: sampling, bench harnesses) pass them through jit as PARAMETERS —
    #: closure literals lower to multi-MB HLO (GPModel.logdensity_data)
    data = {"ts": ts, "ys": ys, "xs": xs_sorted, "resets": resets_j,
            "aux": aux_s}

    def _steps(p, d):
        # SoA-native tiny-d layout: the Newton-smoothing hot loop carries
        # no (n, d, d) buffer (round-5 remat-copy OOM fix, ops/markov_ss)
        return mss.build_steps(kinds, markov_param_vals(ck, st, p, dtype),
                               d["ts"], d["xs"], resets=d["resets"],
                               layout="auto")

    def _jeff(p):
        j = jnp.asarray(jitter, dtype)
        for s in st.noise_slots:
            j = j + p[s]
        return j

    def _smooth_correct(A, Q, H, j_eff, z, Rw):
        """S T⁻¹ z for S = K_ss + j_eff·I, T = S + diag(Rw): smoothing at
        total noise j_eff + Rw plus the per-point jitter correction."""
        m_s, _ = mss.ss_smooth(A, Q, H, z, j_eff + Rw)
        m_x = mss.measure_row(H, m_s)
        return m_x + j_eff * (z - m_x) / (j_eff + Rw)

    def _fit(u, d):
        theta = tr.forward(u)
        p = params_from(theta)
        A, Q, H = _steps(p, d)
        j_eff = _jeff(p)
        ll = lambda f: jnp.sum(loglik_fn(d["ys"], f, d["aux"]))
        grad_ll = jax.grad(ll)

        def newton(f, _):
            g = grad_ll(f)
            W = jnp.maximum(-_diag_hess(loglik_fn, d["ys"], f, d["aux"]), 1e-9)
            Rw = 1.0 / W
            z = f + g * Rw
            return _smooth_correct(A, Q, H, j_eff, z, Rw), None

        f0 = jnp.zeros((n,), dtype)
        f_hat, _ = jax.lax.scan(newton, f0, None, length=num_iters)
        W = jnp.maximum(-_diag_hess(loglik_fn, d["ys"], f_hat, d["aux"]), 1e-9)
        quad, _ = mss.ss_loglik_parts(A, Q, H, f_hat, j_eff)
        _, logdet_T = mss.ss_loglik_parts(A, Q, H, f_hat, j_eff + 1.0 / W)
        log_B = logdet_T + jnp.sum(jnp.log(W))
        log_marginal = -0.5 * quad + ll(f_hat) - 0.5 * log_B
        return theta, (A, Q, H), j_eff, f_hat, W, log_marginal

    def logdensity_data(u: jnp.ndarray, d) -> jnp.ndarray:
        _, _, _, _, _, lm = _fit(u, d)
        return lm + jnp.sum(tr.logprior_u(u))

    def logdensity(u: jnp.ndarray) -> jnp.ndarray:
        return logdensity_data(u, data)

    def report(key: jax.Array, u: jnp.ndarray, d=None):
        d = data if d is None else d
        theta, AQH, j_eff, f_hat, W, _ = _fit(u, d)
        A, Q, H = AQH
        Rw = 1.0 / W
        # Matheron draw from N(f̂, (K_eff⁻¹ + W)⁻¹): f̂ + f* − S T⁻¹(f* + ε*)
        k1, k2, k3 = jax.random.split(key, 3)
        x_star = mss.ss_prior_sample(k1, A, Q)
        f_star = (mss.measure_row(H, x_star)
                  + jnp.sqrt(j_eff) * jax.random.normal(k2, (n,), dtype))
        eps = jnp.sqrt(Rw) * jax.random.normal(k3, (n,), dtype)
        r = f_star + eps
        f = f_hat + f_star - _smooth_correct(A, Q, H, j_eff, r, Rw)
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + mss.ss_loglik(A, Q, H, f, j_eff)
            + jnp.sum(loglik_fn(d["ys"], f, d["aux"]))
        )
        return theta, f[inv_idx], lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(key, (nh,), dtype, -2.0, 2.0)

    def position_from(theta, f):
        return tr.inverse(jnp.asarray(theta, dtype))

    return GPModel(nh, nh, logdensity, report, tr.forward, initial_position,
                   True, position_from, logdensity_data=logdensity_data,
                   data=data)


def build_laplace_marginal(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    likelihood,
    aux: Optional[jnp.ndarray] = None,
    jitter: float = mvn.DEFAULT_JITTER,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
    num_iters: int = 15,
) -> GPModel:
    """Approximate-marginal model for non-Gaussian likelihoods: NUTS/VI run
    over theta only, with the latents integrated out by Laplace — the
    analogue of build_gaussian_marginal (SURVEY.md §2.11 Laplace row)."""
    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    eye = jnp.eye(n, dtype=dtype)
    loglik_fn = make_loglik(likelihood)
    y = jnp.asarray(y, dtype)
    aux_arr = None if aux is None else jnp.asarray(aux, dtype)
    # hot path: θ-independent gram structure + jitter·I precomputed once
    dynamic = tuple(sorted({s for g in slot_groups for s in g}))
    gram_bound = ck.bind(X, dynamic, diag=jitter)

    def _fit(u):
        theta = tr.forward(u)
        K = gram_bound(params_from(theta))
        return theta, K, laplace_approx(K, y, loglik_fn, aux_arr, num_iters)

    def logdensity(u: jnp.ndarray) -> jnp.ndarray:
        _, _, fit = _fit(u)
        return fit.log_marginal + jnp.sum(tr.logprior_u(u))

    def report(key: jax.Array, u: jnp.ndarray):
        theta, K, fit = _fit(u)
        # Gaussian posterior around the mode: cov = (K^{-1} + W)^{-1}
        sw = jnp.sqrt(fit.W)
        B = eye + sw[:, None] * K * sw[None, :]
        L = linalg.cholesky(B)
        V = linalg.solve_triangular(L, sw[:, None] * K, lower=True)
        cov = K - V.T @ V
        Lc = linalg.cholesky(cov + 1e-8 * jnp.trace(cov) / n * eye)
        f = fit.f_mode + Lc @ jax.random.normal(key, (n,), dtype)
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + mvn.mvn_logpdf(K, f)
            + jnp.sum(loglik_fn(y, f, aux_arr))
        )
        return theta, f, lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(key, (nh,), dtype, -2.0, 2.0)

    def position_from(theta, f):
        return tr.inverse(jnp.asarray(theta, dtype))

    return GPModel(nh, nh, logdensity, report, tr.forward, initial_position, True,
                   position_from)
