"""SMC sampler — tempered sequential Monte Carlo for marginal likelihoods.

Replaces the reference's harmonic-mean estimator (select.jl:16-20), which is
notoriously unstable (SURVEY.md §2.3.3); BASELINE.json's north star names SMC
as the model-comparison engine.

Algorithm (likelihood tempering):
  particles theta_i ~ prior;  beta: 0 -> 1 adaptively (bisection on relative
  ESS target), log-weights accumulate (beta' - beta) * loglik(theta_i);
  systematic resampling + random-walk Metropolis rejuvenation at each stage.
  log Z = sum_stages logmeanexp(incremental weights) — an unbiased-ish,
  stable marginal-likelihood estimate.

Everything is fixed-shape under jit: a ``lax.while_loop`` over stages (max
``max_stages``), vectorized particles.  Particle weights normalize with
``jnp.logsumexp``; under a sharded particle axis the same code runs SPMD with
psum-backed reductions (jax.sharding inserts them).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


class SMCResult(NamedTuple):
    log_evidence: jnp.ndarray     # log Z (natural log)
    particles: jnp.ndarray        # (n_particles, dim) final posterior particles
    n_stages: jnp.ndarray
    final_beta: jnp.ndarray


def _systematic_resample(key, log_w, n):
    w = jnp.exp(log_w - logsumexp(log_w))
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u, side="right").clip(0, n - 1)


def run_smc(
    key: jax.Array,
    sample_prior: Callable[[jax.Array, int], jnp.ndarray],
    logprior: Callable[[jnp.ndarray], jnp.ndarray],
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    n_particles: int = 512,
    target_rel_ess: float = 0.5,
    rejuvenation_steps: int = 5,
    rw_scale: float = 1.0,  # multiplier on the adaptive 2.38/sqrt(d) * sd scale
    max_stages: int = 50,
) -> SMCResult:
    """``sample_prior(key, n) -> (n, dim)``; logprior/loglik act on one
    particle's unconstrained vector and return scalars."""

    vlik = jax.vmap(loglik)
    vprior = jax.vmap(logprior)

    def next_beta(beta, lls):
        """Largest beta' in (beta, 1] with relative ESS >= target (bisection)."""
        def ess_at(b):
            lw = (b - beta) * lls
            lw = lw - logsumexp(lw)
            return jnp.exp(-logsumexp(2.0 * lw)) / n_particles

        def cond(carry):
            lo, hi, it = carry
            return (it < 30) & (hi - lo > 1e-6)

        def body(carry):
            lo, hi, it = carry
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target_rel_ess
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

        full = ess_at(1.0) >= target_rel_ess
        lo, hi, _ = jax.lax.while_loop(cond, body, (beta, 1.0, 0))
        return jnp.where(full, 1.0, lo)

    class Carry(NamedTuple):
        key: jax.Array
        particles: jnp.ndarray
        lls: jnp.ndarray
        beta: jnp.ndarray
        log_z: jnp.ndarray
        stage: jnp.ndarray

    k_init, k_loop = jax.random.split(key)
    parts0 = sample_prior(k_init, n_particles)
    dtype = parts0.dtype

    def cond(c: Carry):
        return (c.beta < 1.0) & (c.stage < max_stages)

    def body(c: Carry):
        key, k_res, k_rw = jax.random.split(c.key, 3)
        beta_new = next_beta(c.beta, c.lls)
        inc = (beta_new - c.beta) * c.lls
        log_z = c.log_z + logsumexp(inc) - jnp.log(n_particles * 1.0)

        # resample
        idx = _systematic_resample(k_res, inc, n_particles)
        parts = c.particles[idx]
        lls = c.lls[idx]

        # random-walk Metropolis rejuvenation at temperature beta_new;
        # proposal scale tracks the per-dimension particle spread (2.38/sqrt(d)
        # of the current population sd — standard adaptive-RW tuning)
        d_dim = parts.shape[1]
        prop_sd = rw_scale * (2.38 / jnp.sqrt(1.0 * d_dim)) * (
            jnp.std(parts, axis=0) + 1e-3
        )

        def rw_step(carry, k):
            parts, lls, lps = carry
            k1, k2 = jax.random.split(k)
            prop = parts + prop_sd * jax.random.normal(k1, parts.shape, dtype)
            lls_p = vlik(prop)
            lps_p = vprior(prop)
            log_acc = (lps_p + beta_new * lls_p) - (lps + beta_new * lls)
            accept = jnp.log(jax.random.uniform(k2, (n_particles,), dtype)) < log_acc
            parts = jnp.where(accept[:, None], prop, parts)
            lls = jnp.where(accept, lls_p, lls)
            lps = jnp.where(accept, lps_p, lps)
            return (parts, lls, lps), jnp.mean(accept)

        lps = vprior(parts)
        (parts, lls, lps), _ = jax.lax.scan(
            rw_step, (parts, lls, lps), jax.random.split(k_rw, rejuvenation_steps)
        )
        return Carry(key, parts, lls, beta_new, log_z, c.stage + 1)

    init = Carry(
        k_loop,
        parts0,
        vlik(parts0),
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return SMCResult(final.log_z, final.particles, final.stage, final.beta)


def smc_log_evidence_gp(
    key: jax.Array,
    model,
    n_particles: int = 512,
    **kwargs,
) -> SMCResult:
    """Marginal likelihood of a GPModel: particles over the unconstrained
    hyperparameters; loglik = collapsed data likelihood; prior = the model's
    Uniform-transform prior.  Only valid for marginalized (Gaussian) models
    where logdensity = loglik + logprior decomposes."""
    if not model.marginalized:
        raise ValueError("SMC evidence requires the marginalized (Gaussian) model")

    def logprior(u):
        # uniform prior through the logit transform: -softplus(u)-softplus(-u) per dim
        return jnp.sum(-jax.nn.softplus(u) - jax.nn.softplus(-u))

    def loglik(u):
        return model.logdensity(u) - logprior(u)

    def sample_prior(k, n):
        # u = logit of Uniform(0,1) => logistic distribution
        p = jax.random.uniform(k, (n, model.dim), minval=1e-6, maxval=1 - 1e-6)
        return jnp.log(p) - jnp.log1p(-p)

    return run_smc(key, sample_prior, logprior, loglik, n_particles=n_particles, **kwargs)
