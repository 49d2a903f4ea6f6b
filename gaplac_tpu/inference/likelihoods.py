"""Data likelihoods — per-point log densities for the latent-GP path.

Reference parity: the live registry has only a bare Gaussian marker
(src/liklihoods.jl:1-3) with the density hardcoded in the Turing model as
``Y .~ Normal.(fx, 1)`` (CLI/src/mcmc.jl:36).  The legacy envelope adds
``Gaussian(σ²)`` / ``Binomial(Reads)`` (test/oldtests.jl:11,25) and
BASELINE.json's north star adds Bernoulli / Poisson / Student-t via whitened
latent-GP NUTS.  All are implemented here as pure functions
``loglik(y, f, aux) -> per-point log density`` usable under jit/grad/vmap.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from gaplac_tpu.dsl.parser import LikelihoodSpec

_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_loglik(y, f, sigma2):
    return -0.5 * ((y - f) ** 2 / sigma2 + jnp.log(sigma2) + _LOG_2PI)


def bernoulli_logit_loglik(y, f, _=None):
    """y in {0,1}; f is the logit. log p = y f - log(1+e^f)."""
    return y * f - jnp.logaddexp(0.0, f)


def poisson_log_loglik(y, f, _=None):
    """y a count; f the log-rate. log p = y f - e^f - log(y!)."""
    return y * f - jnp.exp(f) - gammaln(y + 1.0)


def studentt_loglik(y, f, nu, sigma=1.0):
    """Non-standardized Student-t location f, scale sigma, dof nu."""
    z = (y - f) / sigma
    return (
        gammaln((nu + 1.0) / 2.0)
        - gammaln(nu / 2.0)
        - 0.5 * jnp.log(nu * math.pi)
        - jnp.log(sigma)
        - (nu + 1.0) / 2.0 * jnp.log1p(z * z / nu)
    )


def binomial_logit_loglik(y, f, n):
    """y successes of n trials; f the logit (legacy Binomial(Reads))."""
    return (
        gammaln(n + 1.0)
        - gammaln(y + 1.0)
        - gammaln(n - y + 1.0)
        + y * f
        - n * jnp.logaddexp(0.0, f)
    )


def make_loglik(spec: LikelihoodSpec) -> Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]:
    """Build ``(y, f, aux) -> per-point loglik`` for a parsed likelihood.

    ``aux`` carries the column-referenced parameter (e.g. Binomial trial
    counts read from the data table), else ignored.
    """
    name = spec.name
    if name == "gaussian":
        sigma2 = spec.args[0] if spec.args else 1.0  # ref default: Normal(fx, 1), mcmc.jl:36
        return lambda y, f, aux=None: gaussian_loglik(y, f, sigma2)
    if name == "bernoulli":
        return lambda y, f, aux=None: bernoulli_logit_loglik(y, f)
    if name == "poisson":
        return lambda y, f, aux=None: poisson_log_loglik(y, f)
    if name == "studentt":
        nu = spec.args[0] if spec.args else 4.0
        sigma = spec.args[1] if len(spec.args) > 1 else 1.0
        return lambda y, f, aux=None: studentt_loglik(y, f, nu, sigma)
    if name == "binomial":
        return lambda y, f, aux=None: binomial_logit_loglik(y, f, aux)
    raise ValueError(f"Unknown likelihood {name!r}")


def gaussian_obs_sigma2(spec: LikelihoodSpec) -> Optional[float]:
    """Observation variance when the likelihood is (possibly parameterized)
    Gaussian — enables the analytically-marginalized sampling path.
    Returns None for non-Gaussian likelihoods."""
    if spec.name != "gaussian":
        return None
    return float(spec.args[0]) if spec.args else 1.0
