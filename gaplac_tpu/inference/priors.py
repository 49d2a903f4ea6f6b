"""Hyperparameter prior registry.

The reference hardcodes ``ℓ ~ Uniform(0, 20)`` (/root/reference/CLI/src/mcmc.jl:32).
This module generalizes the CLI's ``--prior`` string to a small family of
positive-support priors, each packaged with the unconstraining bijector NUTS
needs (SURVEY.md §2.12 inference rows; the sampler always runs in
unconstrained space u, with x = forward(u)):

    Uniform(lo, hi)               — logit transform on (lo, hi)   [reference]
    LogNormal(mu, sigma)          — log transform, x = exp(u)
    Gamma(alpha, beta)            — shape/RATE, log transform
    TruncatedNormal(mu, sigma, lo, hi) — logit transform on (lo, hi)

Each prior exposes:
    forward(u)    — unconstrained -> constrained hyperparameter value
    inverse(x)    — constrained -> unconstrained (warm starts / extension)
    logprior_u(u) — log p(x(u)) + log|dx/du|, the term NUTS adds to the
                    collapsed likelihood (normalizing constants included)
    logprior_x(x) — log p(x) in constrained space, what the reference-schema
                    ``lp`` chain column records

All are NamedTuples of floats: hashable, jit-static, closure-friendly.
"""

from __future__ import annotations

import math
import re
from typing import NamedTuple, Sequence, Union

import jax.numpy as jnp

from gaplac_tpu.inference.transforms import Interval

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class UniformPrior(NamedTuple):
    """x ~ Uniform(lo, hi); the reference's (only) prior."""

    lo: float
    hi: float

    @property
    def _tr(self) -> Interval:
        return Interval(self.lo, self.hi)

    def forward(self, u):
        return self._tr.forward(u)

    def inverse(self, x):
        return self._tr.inverse(x)

    def logprior_u(self, u):
        # log(1/(hi-lo)) + log|dx/du|; the constant is harmless under NUTS
        return -math.log(self.hi - self.lo) + self._tr.log_jac(u)

    def logprior_x(self, x):
        return self._tr.constrained_logprior(x)


class LogNormalPrior(NamedTuple):
    """x ~ LogNormal(mu, sigma): log x ~ Normal(mu, sigma); x = exp(u)."""

    mu: float
    sigma: float

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def logprior_u(self, u):
        # density of u = log x is exactly Normal(mu, sigma)
        z = (u - self.mu) / self.sigma
        return -0.5 * z * z - math.log(self.sigma) - _LOG_SQRT_2PI

    def logprior_x(self, x):
        lx = jnp.log(x)
        z = (lx - self.mu) / self.sigma
        return jnp.where(
            x > 0,
            -0.5 * z * z - lx - math.log(self.sigma) - _LOG_SQRT_2PI,
            -jnp.inf,
        )


class GammaPrior(NamedTuple):
    """x ~ Gamma(alpha, beta) with RATE beta (mean alpha/beta); x = exp(u)."""

    alpha: float
    beta: float

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def logprior_u(self, u):
        # log p(x) + log x  (jacobian of exp) = alpha*u - beta*e^u + const
        const = self.alpha * math.log(self.beta) - math.lgamma(self.alpha)
        return const + self.alpha * u - self.beta * jnp.exp(u)

    def logprior_x(self, x):
        const = self.alpha * math.log(self.beta) - math.lgamma(self.alpha)
        return jnp.where(
            x > 0,
            const + (self.alpha - 1.0) * jnp.log(x) - self.beta * x,
            -jnp.inf,
        )


class TruncatedNormalPrior(NamedTuple):
    """x ~ Normal(mu, sigma) truncated to (lo, hi); logit transform."""

    mu: float
    sigma: float
    lo: float
    hi: float

    @property
    def _tr(self) -> Interval:
        return Interval(self.lo, self.hi)

    @property
    def _log_z(self) -> float:
        a = (self.lo - self.mu) / self.sigma
        b = (self.hi - self.mu) / self.sigma
        phi = lambda z: 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
        return math.log(phi(b) - phi(a))

    def forward(self, u):
        return self._tr.forward(u)

    def inverse(self, x):
        return self._tr.inverse(x)

    def logprior_u(self, u):
        x = self._tr.forward(u)
        z = (x - self.mu) / self.sigma
        return (
            -0.5 * z * z - math.log(self.sigma) - _LOG_SQRT_2PI - self._log_z
            + self._tr.log_jac(u)
        )

    def logprior_x(self, x):
        z = (x - self.mu) / self.sigma
        dens = -0.5 * z * z - math.log(self.sigma) - _LOG_SQRT_2PI - self._log_z
        return jnp.where((x >= self.lo) & (x <= self.hi), dens, -jnp.inf)


Prior = Union[UniformPrior, LogNormalPrior, GammaPrior, TruncatedNormalPrior]

_REGISTRY = {
    "uniform": (UniformPrior, 2),
    "lognormal": (LogNormalPrior, 2),
    "gamma": (GammaPrior, 2),
    "truncatednormal": (TruncatedNormalPrior, 4),
    "truncnormal": (TruncatedNormalPrior, 4),
}

_CALL_RE = re.compile(r"\s*([A-Za-z]+)\s*\(([^)]*)\)\s*$")


def parse_prior(s: str) -> Prior:
    """Parse a ``--prior`` string like ``Uniform(0,20)`` or
    ``LogNormal(0.5, 1.0)`` into a Prior (recursive-descent-free: one call
    with float args; the DSL never evals, SURVEY.md §2.3.7)."""
    m = _CALL_RE.match(s)
    if not m:
        raise ValueError(
            f"Unsupported prior {s!r} (expected Name(args...); supported: "
            "Uniform(lo,hi), LogNormal(mu,sigma), Gamma(alpha,rate), "
            "TruncatedNormal(mu,sigma,lo,hi))"
        )
    name = m.group(1).lower()
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown prior {m.group(1)!r} (supported: Uniform, LogNormal, "
            "Gamma, TruncatedNormal)"
        )
    cls, nargs = _REGISTRY[name]
    try:
        args = [float(a) for a in m.group(2).split(",")]
    except ValueError:
        raise ValueError(f"Prior arguments must be numeric in {s!r}")
    if len(args) != nargs:
        raise ValueError(f"{m.group(1)} takes {nargs} arguments, got {len(args)}")
    prior = cls(*args)
    if isinstance(prior, (UniformPrior, TruncatedNormalPrior)) and not (
        prior.lo < prior.hi
    ):
        raise ValueError(f"Prior bounds must satisfy lo < hi in {s!r}")
    if isinstance(prior, (LogNormalPrior,)) and prior.sigma <= 0:
        raise ValueError(f"sigma must be positive in {s!r}")
    if isinstance(prior, TruncatedNormalPrior) and prior.sigma <= 0:
        raise ValueError(f"sigma must be positive in {s!r}")
    if isinstance(prior, GammaPrior) and (prior.alpha <= 0 or prior.beta <= 0):
        raise ValueError(f"Gamma parameters must be positive in {s!r}")
    return prior


def as_prior(p: Union[Prior, Sequence[float]]) -> Prior:
    """Accept either a Prior object or the legacy (lo, hi) Uniform tuple used
    throughout model builders (DEFAULT_PRIOR_BOUNDS compatibility)."""
    if isinstance(p, (UniformPrior, LogNormalPrior, GammaPrior, TruncatedNormalPrior)):
        return p
    lo, hi = p
    return UniformPrior(float(lo), float(hi))
