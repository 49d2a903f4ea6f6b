"""Unconstraining bijectors for sampler geometry.

The reference samples ℓ ~ Uniform(0,20) directly in Turing, which applies its
own logit transform under the hood (Bijectors.jl).  We do the same explicitly:
NUTS runs in unconstrained space u, the model maps u -> constrained value and
adds the prior log-density plus the log-Jacobian.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax.nn import sigmoid, softplus


class Interval(NamedTuple):
    """x in (lo, hi) <-> u in R via x = lo + (hi-lo) sigmoid(u)."""

    lo: float
    hi: float

    def forward(self, u):
        return self.lo + (self.hi - self.lo) * sigmoid(u)

    def inverse(self, x):
        # clamp away from the boundaries: f32 chains can record draws exactly
        # at lo/hi (sigmoid saturation), which would invert to +-inf and
        # poison warm starts (chain extension)
        p = (x - self.lo) / (self.hi - self.lo)
        p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
        return jnp.log(p) - jnp.log1p(-p)

    def log_jac(self, u):
        # d x / d u = (hi-lo) * sigmoid(u) * (1 - sigmoid(u))
        return math.log(self.hi - self.lo) - softplus(u) - softplus(-u)

    def uniform_logprior(self, u):
        """log p(u) when x ~ Uniform(lo, hi): log(1/(hi-lo)) + log|dx/du|."""
        return -softplus(u) - softplus(-u)

    def constrained_logprior(self, x):
        """log Uniform(lo,hi) density at the constrained value (what the
        reference's lp column contains).  Closed interval: f32 chains record
        draws exactly at lo/hi under sigmoid saturation (see inverse()), and
        those must not poison the lp column with -inf."""
        return jnp.where(
            (x >= self.lo) & (x <= self.hi), -math.log(self.hi - self.lo), -jnp.inf
        )


class Log(NamedTuple):
    """x > 0 <-> u in R via x = exp(u)."""

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def log_jac(self, u):
        return u
