"""ADVI — mean-field Gaussian variational inference fast path.

The reference imports ``Turing.Variational`` but never uses it
(src/GaPLAC.jl:18; SURVEY.md §2.12 "VI fast path" row).  Here: reparameterized
mean-field ELBO maximization with optax Adam over the model's unconstrained
space, one jitted ``lax.scan``.  Produces a fitted q(v) = N(mu, diag(exp(2
log_sigma))) from which pseudodraws feed the same chain-output schema as NUTS.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gaplac_tpu.inference.model import GPModel


class ADVIResult(NamedTuple):
    mu: jnp.ndarray
    log_sigma: jnp.ndarray
    elbo_trace: jnp.ndarray   # (num_steps,)


def run_advi(
    key: jax.Array,
    model: GPModel,
    num_steps: int = 1000,
    num_mc: int = 8,
    learning_rate: float = 0.05,
) -> ADVIResult:
    """Maximize ELBO(mu, log_sigma) = E_q[logp(v)] + H[q]."""
    dim = model.dim
    k_init, k_run = jax.random.split(key)
    mu0 = model.initial_position(k_init)
    dtype = mu0.dtype
    ls0 = jnp.full((dim,), -1.0, dtype)

    opt = optax.adam(learning_rate)
    logdensity = model.logdensity

    def elbo(params, key):
        mu, ls = params
        eps = jax.random.normal(key, (num_mc, dim), dtype)
        vs = mu + jnp.exp(ls) * eps
        logps = jax.vmap(logdensity)(vs)
        entropy = jnp.sum(ls) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return jnp.mean(logps) + entropy

    @jax.jit
    def fit(key, mu0, ls0):
        params0 = (mu0, ls0)
        state0 = opt.init(params0)

        def step(carry, k):
            params, state = carry
            val, grads = jax.value_and_grad(lambda p: -elbo(p, k))(params)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            return (params, state), -val

        keys = jax.random.split(key, num_steps)
        (params, _), trace = jax.lax.scan(step, (params0, state0), keys)
        return params, trace

    (mu, ls), trace = fit(k_run, mu0, ls0)
    return ADVIResult(mu, ls, trace)


def sample_posterior(
    key: jax.Array, result: ADVIResult, num_samples: int
) -> jnp.ndarray:
    """(num_samples, dim) pseudodraws from the fitted q."""
    eps = jax.random.normal(key, (num_samples, result.mu.shape[0]), result.mu.dtype)
    return result.mu + jnp.exp(result.log_sigma) * eps
