"""HMC machinery: leapfrog, dual-averaging step size, Welford mass adaptation.

Replaces the reference's AdvancedHMC internals (Turing NUTS(0.65),
CLI/src/mcmc.jl:41).  Everything is fixed-shape and jit-safe; the warmup
schedule (Stan-style expanding windows) is computed statically in Python and
fed to ``lax.scan`` as per-step flag arrays.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LeapfrogState(NamedTuple):
    q: jnp.ndarray       # position
    p: jnp.ndarray       # momentum
    logp: jnp.ndarray    # logdensity(q)
    grad: jnp.ndarray    # d logdensity / d q


def leapfrog_step(
    value_and_grad: Callable, state: LeapfrogState, eps, inv_mass: jnp.ndarray
) -> LeapfrogState:
    """One leapfrog integration step with diagonal mass matrix."""
    p_half = state.p + 0.5 * eps * state.grad
    q_new = state.q + eps * inv_mass * p_half
    logp_new, grad_new = value_and_grad(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return LeapfrogState(q_new, p_new, logp_new, grad_new)


def kinetic_energy(p: jnp.ndarray, inv_mass: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.sum(p * p * inv_mass)


def sample_momentum(key: jax.Array, inv_mass: jnp.ndarray) -> jnp.ndarray:
    """p ~ N(0, M) with M = diag(1/inv_mass)."""
    z = jax.random.normal(key, inv_mass.shape, inv_mass.dtype)
    return z * jax.lax.rsqrt(inv_mass)


# ---------------------------------------------------------------------------
# Dual averaging (Hoffman & Gelman 2014, Algorithm 5; Stan defaults)
# ---------------------------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def da_init(eps0: jnp.ndarray) -> DualAveragingState:
    log_eps = jnp.log(eps0)
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_avg=jnp.zeros_like(log_eps),
        h_avg=jnp.zeros_like(log_eps),
        mu=jnp.log(10.0) + log_eps,
        count=jnp.zeros_like(log_eps),
    )


def da_update(
    state: DualAveragingState,
    accept_prob: jnp.ndarray,
    target: float = 0.65,  # ref: NUTS(0.65), mcmc.jl:41
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    count = state.count + 1.0
    eta_h = 1.0 / (count + t0)
    h_avg = (1.0 - eta_h) * state.h_avg + eta_h * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(count) / gamma * h_avg
    eta_x = count ** (-kappa)
    log_eps_avg = eta_x * log_eps + (1.0 - eta_x) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_avg, state.mu, count)


# ---------------------------------------------------------------------------
# Welford running variance (diagonal mass estimation)
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    z = jnp.zeros((dim,), dtype)
    return WelfordState(z, z, jnp.zeros((), dtype))


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState) -> jnp.ndarray:
    """Regularized sample variance (Stan's shrinkage toward unit)."""
    n = jnp.maximum(state.count, 1.0)
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    return jnp.where(
        state.count > 1.0,
        (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0)),
        jnp.ones_like(var),
    )


# ---------------------------------------------------------------------------
# Reasonable initial step size (Hoffman & Gelman 2014, Algorithm 4)
# ---------------------------------------------------------------------------


def find_reasonable_step_size(
    value_and_grad: Callable,
    key: jax.Array,
    q: jnp.ndarray,
    inv_mass: jnp.ndarray,
    init_eps: float = 1.0,
    max_iters: int = 60,
) -> jnp.ndarray:
    logp0, grad0 = value_and_grad(q)
    p0 = sample_momentum(key, inv_mass)
    h0 = -logp0 + kinetic_energy(p0, inv_mass)

    def joint_delta(eps):
        st = leapfrog_step(value_and_grad, LeapfrogState(q, p0, logp0, grad0), eps, inv_mass)
        h = -st.logp + kinetic_energy(st.p, inv_mass)
        return h0 - h  # log accept ratio

    eps0 = jnp.asarray(init_eps, q.dtype)
    d0 = joint_delta(eps0)
    d0 = jnp.where(jnp.isnan(d0), -jnp.inf, d0)
    direction = jnp.where(d0 > math.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        d = joint_delta(eps)
        d = jnp.where(jnp.isnan(d), -jnp.inf, d)
        keep = jnp.where(direction > 0, d > math.log(0.5), d < math.log(0.5))
        return jnp.logical_and(keep, it < max_iters)

    def body(carry):
        eps, it = carry
        return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.zeros((), jnp.int32)))
    return eps


# ---------------------------------------------------------------------------
# Stan-style warmup schedule (computed statically)
# ---------------------------------------------------------------------------


class WarmupSchedule(NamedTuple):
    """Per-warmup-step flags: update the mass accumulator; end-of-window
    (swap in new mass + re-init step size)."""

    in_slow_window: np.ndarray   # bool (num_warmup,)
    window_end: np.ndarray       # bool (num_warmup,)


def stan_warmup_schedule(
    num_warmup: int, init_buffer: int = 75, term_buffer: int = 50, base_window: int = 25
) -> WarmupSchedule:
    in_slow = np.zeros(num_warmup, bool)
    w_end = np.zeros(num_warmup, bool)
    if num_warmup < 20:
        return WarmupSchedule(in_slow, w_end)
    if num_warmup < init_buffer + term_buffer + base_window:
        # scale buffers down proportionally (Stan's behavior)
        scale = num_warmup / (init_buffer + term_buffer + base_window)
        init_buffer = int(init_buffer * scale)
        term_buffer = int(term_buffer * scale)
        base_window = num_warmup - init_buffer - term_buffer
    pos = init_buffer
    window = base_window
    last_slow = num_warmup - term_buffer
    while pos < last_slow:
        end = pos + window
        if end + 2 * window > last_slow:  # absorb the remainder into this window
            end = last_slow
        in_slow[pos:end] = True
        w_end[end - 1] = True
        pos = end
        window *= 2
    return WarmupSchedule(in_slow, w_end)
