"""ChEES-HMC — cross-chain adaptive Hamiltonian Monte Carlo.

The TPU-native alternative to NUTS (PAPERS.md: Hoffman, Radul & Sountsov,
"An Adaptive-MCMC Scheme for Setting Trajectory Lengths in Hamiltonian Monte
Carlo", AISTATS 2021).  NUTS's recursive tree building is control-flow heavy:
every leapfrog is a separate loop iteration whose length differs per chain,
so vmapped chains pad to the slowest tree and each iteration pays the
backend's dispatch floor (~150 us/step through this image's axon tunnel —
measured).  ChEES-HMC instead runs ALL chains in lockstep for the SAME
jittered trajectory length — one batched leapfrog scan per transition — and
adapts:

  - step size  eps  by dual averaging on the cross-chain mean accept prob;
  - trajectory length T by stochastic gradient ascent on the ChEES
    criterion  E[ (||q' - E q'||^2 - ||q - E q||^2)^2 ] / 4,  whose
    per-chain gradient w.r.t. T is
       (||q' - m||^2 - ||q - m||^2) * <q' - m, v'> * alpha
    (v' = final velocity, alpha = accept prob), averaged over chains.

Cross-chain means/averages are plain jnp.mean over the chain axis — under a
sharded chain axis XLA lowers them to psum over ICI (SURVEY.md §2.4 "pooled
dual-averaging stats ... via collectives").

All chains move with the same step count per transition -> the whole sampler
is two nested ``lax.scan``s with static bounds, no data-dependent control
flow: exactly what the hardware wants.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.inference.hmc import (
    DualAveragingState,
    LeapfrogState,
    da_init,
    da_update,
    leapfrog_step,
    welford_init,
    welford_update,
    welford_variance,
)


class CheesResult(NamedTuple):
    positions: jnp.ndarray     # (chains, num_samples, dim)
    logps: jnp.ndarray         # (chains, num_samples)
    accept_prob: jnp.ndarray   # (chains, num_samples) per-chain accept prob
    step_size: jnp.ndarray
    traj_length: jnp.ndarray
    inv_mass: jnp.ndarray


def _welford_update_batch(state, X):
    """Fold a (chains, dim) batch into a Welford accumulator (Chan's
    parallel combination of the batch's own mean/M2 with the running state)."""
    c = X.shape[0]
    bmean = jnp.mean(X, axis=0)
    bm2 = jnp.sum((X - bmean) ** 2, axis=0)
    n0 = state.count
    n = n0 + c
    delta = bmean - state.mean
    mean = state.mean + delta * (c / n)
    m2 = state.m2 + bm2 + delta * delta * (n0 * c / n)
    return state._replace(mean=mean, m2=m2, count=n)


def _halton(i: jnp.ndarray, base: int = 2) -> jnp.ndarray:
    """Halton low-discrepancy sequence element (float in (0,1)); matches the
    paper's jitter choice, computed branch-free for traced i."""
    # 16 bits is plenty for jitter purposes
    f = jnp.zeros((), jnp.float32)
    r = jnp.zeros((), jnp.float32)
    x = i.astype(jnp.uint32) + 1
    denom = jnp.float32(base)
    for _ in range(16):
        digit = (x % base).astype(jnp.float32)
        r = r + digit / denom
        x = x // base
        denom = denom * base
    return r


def run_chees(
    key: jax.Array,
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    initial_positions: jnp.ndarray,   # (chains, dim)
    num_samples: int,
    num_warmup: int = 500,
    max_leapfrogs: int = 1000,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    init_traj_length: float = 1.0,
    adam_lr: float = 0.025,
    init_inv_mass=None,
    progress: bool = False,
) -> CheesResult:
    """Batched-chain ChEES-HMC.  ``initial_positions`` carries the chain
    axis; all per-transition math is vmapped over it and every reduction
    over chains is a collective under sharding."""
    n_chains, dim = initial_positions.shape
    dtype = initial_positions.dtype
    vag = jax.value_and_grad(logdensity)

    def leapfrogs(q, p, logp, grad, eps, inv_mass, n_steps):
        """n_steps batched leapfrog steps, ALL chains in lockstep.  n_steps
        is a (shared) scalar, so this is one while_loop that runs exactly
        n_steps iterations — no per-chain control-flow divergence."""

        def cond(carry):
            return carry[4] < n_steps

        def body(carry):
            q, p, logp, grad, t = carry
            # hmc.leapfrog_step broadcasts over the (chains, dim) batch with
            # the (dim,) diagonal mass — one shared integrator implementation
            st = leapfrog_step(
                jax.vmap(vag), LeapfrogState(q, p, logp, grad), eps, inv_mass
            )
            return (st.q, st.p, st.logp, st.grad, t + 1)

        q, p, logp, grad, _ = jax.lax.while_loop(
            cond, body, (q, p, logp, grad, jnp.zeros((), jnp.int32))
        )
        return q, p, logp, grad

    class Carry(NamedTuple):
        key: jax.Array
        q: jnp.ndarray
        logp: jnp.ndarray
        grad: jnp.ndarray
        da: DualAveragingState
        log_t: jnp.ndarray       # log trajectory length
        adam_m: jnp.ndarray
        adam_v: jnp.ndarray
        adam_i: jnp.ndarray
        wf: object
        inv_mass: jnp.ndarray
        iter: jnp.ndarray

    def transition(c: Carry, adapt: bool):
        key, k_mom, k_acc = jax.random.split(c.key, 3)
        eps = jnp.exp(c.da.log_eps)
        traj = jnp.exp(c.log_t)
        # halton-jittered trajectory length shared by all chains
        u = _halton(c.iter)
        traj_j = traj * u * 2.0
        n_steps = jnp.clip(
            jnp.ceil(traj_j / eps).astype(jnp.int32), 1, max_leapfrogs
        )

        p0 = jax.random.normal(k_mom, (n_chains, dim), dtype) * jax.lax.rsqrt(c.inv_mass)
        ke0 = 0.5 * jnp.sum(p0 * p0 * c.inv_mass, axis=1)
        q1, p1, logp1, grad1 = leapfrogs(
            c.q, p0, c.logp, c.grad, eps, c.inv_mass, n_steps
        )
        ke1 = 0.5 * jnp.sum(p1 * p1 * c.inv_mass, axis=1)
        log_acc = (logp1 - ke1) - (c.logp - ke0)
        log_acc = jnp.where(jnp.isnan(log_acc), -jnp.inf, log_acc)
        alpha = jnp.minimum(1.0, jnp.exp(log_acc))
        accept = jnp.log(jax.random.uniform(k_acc, (n_chains,), dtype)) < log_acc
        q = jnp.where(accept[:, None], q1, c.q)
        logp = jnp.where(accept, logp1, c.logp)
        grad = jnp.where(accept[:, None], grad1, c.grad)

        mean_alpha = jnp.mean(alpha)           # cross-chain (psum when sharded)
        da = da_update(c.da, mean_alpha, target=target_accept)

        # ChEES gradient for log T (cross-chain means -> collectives)
        m1 = jnp.mean(q1, axis=0)
        m0 = jnp.mean(c.q, axis=0)
        d1 = jnp.sum((q1 - m1) ** 2, axis=1)
        d0 = jnp.sum((c.q - m0) ** 2, axis=1)
        v1 = p1 * c.inv_mass
        proj = jnp.sum((q1 - m1) * v1, axis=1)
        per_chain = (d1 - d0) * proj * alpha
        # d traj_j / d log_t = traj_j; normalize per paper's trick
        grad_log_t = jnp.mean(per_chain) * traj_j
        grad_log_t = grad_log_t / (jnp.sqrt(jnp.mean(per_chain**2) + 1e-12) * traj_j + 1e-12)
        grad_log_t = jnp.where(jnp.isfinite(grad_log_t), grad_log_t, 0.0)

        # Adam ascent on log T (only during warmup)
        i = c.adam_i + 1.0
        am = 0.9 * c.adam_m + 0.1 * grad_log_t
        av = 0.999 * c.adam_v + 0.001 * grad_log_t**2
        mhat = am / (1 - 0.9**i)
        vhat = av / (1 - 0.999**i)
        log_t_new = c.log_t + adam_lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        # keep T within sane bounds relative to eps
        log_t_new = jnp.clip(
            log_t_new,
            jnp.log(eps),
            jnp.log(eps * max_leapfrogs),
        )

        if adapt:
            # accumulate ALL chains' positions (batched Welford fold) — the
            # estimator of the per-dimension posterior variance for the mass
            wf = _welford_update_batch(c.wf, q)
            new = Carry(key, q, logp, grad, da, log_t_new, am, av, i, wf,
                        c.inv_mass, c.iter + 1)
        else:
            new = Carry(key, q, logp, grad, c.da, c.log_t, c.adam_m, c.adam_v,
                        c.adam_i, c.wf, c.inv_mass, c.iter + 1)
        return new, (q, logp, alpha)

    logp0, grad0 = jax.vmap(vag)(initial_positions)
    carry = Carry(
        key=key,
        q=initial_positions,
        logp=logp0,
        grad=grad0,
        da=da_init(jnp.asarray(init_step_size, dtype)),
        log_t=jnp.log(jnp.asarray(init_traj_length, dtype)),
        adam_m=jnp.zeros((), dtype),
        adam_v=jnp.zeros((), dtype),
        adam_i=jnp.zeros((), dtype),
        wf=welford_init(dim, dtype),
        inv_mass=(jnp.ones((dim,), dtype) if init_inv_mass is None
                  else jnp.asarray(init_inv_mass, dtype)),
        iter=jnp.zeros((), jnp.int32),
    )

    # warmup: first half adapts eps/T with unit mass; at the midpoint the
    # mass switches to the cross-chain variance snapshot; the second half
    # re-adapts eps/T under that mass while a batched Welford accumulates
    # (chains x iterations) positions, whose variance becomes the final mass
    from gaplac_tpu.inference.progress import progress_emitter

    warm_progress = progress_emitter("warmup", num_warmup, progress)
    samp_progress = progress_emitter("sampling", num_samples, progress)

    def warm_step(c, i):
        new, out = transition(c, adapt=True)
        warm_progress(i)
        return new, out

    if num_warmup > 0:
        h1 = num_warmup // 2
        carry, _ = jax.lax.scan(warm_step, carry, jnp.arange(h1))
        var = jnp.var(carry.q, axis=0) + 1e-3
        carry = carry._replace(inv_mass=var, wf=welford_init(dim, dtype))
        carry, _ = jax.lax.scan(warm_step, carry, jnp.arange(h1, num_warmup))

        inv_mass_final = welford_variance(carry.wf)
        eps_guess = jnp.exp(carry.da.log_eps_avg)
        # rescale eps for the mass change: the whitened step per dim is
        # eps*sqrt(inv_mass), so keeping it invariant needs
        # eps_new = eps_old * sqrt(old/new) (geometric mean across dims).
        # (An explicit post-switch eps-refinement phase was tried and measured
        # SLOWER end-to-end on TPU: the sampling-phase accept sits above target
        # because the accept distribution near the leapfrog stability threshold
        # is bimodal — pushing eps up triggers divergences, so DA's equilibrium
        # is stability-limited, and the refinement only adds warmup cost.)
        ratio = jnp.exp(0.5 * jnp.mean(jnp.log(carry.inv_mass / inv_mass_final)))
        eps_final = eps_guess * ratio
        carry = carry._replace(da=da_init(eps_final), inv_mass=inv_mass_final)
    else:
        # no warmup: sample with the caller's step size and mass (checkpoint
        # resume path — the DA average exp(0)=1 and the empty Welford mass
        # must not be consulted)
        eps_final = jnp.asarray(init_step_size, dtype)

    def samp_step(c, i):
        new, out = transition(c, adapt=False)
        samp_progress(i)
        return new, out

    carry, (qs, logps, alphas) = jax.lax.scan(
        samp_step, carry, jnp.arange(num_samples)
    )
    # (num_samples, chains, dim) -> (chains, num_samples, dim)
    return CheesResult(
        jnp.swapaxes(qs, 0, 1),
        jnp.swapaxes(logps, 0, 1),
        jnp.swapaxes(alphas, 0, 1),
        eps_final,
        jnp.exp(carry.log_t),
        carry.inv_mass,
    )


class HmcResult(NamedTuple):
    positions: jnp.ndarray     # (chains, num_samples, dim)
    logps: jnp.ndarray         # (chains, num_samples)
    accept_prob: jnp.ndarray   # (chains, num_samples) per-chain accept prob
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray


class HmcCarry(NamedTuple):
    """Fixed-trajectory HMC chain state — the complete between-transition
    state, so any driver (the monolithic scans of ``run_hmc`` or the
    host-driven segments of inference/segmented.py) that threads it through
    ``hmc_transition_factory``'s transition reproduces the SAME sampler
    stream: the PRNG key, DA and Welford accumulators all live here."""

    key: jax.Array
    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray
    da: DualAveragingState
    wf: object
    inv_mass: jnp.ndarray
    iter: jnp.ndarray


def hmc_transition_factory(
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    n_chains: int,
    dim: int,
    dtype,
    num_leapfrogs: int,
    target_accept: float = 0.651,
):
    """One fixed-trajectory lockstep HMC transition (static-scan leapfrogs,
    Halton eps jitter, pooled DA + batched-Welford adaptation) as a pure
    function of ``HmcCarry`` — shared by ``run_hmc`` and the segmented
    host-driven driver.  Returns (transition, batched value_and_grad)."""
    vag = jax.value_and_grad(logdensity)
    bvag = jax.vmap(vag)

    def transition(c: HmcCarry, adapt: bool):
        key, k_mom, k_acc = jax.random.split(c.key, 3)
        # mild multiplicative jitter decorrelates the fixed trajectory
        # length from the target's periods (jittered HMC; Neal 2011 §3.2)
        eps = jnp.exp(c.da.log_eps) * (0.8 + 0.4 * _halton(c.iter))

        p0 = jax.random.normal(k_mom, (n_chains, dim), dtype) \
            * jax.lax.rsqrt(c.inv_mass)
        ke0 = 0.5 * jnp.sum(p0 * p0 * c.inv_mass, axis=1)

        def lf(st, _):
            return leapfrog_step(bvag, st, eps, c.inv_mass), None

        st, _ = jax.lax.scan(
            lf, LeapfrogState(c.q, p0, c.logp, c.grad), None,
            length=num_leapfrogs,
        )
        ke1 = 0.5 * jnp.sum(st.p * st.p * c.inv_mass, axis=1)
        log_acc = (st.logp - ke1) - (c.logp - ke0)
        log_acc = jnp.where(jnp.isnan(log_acc), -jnp.inf, log_acc)
        alpha = jnp.minimum(1.0, jnp.exp(log_acc))
        accept = jnp.log(jax.random.uniform(k_acc, (n_chains,), dtype)) < log_acc
        q = jnp.where(accept[:, None], st.q, c.q)
        logp = jnp.where(accept, st.logp, c.logp)
        grad = jnp.where(accept[:, None], st.grad, c.grad)

        mean_alpha = jnp.mean(alpha)       # cross-chain (psum when sharded)
        if adapt:
            da = da_update(c.da, mean_alpha, target=target_accept)
            wf = _welford_update_batch(c.wf, q)
            new = HmcCarry(key, q, logp, grad, da, wf, c.inv_mass, c.iter + 1)
        else:
            new = HmcCarry(key, q, logp, grad, c.da, c.wf, c.inv_mass,
                           c.iter + 1)
        return new, (q, logp, alpha)

    return transition, bvag


def hmc_init_carry(bvag, key, initial_positions, init_step_size, init_inv_mass,
                   dim, dtype) -> HmcCarry:
    """The sampler's initial ``HmcCarry`` (shared by both drivers)."""
    logp0, grad0 = bvag(initial_positions)
    return HmcCarry(
        key=key,
        q=initial_positions,
        logp=logp0,
        grad=grad0,
        da=da_init(jnp.asarray(init_step_size, dtype)),
        wf=welford_init(dim, dtype),
        inv_mass=(jnp.ones((dim,), dtype) if init_inv_mass is None
                  else jnp.asarray(init_inv_mass, dtype)),
        iter=jnp.zeros((), jnp.int32),
    )


def hmc_midpoint_update(carry: HmcCarry, dim: int, dtype, h1: int) -> HmcCarry:
    """Warmup-midpoint mass switch: cross-chain variance snapshot becomes
    the mass, the Welford accumulator restarts, DA re-inits at the averaged
    step size (guarded for empty first halves; ADVICE r4)."""
    var = jnp.var(carry.q, axis=0) + 1e-3
    da_mid = (da_init(jnp.exp(carry.da.log_eps_avg)) if h1 >= 1
              else carry.da)
    return carry._replace(inv_mass=var, wf=welford_init(dim, dtype),
                          da=da_mid)


def hmc_finalize_adaptation(carry: HmcCarry) -> Tuple[HmcCarry, jnp.ndarray]:
    """Post-warmup: final Welford mass + the eps rescale for the mass change
    (eps_new = eps_old * sqrt(old/new), geometric mean across dims)."""
    inv_mass_final = welford_variance(carry.wf)
    eps_guess = jnp.exp(carry.da.log_eps_avg)
    ratio = jnp.exp(
        0.5 * jnp.mean(jnp.log(carry.inv_mass / inv_mass_final)))
    eps_final = eps_guess * ratio
    return carry._replace(da=da_init(eps_final),
                          inv_mass=inv_mass_final), eps_final


def run_hmc(
    key: jax.Array,
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    initial_positions: jnp.ndarray,   # (chains, dim)
    num_samples: int,
    num_warmup: int = 500,
    num_leapfrogs: int = 32,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    init_inv_mass=None,
    progress: bool = False,
) -> HmcResult:
    """Batched-chain fixed-trajectory HMC: ``num_leapfrogs`` leapfrog steps
    per transition as a STATIC ``lax.scan`` — the entire sampler is nested
    scans with compile-time bounds and zero ``while_loop``s.

    Two roles: (1) the classic jittered-eps HMC baseline (step size by
    pooled dual averaging, Welford mass, eps jittered per transition by a
    Halton draw in [0.8, 1.2) to break integrator periodicity — the
    trajectory-length adaptation of ChEES is the only thing missing); and
    (2) the minimal-control-flow sampler for fragile backends: no
    ``while_loop`` anywhere, so data-dependent loop bounds are eliminated
    as a fault trigger.  (On the axon TPU worker this removes one suspect
    but does NOT make n=2^19-scale sampler programs safe — the worker
    faulted on this sampler's 2^19 compile too, implicating sheer program
    size; CLAUDE.md round-4 notes.)
    """
    n_chains, dim = initial_positions.shape
    dtype = initial_positions.dtype
    transition, bvag = hmc_transition_factory(
        logdensity, n_chains, dim, dtype, num_leapfrogs, target_accept
    )

    from gaplac_tpu.inference.progress import progress_emitter

    warm_progress = progress_emitter("warmup", num_warmup, progress)
    samp_progress = progress_emitter("sampling", num_samples, progress)

    carry = hmc_init_carry(bvag, key, initial_positions, init_step_size,
                           init_inv_mass, dim, dtype)

    def warm_step(c, i):
        new, out = transition(c, adapt=True)
        warm_progress(i)
        return new, out

    if num_warmup > 0:
        # same two-phase schedule as run_chees: unit mass while eps finds
        # its scale, a cross-chain variance snapshot at the midpoint, then
        # re-adaptation under the new mass while a batched Welford
        # accumulates the final mass estimate
        h1 = num_warmup // 2
        carry, _ = jax.lax.scan(warm_step, carry, jnp.arange(h1))
        carry = hmc_midpoint_update(carry, dim, dtype, h1)
        carry, _ = jax.lax.scan(warm_step, carry, jnp.arange(h1, num_warmup))
        carry, eps_final = hmc_finalize_adaptation(carry)
    else:
        eps_final = jnp.asarray(init_step_size, dtype)

    def samp_step(c, i):
        new, out = transition(c, adapt=False)
        samp_progress(i)
        return new, out

    carry, (qs, logps, alphas) = jax.lax.scan(
        samp_step, carry, jnp.arange(num_samples)
    )
    return HmcResult(
        jnp.swapaxes(qs, 0, 1),
        jnp.swapaxes(logps, 0, 1),
        jnp.swapaxes(alphas, 0, 1),
        eps_final,
        carry.inv_mass,
    )
