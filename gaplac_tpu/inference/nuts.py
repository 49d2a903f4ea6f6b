"""Iterative NUTS under ``jit`` — multinomial sampling, dual-averaging step
size, diagonal mass adaptation (target accept 0.65, the reference's
``NUTS(0.65)``, CLI/src/mcmc.jl:41).

Design (SURVEY.md §7 hard part (a)): no recursion, no dynamic shapes.  Each
transition is a ``lax.while_loop`` over doublings; each doubling builds its
2^depth-leaf subtree with an inner ``lax.while_loop``.  Sub-U-turn checks use
the O(max_depth) checkpoint scheme (store even-index leaves at slot
popcount(i); at odd i with t trailing ones, check slots
[popcount(i)-t, popcount(i)-1] — the completed subtrees' left endpoints).
The generalized U-turn criterion uses velocities v = M^{-1} p:
turn iff v_lo.(q_hi - q_lo) < 0 or v_hi.(q_hi - q_lo) < 0.

This replaces Turing/AdvancedHMC's recursive tree builder wholesale — the
reference contains zero MCMC kernel code of its own (SURVEY.md §1).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.inference.hmc import (
    DualAveragingState,
    LeapfrogState,
    WelfordState,
    da_init,
    da_update,
    find_reasonable_step_size,
    kinetic_energy,
    leapfrog_step,
    sample_momentum,
    stan_warmup_schedule,
    welford_init,
    welford_update,
    welford_variance,
)

DIVERGENCE_THRESHOLD = 1000.0  # Stan's default energy-error cutoff


class Proposal(NamedTuple):
    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


class _SubtreeResult(NamedTuple):
    end: LeapfrogState
    prop: Proposal
    logw: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_acc: jnp.ndarray
    num_acc: jnp.ndarray


class _Traj(NamedTuple):
    key: jax.Array
    left: LeapfrogState
    right: LeapfrogState
    prop: Proposal
    logw: jnp.ndarray
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_acc: jnp.ndarray
    num_acc: jnp.ndarray


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray   # mean leaf acceptance statistic
    depth: jnp.ndarray         # completed doublings
    diverging: jnp.ndarray
    energy: jnp.ndarray        # H at transition start
    num_steps: jnp.ndarray     # leapfrog steps taken


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_nuts_kernel(
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    max_depth: int = 10,
    divergence_threshold: float = DIVERGENCE_THRESHOLD,
):
    """Build ``step(key, lf, step_size, inv_mass) -> (lf', NUTSInfo)``.

    ``lf`` is a LeapfrogState whose momentum is ignored on input (fresh
    momentum is drawn each transition); logp/grad are carried between
    transitions so each costs exactly its leapfrog gradient evals.
    """
    vag = jax.value_and_grad(logdensity)

    def _build_subtree(key, start, depth, d, eps, inv_mass, h0):
        """Integrate 2^depth leaves from ``start`` in direction d (+-1)."""
        dim = start.q.shape[0]
        dtype = start.q.dtype
        num_leaves = jnp.left_shift(jnp.int32(1), depth)
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        slots = jnp.arange(max_depth, dtype=jnp.int32)

        class Carry(NamedTuple):
            i: jnp.ndarray
            cur: LeapfrogState
            ckpt_q: jnp.ndarray
            ckpt_v: jnp.ndarray
            prop: Proposal
            logw: jnp.ndarray
            turning: jnp.ndarray
            diverging: jnp.ndarray
            sum_acc: jnp.ndarray
            num_acc: jnp.ndarray
            key: jax.Array

        init = Carry(
            i=jnp.zeros((), jnp.int32),
            cur=start,
            ckpt_q=jnp.zeros((max_depth, dim), dtype),
            ckpt_v=jnp.zeros((max_depth, dim), dtype),
            prop=Proposal(start.q, start.logp, start.grad),
            logw=neg_inf,
            turning=jnp.zeros((), bool),
            diverging=jnp.zeros((), bool),
            sum_acc=jnp.zeros((), dtype),
            num_acc=jnp.zeros((), dtype),
            key=key,
        )

        def cond(c: Carry):
            return (c.i < num_leaves) & ~c.turning & ~c.diverging

        def body(c: Carry):
            new = leapfrog_step(vag, c.cur, eps * d, inv_mass)
            h = -new.logp + kinetic_energy(new.p, inv_mass)
            h = jnp.where(jnp.isnan(h), jnp.inf, h)
            div = (h - h0) > divergence_threshold
            logw_leaf = -h
            logw_new = jnp.logaddexp(c.logw, logw_leaf)
            key, ka = jax.random.split(c.key)
            take = jnp.log(jax.random.uniform(ka, dtype=dtype)) < (logw_leaf - logw_new)
            prop = _tree_where(take, Proposal(new.q, new.logp, new.grad), c.prop)
            sum_acc = c.sum_acc + jnp.minimum(1.0, jnp.exp(h0 - h))
            v = inv_mass * new.p

            i = c.i
            pc = jax.lax.population_count(i)
            even = (i % 2) == 0
            # store left endpoints (even leaves) at slot popcount(i)
            slot = jnp.minimum(pc, max_depth - 1)
            ckpt_q = c.ckpt_q.at[slot].set(jnp.where(even, new.q, c.ckpt_q[slot]))
            ckpt_v = c.ckpt_v.at[slot].set(jnp.where(even, v, c.ckpt_v[slot]))
            # completed-subtree U-turn checks (odd leaves)
            t_ones = jax.lax.population_count(jnp.bitwise_xor(i, i + 1)) - 1
            lo, hi = pc - t_ones, pc - 1
            dqs = (new.q[None, :] - ckpt_q) * d          # (max_depth, dim)
            turn_vec = (jnp.sum(ckpt_v * dqs, axis=-1) < 0) | ((dqs @ v) < 0)
            active = (~even) & (slots >= lo) & (slots <= hi)
            turning = c.turning | jnp.any(active & turn_vec)

            return Carry(
                i=i + 1,
                cur=new,
                ckpt_q=ckpt_q,
                ckpt_v=ckpt_v,
                prop=prop,
                logw=logw_new,
                turning=turning,
                diverging=c.diverging | div,
                sum_acc=sum_acc,
                num_acc=c.num_acc + 1.0,
                key=key,
            )

        c = jax.lax.while_loop(cond, body, init)
        return _SubtreeResult(
            c.cur, c.prop, c.logw, c.turning, c.diverging, c.sum_acc, c.num_acc
        )

    def step(key: jax.Array, lf: LeapfrogState, step_size, inv_mass):
        dtype = lf.q.dtype
        k_mom, k_tree = jax.random.split(key)
        p0 = sample_momentum(k_mom, inv_mass)
        h0 = -lf.logp + kinetic_energy(p0, inv_mass)
        start = LeapfrogState(lf.q, p0, lf.logp, lf.grad)

        init = _Traj(
            key=k_tree,
            left=start,
            right=start,
            prop=Proposal(start.q, start.logp, start.grad),
            logw=-h0,
            depth=jnp.zeros((), jnp.int32),
            turning=jnp.zeros((), bool),
            diverging=jnp.zeros((), bool),
            sum_acc=jnp.zeros((), dtype),
            num_acc=jnp.zeros((), dtype),
        )

        def cond(t: _Traj):
            return (t.depth < max_depth) & ~t.turning & ~t.diverging

        def body(t: _Traj):
            key, kd, ks, kb = jax.random.split(t.key, 4)
            d = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0).astype(dtype)
            fwd = d > 0
            start_state = _tree_where(fwd, t.right, t.left)
            sub = _build_subtree(ks, start_state, t.depth, d, step_size, inv_mass, h0)

            invalid = sub.turning | sub.diverging
            # biased progressive sampling at the doubling level
            take = jnp.log(jax.random.uniform(kb, dtype=dtype)) < (sub.logw - t.logw)
            prop = _tree_where(take & ~invalid, sub.prop, t.prop)
            logw = jnp.where(invalid, t.logw, jnp.logaddexp(t.logw, sub.logw))
            left = _tree_where(fwd | invalid, t.left, sub.end)
            right = _tree_where(fwd & ~invalid, sub.end, t.right)
            # whole-trajectory U-turn check
            dq = right.q - left.q
            v_l = inv_mass * left.p
            v_r = inv_mass * right.p
            traj_turn = (jnp.dot(v_l, dq) < 0) | (jnp.dot(v_r, dq) < 0)

            return _Traj(
                key=key,
                left=left,
                right=right,
                prop=prop,
                logw=logw,
                depth=t.depth + 1,
                turning=sub.turning | (~invalid & traj_turn),
                diverging=sub.diverging,
                sum_acc=t.sum_acc + sub.sum_acc,
                num_acc=t.num_acc + sub.num_acc,
            )

        t = jax.lax.while_loop(cond, body, init)
        accept = t.sum_acc / jnp.maximum(t.num_acc, 1.0)
        new_lf = LeapfrogState(t.prop.q, p0, t.prop.logp, t.prop.grad)
        info = NUTSInfo(accept, t.depth, t.diverging, h0, t.num_acc)
        return new_lf, info

    return step


# ---------------------------------------------------------------------------
# Full adaptive run: Stan-style warmup + sampling, two lax.scans
# ---------------------------------------------------------------------------


class NUTSResult(NamedTuple):
    positions: jnp.ndarray      # (num_samples, dim)
    logps: jnp.ndarray          # (num_samples,)
    accept_prob: jnp.ndarray    # (num_samples,)
    depths: jnp.ndarray         # (num_samples,)
    diverging: jnp.ndarray      # (num_samples,)
    step_size: jnp.ndarray      # adapted
    inv_mass: jnp.ndarray       # adapted diagonal


def run_nuts(
    key: jax.Array,
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    initial_position: jnp.ndarray,
    num_samples: int,
    num_warmup: int = 500,
    max_depth: int = 10,
    target_accept: float = 0.65,  # ref default, mcmc.jl:41
    initial_step_size: Optional[float] = None,
    initial_inv_mass: Optional[jnp.ndarray] = None,
    progress: bool = False,
) -> NUTSResult:
    """Single-chain adaptive NUTS.  vmap over keys/positions for chains;
    shard the chain axis over a mesh for multi-host (SURVEY.md §2.4).

    ``progress=True`` emits host-callback progress lines from inside the
    compiled scans (the reference's Turing ``progress=true`` equivalent,
    mcmc.jl:41); leave off under vmap or through a remote device tunnel."""
    vag = jax.value_and_grad(logdensity)
    kernel = make_nuts_kernel(logdensity, max_depth=max_depth)
    dim = initial_position.shape[0]
    dtype = initial_position.dtype

    logp0, grad0 = vag(initial_position)
    lf0 = LeapfrogState(initial_position, jnp.zeros_like(initial_position), logp0, grad0)
    if initial_inv_mass is None:
        inv_mass0 = jnp.ones((dim,), dtype)
    else:
        inv_mass0 = jnp.asarray(initial_inv_mass, dtype)

    key, k_eps = jax.random.split(key)
    if initial_step_size is None:
        eps0 = find_reasonable_step_size(vag, k_eps, initial_position, inv_mass0)
    else:
        eps0 = jnp.asarray(initial_step_size, dtype)

    sched = stan_warmup_schedule(num_warmup)

    class WarmCarry(NamedTuple):
        key: jax.Array
        lf: LeapfrogState
        da: DualAveragingState
        wf: WelfordState
        inv_mass: jnp.ndarray

    from gaplac_tpu.inference.progress import progress_emitter

    warm_progress = progress_emitter("warmup", num_warmup, progress)
    samp_progress = progress_emitter("sampling", num_samples, progress)

    def warm_step(c: WarmCarry, xs):
        i, in_slow, window_end = xs
        key, k_step = jax.random.split(c.key)
        eps = jnp.exp(c.da.log_eps)
        lf, info = kernel(k_step, c.lf, eps, c.inv_mass)
        da = da_update(c.da, info.accept_prob, target=target_accept)
        wf = _tree_where(in_slow, welford_update(c.wf, lf.q), c.wf)
        # end of a slow window: swap in the new mass, restart the accumulators
        new_inv_mass = welford_variance(wf)
        inv_mass = jnp.where(window_end, new_inv_mass, c.inv_mass)
        da = _tree_where(window_end, da_init(jnp.exp(da.log_eps)), da)
        wf = _tree_where(window_end, welford_init(dim, dtype), wf)
        warm_progress(i)
        return WarmCarry(key, lf, da, wf, inv_mass), None

    warm0 = WarmCarry(key, lf0, da_init(eps0), welford_init(dim, dtype), inv_mass0)
    if num_warmup > 0:
        xs = (
            jnp.arange(num_warmup),
            jnp.asarray(sched.in_slow_window),
            jnp.asarray(sched.window_end),
        )
        warm, _ = jax.lax.scan(warm_step, warm0, xs)
    else:
        warm = warm0
    eps_final = jnp.exp(warm.da.log_eps_avg) if num_warmup > 0 else eps0
    inv_mass = warm.inv_mass

    class SampCarry(NamedTuple):
        key: jax.Array
        lf: LeapfrogState

    def samp_step(c: SampCarry, i):
        key, k_step = jax.random.split(c.key)
        lf, info = kernel(k_step, c.lf, eps_final, inv_mass)
        out = (lf.q, lf.logp, info.accept_prob, info.depth, info.diverging)
        samp_progress(i)
        return SampCarry(key, lf), out

    (_, _), outs = jax.lax.scan(
        samp_step, SampCarry(warm.key, warm.lf), jnp.arange(num_samples)
    )
    qs, logps, accs, depths, divs = outs
    return NUTSResult(qs, logps, accs, depths, divs, eps_final, inv_mass)
