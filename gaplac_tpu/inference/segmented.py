"""Segmented host-driven lockstep HMC — large-n sampling past the
program-size fault boundary.

Motivation (measured, round 4; CLAUDE.md + benchmarks/results_v5e.txt):
on this image's axon TPU backend, END-TO-END sampler programs fault the
worker at n >= 2^18 for BOTH ChEES and the zero-while-loop ``run_hmc`` —
the 2^19 ChEES executable serializes to 200 MB — while plain value+grad
programs of the SAME models run clean at every n tried (192-194 evals/s at
n=2^19).  What correlates with the fault is sheer compiled-program size,
not the math and not data-dependent control flow.

This driver therefore jits ONE SHORT SEGMENT — a static scan of
``segment_size`` fixed-trajectory HMC transitions, value+grad scale — and
drives warmup/sampling from a Python loop.  At large n a transition costs
>= 20 ms, so the per-segment dispatch is noise.  The complete chain state
(``HmcCarry``: PRNG key, positions, DA + Welford accumulators, mass)
threads through every segment, so the sampler stream is IDENTICAL to the
monolithic ``run_hmc`` for the same seed (tested: tests/test_nuts.py).

The segment takes the model's O(n) data arrays as jit PARAMETERS
(``GPModel.logdensity_data``) — closure literals lower to multi-MB HLO
and hang the remote compile service at n >= 2^20 (CLAUDE.md).

Extras the monolithic form cannot offer:
  - a checkpoint can be written after EVERY sampling segment (elastic
    recovery mid-run, not just at the end);
  - sampled positions stream to host per segment, so the stacked
    (chains, draws, dim) buffer never lives on device.

Reference contrast: the reference runs Turing NUTS with a dense Cholesky
per leapfrog (/root/reference/CLI/src/mcmc.jl:35-41) — unusable past
n ~ 10^3; this path samples exact GP hyperparameter posteriors at
n = 2^18-2^19 through the sde marginal.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.inference.chees import (
    HmcCarry,
    HmcResult,
    hmc_finalize_adaptation,
    hmc_init_carry,
    hmc_midpoint_update,
    hmc_transition_factory,
)

log = logging.getLogger("gaplac")


def run_hmc_segmented(
    key: jax.Array,
    logdensity: Callable[[jnp.ndarray], jnp.ndarray],
    initial_positions: jnp.ndarray,   # (chains, dim)
    num_samples: int,
    num_warmup: int = 500,
    num_leapfrogs: int = 32,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    init_inv_mass=None,
    segment_size: int = 25,
    data=None,
    logdensity_data: Optional[Callable] = None,
    checkpoint_cb: Optional[Callable] = None,
    progress: bool = False,
) -> HmcResult:
    """``run_hmc`` semantics, host-driven in jitted segments.

    ``data``/``logdensity_data``: when given, the target is
    ``lambda u: logdensity_data(u, data)`` with ``data`` entering every
    segment as a jit parameter (the large-n form).  ``checkpoint_cb(state)``
    is called after each SAMPLING segment with a dict holding the latest
    ``positions`` (chains, dim), ``step_size`` and ``inv_mass`` — write it
    to disk for mid-run recovery.  Returns the same ``HmcResult`` as the
    monolithic sampler (arrays are host numpy)."""
    n_chains, dim = initial_positions.shape
    dtype = initial_positions.dtype
    if segment_size < 1:
        raise ValueError(f"segment_size must be >= 1, got {segment_size}")

    def make_ld(d):
        if logdensity_data is None:
            return logdensity
        return lambda u: logdensity_data(u, d)

    @partial(jax.jit, static_argnames=("seg_len", "adapt"))
    def segment(carry, d, seg_len: int, adapt: bool):
        transition, _ = hmc_transition_factory(
            make_ld(d), n_chains, dim, dtype, num_leapfrogs, target_accept
        )

        def step(c, _):
            return transition(c, adapt)

        return jax.lax.scan(step, carry, None, length=seg_len)

    bvag_j = jax.jit(
        lambda qs, d: jax.vmap(jax.value_and_grad(make_ld(d)))(qs)
    )
    logp0, grad0 = bvag_j(initial_positions, data)
    carry = hmc_init_carry(
        lambda qs: (logp0, grad0), key, initial_positions, init_step_size,
        init_inv_mass, dim, dtype,
    )

    def drive(carry, n_steps, adapt, phase_name, collect=False):
        """Run ``n_steps`` transitions in <= segment_size chunks.  Equal
        chunk sizes (plus at most one remainder) keep the compile count at
        two programs per (phase kind)."""
        outs = []
        done = 0
        t0 = time.time()
        while done < n_steps:
            s = min(segment_size, n_steps - done)
            carry, (qs, logps, alphas) = segment(
                carry, data, seg_len=s, adapt=adapt
            )
            done += s
            if collect:
                # stream draws to host: the stacked draw buffer never
                # exists on device
                outs.append((np.asarray(qs), np.asarray(logps),
                             np.asarray(alphas)))
                if checkpoint_cb is not None:
                    checkpoint_cb({
                        "positions": np.asarray(carry.q),
                        "step_size": float(np.exp(np.asarray(
                            carry.da.log_eps))),
                        "inv_mass": np.asarray(carry.inv_mass),
                    })
            else:
                # host sync per segment: paces the loop and surfaces
                # device faults at the segment that caused them
                # (block_until_ready is async through the axon tunnel —
                # a transfer is the only real barrier)
                float(jnp.sum(carry.logp))
            if progress:
                rate = done * n_chains / max(time.time() - t0, 1e-9)
                log.info("segmented hmc %s: %d/%d transitions (%.1f tr/s)",
                         phase_name, done, n_steps, rate)
        return carry, outs

    if num_warmup > 0:
        h1 = num_warmup // 2
        carry, _ = drive(carry, h1, True, "warmup-1")
        carry = hmc_midpoint_update(carry, dim, dtype, h1)
        carry, _ = drive(carry, num_warmup - h1, True, "warmup-2")
        carry, eps_final = hmc_finalize_adaptation(carry)
    else:
        eps_final = jnp.asarray(init_step_size, dtype)

    carry, outs = drive(carry, num_samples, False, "sampling", collect=True)

    qs = np.concatenate([o[0] for o in outs], axis=0)      # (draws, chains, dim)
    logps = np.concatenate([o[1] for o in outs], axis=0)
    alphas = np.concatenate([o[2] for o in outs], axis=0)
    return HmcResult(
        np.swapaxes(qs, 0, 1),
        np.swapaxes(logps, 0, 1),
        np.swapaxes(alphas, 0, 1),
        np.asarray(eps_final),
        np.asarray(carry.inv_mass),
    )
