"""Chain-scaling harness (BASELINE.md: "Chain-scaling efficiency >= 80%
linear, 1 chip -> 1 host -> >= 2 hosts").

Measures ChEES-HMC transitions/s with the chain axis sharded over 1, 2, 4,
... local devices, reporting parallel efficiency vs the 1-device rate.
Chains are embarrassingly parallel (zero cross-device traffic except the
scalar adaptation psums), so efficiency is gated only by compiler/runtime
overheads.  On a multi-host pod set GAPLAC_COORDINATOR et al. (see
parallel/multihost.py) and run one process per host; the mesh then spans
hosts and the same numbers come out per chip.

Note: virtual CPU "devices" share host cores, so CPU efficiency numbers are
not meaningful — run this on real hardware.  On the axon single-chip tunnel
only the 1-device row runs.

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

N_OBS = 200
CHAINS_PER_DEVICE = 4
SAMPLES, WARMUP = 100, 100


def _build_model(dtype):
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops import mvn

    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, N_OBS)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None], dtype)
    y = mvn.sample_mvn(jax.random.key(1), gen.gram(gen.default_params(dtype), X), jitter=0.1)
    spec = parse_formula("y ~| SqExp(:x)")
    return build_model(
        compile_formula(spec.formula), ["x"], X, y, spec.likelihood, marginalize=False
    )


def main_batch():
    """Single-device chain-BATCH scaling: chains 1, 2, 4, 8 vmapped on one
    chip (the real-TPU measurement available on the 1-chip axon tunnel;
    batching amortizes the backend's ~25-40us per-op dispatch floor).
    Efficiency is per-chain throughput vs the 1-chain rate; >= 1.0 means
    batching is free or better.  Chains capped at 8 (axon worker faults on
    batched cholesky at >= ~16 chains, CLAUDE.md)."""
    from gaplac_tpu.inference.chees import run_chees

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    model = _build_model(dtype)
    base_rate = None
    for C in (1, 2, 4, 8):
        q0 = jax.vmap(model.initial_position)(jax.random.split(jax.random.key(4), C))
        run = jax.jit(
            lambda k, q: run_chees(k, model.logdensity, q, SAMPLES, num_warmup=WARMUP)
        )
        r = run(jax.random.key(5), q0)
        float(jnp.sum(r.positions))
        t0 = time.time()
        r = run(jax.random.key(6), q0)
        float(jnp.sum(r.positions))
        rate = C * (SAMPLES + WARMUP) / (time.time() - t0)
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "mode": "chain-batch-1dev", "chains": C,
            "transitions_per_s": round(rate, 1),
            "efficiency_vs_linear": round(rate / (base_rate * C), 3),
        }))


def main_batch_frozen():
    """Chain-BATCH scaling with adaptation FROZEN (VERDICT r2 task 8): one
    8-chain adapted run fixes (T, eps); then chains 1,2,4,8 run sampling
    only (num_warmup=0) at those values.  This isolates the hardware
    amortization term — the r2 batch curve confounded it with ChEES
    adaptation finding different (T, eps) equilibria per chain count."""
    from gaplac_tpu.inference.chees import run_chees

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    model = _build_model(dtype)
    q8 = jax.vmap(model.initial_position)(jax.random.split(jax.random.key(4), 8))
    ref = jax.jit(
        lambda k: run_chees(k, model.logdensity, q8, 50, num_warmup=WARMUP)
    )(jax.random.key(5))
    T = float(ref.traj_length)
    eps = float(ref.step_size)
    float(jnp.sum(ref.positions))
    print(json.dumps({"mode": "frozen-ref", "T": round(T, 4),
                      "eps": round(eps, 5),
                      "accept": round(float(np.asarray(ref.accept_prob).mean()), 3)}))
    base_rate = None
    for C in (1, 2, 4, 8):
        q0 = jax.vmap(model.initial_position)(jax.random.split(jax.random.key(6), C))
        run = jax.jit(
            lambda k, q: run_chees(k, model.logdensity, q, 2 * SAMPLES,
                                   num_warmup=0, init_step_size=eps,
                                   init_traj_length=T)
        )
        r = run(jax.random.key(7), q0)
        float(jnp.sum(r.positions))
        t0 = time.time()
        r = run(jax.random.key(8), q0)
        float(jnp.sum(r.positions))
        rate = C * 2 * SAMPLES / (time.time() - t0)
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "mode": "chain-batch-frozen-1dev", "chains": C,
            "transitions_per_s": round(rate, 1),
            "per_chain_efficiency_vs_1chain": round(rate / (base_rate * C), 3),
        }))


def main():
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.parallel.mesh import chain_mesh

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    model = _build_model(dtype)

    n_dev = jax.device_count()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base_rate = None
    for d in sizes:
        C = CHAINS_PER_DEVICE * d
        mesh = chain_mesh(d)
        sharding = NamedSharding(mesh, P("chains"))
        q0 = jax.device_put(
            jax.vmap(model.initial_position)(jax.random.split(jax.random.key(4), C)),
            sharding,
        )
        run = jax.jit(
            lambda k, q: run_chees(k, model.logdensity, q, SAMPLES, num_warmup=WARMUP)
        )
        r = run(jax.random.key(5), q0)
        float(jnp.sum(r.positions))  # compile + host sync
        t0 = time.time()
        r = run(jax.random.key(6), q0)
        float(jnp.sum(r.positions))
        rate = C * (SAMPLES + WARMUP) / (time.time() - t0)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        print(json.dumps({
            "mode": "device-sharded", "devices": d, "chains": C,
            "transitions_per_s": round(rate, 1),
            "efficiency_vs_linear": round(eff, 3),
        }))


if __name__ == "__main__":
    if "frozen" in sys.argv[1:]:
        main_batch_frozen()
    elif "batch" in sys.argv[1:]:
        main_batch()
    else:
        main()
