"""Large-n END-TO-END sampling throughput (VERDICT r1 item 9; BASELINE.json
config 5 — the scale story measured, not inferred).

Full ChEES-HMC wall-clock samples/s on the low-rank (--approx rff) marginal
at n = 65536 observations, m = 512 features, 8 chains — the library-level
equivalent of

    gaplac mcmc "y ~| SqExp(:x)" --data <65k rows> --infer x \
        --approx rff --rff-features 512 --sampler chees --chains 8

(bench_lowrank.py times only logdensity evals; this times the sampler.)
Timing protocol per CLAUDE.md: host-transfer sync, second call timed.
Prints one BENCH-style JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_OBS = 65536
M_FEATURES = 512
# 4 chains, not 8: the vmapped low-rank logdensity does a BATCHED (C, m, m)
# cholesky per eval, and (8, 512, 512) faulted the axon TPU worker
# (2026-08-20; same custom-call fault class as CLAUDE.md's >=16-chain n=500
# crash — the threshold shrinks as m grows).  (4, 512, 512) is safe.
CHAINS, WARMUP, SAMPLES = 4, 100, 100


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    # n=65536 synthetic draws: smooth latent + unit noise (y scale ~ the
    # guide's; the sampler's work depends only on shapes, not values)
    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, N_OBS)
    y = np.sin(x / 1.5) + rng.normal(0, 1.0, N_OBS)
    X = jnp.asarray(x[:, None], dtype)
    yj = jnp.asarray(y, dtype)

    spec = parse_formula("y ~| SqExp(:x)")
    model = build_model(
        compile_formula(spec.formula), ["x"], X, yj, spec.likelihood,
        approx="rff", rff_features=M_FEATURES,
    )
    q0 = jax.vmap(model.initial_position)(jax.random.split(jax.random.key(5), CHAINS))
    run = jax.jit(
        lambda k: run_chees(k, model.logdensity, q0, SAMPLES, num_warmup=WARMUP)
    )
    r = run(jax.random.key(6))
    float(jnp.sum(r.positions))  # compile + host sync
    t0 = time.time()
    r = run(jax.random.key(7))
    float(jnp.sum(r.positions))
    dt = time.time() - t0
    rate = CHAINS * (SAMPLES + WARMUP) / dt
    print(
        f"# backend={backend} n={N_OBS} m={M_FEATURES} chains={CHAINS} "
        f"accept={float(np.asarray(r.accept_prob).mean()):.2f} "
        f"T={float(r.traj_length):.2f} eps={float(r.step_size):.4f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"large-n GP sampling, n={N_OBS} obs, rff m={M_FEATURES} "
                  f"(ChEES-HMC {CHAINS} chains, full transitions)",
        "value": round(rate, 2),
        "unit": "samples/s/chip",
        "seconds_per_transition": round(dt / (CHAINS * (SAMPLES + WARMUP)), 5),
    }))


if __name__ == "__main__":
    main()
