"""Probe: Matern32 (d=2, SoA layout) 128-particle SMC evidence at n=2^17.

Round-5 loose end (results_v5e.txt "struct-of-arrays" section): the post-SoA
128-particle `select --estimator smc` retry no longer OOMs or faults the
worker, but its completion was unverified (timeout in a congested window).
This probe verifies it end-to-end on regenerated data: OU(l=5)+noise draws
(fixed seed, AR(1) recursion), then the Matern32 SMC evidence at 16 and at
128 particles on the SAME data so the pair is internally comparable.

Env knobs: GAPLAC_SMC_N (default 131072), GAPLAC_SMC_PARTICLES
(comma list, default "16,128").
Prints one BENCH-style JSON line per particle count.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("GAPLAC_SMC_N", 131072))
PARTICLES = [int(p) for p in
             os.environ.get("GAPLAC_SMC_PARTICLES", "16,128").split(",")]


def gen_data(n: int, seed: int = 0):
    """OU(l=5, var=1) + N(0, 0.1^2) noise on x = linspace(0, 100, n)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 100.0, n)
    dt = x[1] - x[0]
    phi = np.exp(-dt / 5.0)
    innov_sd = np.sqrt(1.0 - phi * phi)
    e = rng.standard_normal(n)
    f = np.empty(n)
    f[0] = e[0]
    for i in range(1, n):
        f[i] = phi * f[i - 1] + innov_sd * e[i]
    y = f + 0.1 * rng.standard_normal(n)
    return x, y


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.inference.smc import smc_log_evidence_gp

    x, y = gen_data(N)
    spec = parse_formula("y ~| Matern32(:x)")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(x, jnp.float32)[:, None]
    yj = jnp.asarray(y, jnp.float32)
    model = build_model(ck, ["x"], X, yj, spec.likelihood,
                       jitter=1e-6, approx="sde")

    for p in PARTICLES:
        t0 = time.time()
        res = smc_log_evidence_gp(jax.random.key(0), model, n_particles=p)
        lp = float(res.log_evidence)  # host transfer = the real sync point
        dt = time.time() - t0
        print(json.dumps({
            "metric": f"smc evidence, Matern32 sde, n={N}, {p} particles",
            "value": round(lp, 2), "unit": "log-evidence (nats)",
            "stages": int(res.n_stages), "final_beta": float(res.final_beta),
            "wallclock_s": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
