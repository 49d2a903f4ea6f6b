"""Staged probe: ChEES-HMC past the 8-chain ceiling at n=500 via the
batch-safe (no-custom-call) cholesky routing.

The axon worker faults on XLA's batched cholesky at >= ~16 chains n=500
(CLAUDE.md); linalg.set_batchsafe_default(True) reroutes the per-chain
(500,500) factorization through ops/cholesky.py::cholesky_nocc (pure HLO).
This script escalates chain count with host-synced DONE lines so a crash
identifies the first faulting stage; if all stages pass it prints
bench-protocol throughput per chain count (same model as bench.py).

Run only when ~30-60 min of tunnel downtime is affordable.

ROUND-4 DISPOSITION: superseded by measurement — the frozen-adaptation
chain-batch curve (SCALING_r04.md) shows the batched dense leapfrog is
COMPUTE-bound past ~4 chains (per-transition wall grows ~6x from 1 to 8
chains at n=200), so 16/32/64 chains cannot materially raise samples/s/chip
even if the worker survived them; the per-op dispatch floor this probe was
designed to amortize is already amortized at 8 chains.  Kept for a future
backend where batched cholesky is latency-bound.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_OBS = 500
WARMUP, SAMPLES = 200, 200


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops import linalg, mvn

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, N_OBS)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None], dtype)
    y = mvn.sample_mvn(jax.random.key(1), gen.gram(gen.default_params(dtype), X),
                       jitter=0.1)
    spec = parse_formula("y ~| SqExp(:x)")
    model = build_model(
        compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
        marginalize=False,
    )

    linalg.set_batchsafe_default(True)
    say(f"batchsafe cholesky routing ON (backend={backend})")

    for chains in (16, 32, 64):
        q0 = jax.vmap(model.initial_position)(
            jax.random.split(jax.random.key(5), chains)
        )
        # stage A: vmapped value+grad only, a few scan iters
        from jax import lax

        @jax.jit
        def vg(qs):
            def body(c, _):
                g = jax.vmap(jax.grad(model.logdensity))(qs + 1e-6 * c)
                return 1e-9 * jnp.sum(g), None
            c, _ = lax.scan(body, jnp.asarray(0.0, dtype), None, length=5)
            return c

        float(vg(q0))
        say(f"DONE {chains}-chain vmapped value+grad (batchsafe)")

        # stage B: full bench-protocol ChEES
        chees = jax.jit(
            lambda k, q0=q0: run_chees(k, model.logdensity, q0, SAMPLES,
                                       num_warmup=WARMUP)
        )
        r = chees(jax.random.key(6))
        float(jnp.sum(r.positions))
        rates = []
        for i in range(3):
            t0 = time.time()
            r = chees(jax.random.key(7 + i))
            float(jnp.sum(r.positions))
            rates.append(chains * (SAMPLES + WARMUP) / (time.time() - t0))
        say(
            f"DONE {chains}-chain ChEES: median {np.median(rates):.1f} tr/s "
            f"[{min(rates):.1f}, {max(rates):.1f}] "
            f"accept={float(np.asarray(r.accept_prob).mean()):.2f} "
            f"T={float(r.traj_length):.2f} eps={float(r.step_size):.4f}"
        )


if __name__ == "__main__":
    sys.exit(main())
