"""ChEES throughput on the INNOVATION-WHITENED state-space model at n=500,
escalating chain counts (8 -> 64).

The bench.py headline model (whitened latent SqExp, dim 501) needs a
cholesky per leapfrog on the dense path, which (a) is the dispatch-floor
hot op and (b) faults the axon worker at >= ~16 chains.  The
``--approx sde --no-marginalize`` model is the SAME whitened formulation
with L realized by the innovation recurrence (SqExp order-6 SSM block,
4.3e-3 kernel error) — no cholesky custom call anywhere, so chain counts
beyond 8 are expected to be crash-free, and the per-leapfrog op count is
independent of the chain count (vmapped scans).  If stable and faster
per chip, this is the headline lever the dense path cannot pull.

Host-synced DONE lines identify the first faulting stage if any.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gaplac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N_OBS = int(os.environ.get("GAPLAC_WSDE_N", 500))
WARMUP, SAMPLES = (int(os.environ.get("GAPLAC_WSDE_WARMUP", 200)),
                   int(os.environ.get("GAPLAC_WSDE_SAMPLES", 200)))


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops import mvn

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    say(f"backend={backend}")

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-5, 5, N_OBS))
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None], dtype)
    y = mvn.sample_mvn(jax.random.key(1),
                       gen.gram(gen.default_params(dtype), X), jitter=0.1)
    spec = parse_formula("y ~| SqExp(:x)")
    model = build_model(
        compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
        marginalize=False, approx="sde",
    )
    say(f"model dim {model.dim} (whitened sde)")

    chains_list = tuple(
        int(c) for c in os.environ.get("GAPLAC_WSDE_CHAINS",
                                       "8,16,32,64").split(",")
    )
    vg_only = os.environ.get("GAPLAC_WSDE_VG_ONLY", "") == "1"
    for chains in chains_list:
        q0 = jax.vmap(model.initial_position)(
            jax.random.split(jax.random.key(5), chains))

        # stage A: raw vmapped value+grad (the leapfrog hot op), 20 chained
        # in-graph — cheap to compile, so it charts cost-vs-chains even in
        # short tunnel windows; the full ChEES stage below is the headline
        ITERS = 20

        @jax.jit
        def vg(qs, d):
            def body(c, _):
                g = jax.vmap(
                    jax.grad(lambda q: model.logdensity_data(q, d))
                )(qs + 1e-6 * c)
                return 1e-9 * jnp.sum(g), None
            c, _ = jax.lax.scan(body, jnp.zeros((), q0.dtype), None,
                                length=ITERS)
            return c

        float(vg(q0, model.data))
        say(f"DONE {chains}-chain value+grad compile")
        t0 = time.time()
        float(vg(q0, model.data))
        dt_vg = (time.time() - t0) / ITERS
        print(json.dumps({
            "metric": f"whitened-sde value+grad n={N_OBS} chains={chains}",
            "value": round(chains / dt_vg, 1),
            "unit": "evals/s",
            "seconds_per_batch_eval": round(dt_vg, 5),
        }), flush=True)
        if vg_only:
            continue

        run = jax.jit(
            lambda k, d, q0=q0: run_chees(
                k, lambda u: model.logdensity_data(u, d), q0, SAMPLES,
                num_warmup=WARMUP)
        )
        r = run(jax.random.key(6), model.data)
        float(jnp.sum(r.positions))
        say(f"DONE {chains}-chain compile+first run")
        rates = []
        for i in range(3):
            t0 = time.time()
            r = run(jax.random.key(7 + i), model.data)
            float(jnp.sum(r.positions))
            rates.append(chains * (SAMPLES + WARMUP) / (time.time() - t0))
        say(
            f"DONE {chains}-chain: accept="
            f"{float(np.asarray(r.accept_prob).mean()):.2f} "
            f"T={float(r.traj_length):.2f} eps={float(r.step_size):.4f}"
        )
        print(json.dumps({
            "metric": f"whitened-sde ChEES n={N_OBS} chains={chains}",
            "value": round(float(np.median(rates)), 1),
            "unit": "transitions/s/chip",
            "spread": [round(min(rates), 1), round(max(rates), 1)],
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
