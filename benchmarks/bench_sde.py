"""Million-observation EXACT GP sampling via the state-space path.

Full ChEES-HMC wall-clock on the exact OU marginal (--approx sde) at
n = 2^20 observations, 8 chains — the library-level equivalent of

    gaplac mcmc "y ~| OU(:x)" --data <1M rows> --infer x \
        --approx sde --sampler chees --chains 8

The density is a parallel-Kalman associative scan (ops/markov.py): pure
HLO, no gram, no cholesky (also: nothing for the axon worker's batched
cholesky fault to hit).  Also times the raw vmapped value+grad.
Timing protocol per CLAUDE.md: host-transfer sync, second call timed.
Prints BENCH-style JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: the large-n ChEES/value+grad programs take
# minutes to compile through the tunnel — cache across retries/sessions
jax.config.update("jax_compilation_cache_dir", "/tmp/gaplac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N_OBS = 1 << 20
#: GAPLAC_SDE_CHAINS trims the vmapped chain batch — the matrix-state
#: formulas (quasi-periodic d=42) OOM the 16 GB HBM at 8 chains x 16k obs
#: ((chains, n, d, d) scan elements); 1-2 chains fit
CHAINS = int(os.environ.get("GAPLAC_SDE_CHAINS", 8))
WARMUP, SAMPLES = 100, 100
#: escalate through these sizes with host-synced progress lines, so a hung
#: tunnel identifies the first sticking stage (the final size is the
#: headline; smaller ones also chart the O(n log n) scaling).  Override with
#: GAPLAC_SDE_STAGES=1048576 (comma-separated) to retry one stage alone.
STAGES = tuple(
    int(s) for s in os.environ.get(
        "GAPLAC_SDE_STAGES", f"{1 << 14},{1 << 17},{1 << 19}").split(",")
)


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula

    backend = jax.default_backend()
    say(f"backend={backend} devices={jax.devices()}")
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    # GAPLAC_SDE_HARMONICS trims the Periodic block (state dim 2J+1;
    # J=5 is accuracy-free for l >= 0.7 — results_v5e round-5 table)
    if os.environ.get("GAPLAC_SDE_HARMONICS"):
        from gaplac_tpu.ops import markov_ss as _mss

        _mss.set_periodic_harmonics(int(os.environ["GAPLAC_SDE_HARMONICS"]))
        say(f"periodic harmonics J={_mss.PERIODIC_J}")

    for n_obs in STAGES:
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0, 2000.0, n_obs))
        # GAPLAC_SDE_FORMULA switches the model, e.g. the quasi-periodic
        # matrix-state "y ~| Periodic(:x; p=3.0) * Matern32(:x)" (d=42
        # Kronecker block) vs the default scalar OU (d=1); a non-Gaussian
        # likelihood ("y : Bernoulli ~| OU(:x)") routes through the
        # state-space Laplace marginal with binary data
        formula = os.environ.get("GAPLAC_SDE_FORMULA", "y ~| OU(:x)")
        spec = parse_formula(formula)
        if spec.likelihood.name == "bernoulli":
            latent = np.sin(x / 1.5) + rng.normal(0, 0.5, n_obs)
            y = (rng.uniform(0, 1, n_obs) < 1 / (1 + np.exp(-latent))
                 ).astype(float)
        elif spec.likelihood.name == "poisson":
            y = rng.poisson(np.exp(0.5 * np.sin(x / 1.5)), n_obs).astype(float)
        else:
            y = np.sin(x / 1.5) + rng.normal(0, 1.0, n_obs)
        X = jnp.asarray(x[:, None], dtype)
        yj = jnp.asarray(y, dtype)
        float(jnp.sum(yj))
        say(f"n={n_obs}: data uploaded")

        ck = compile_formula(spec.formula)
        if ck.n_leaves > 1:  # one design column per leaf (shared variable)
            X = jnp.broadcast_to(X, (n_obs, ck.n_leaves))
        model = build_model(
            ck, ["x"], X, yj, spec.likelihood,
            approx="sde",
        )

        # raw vmapped value+grad rate (the leapfrog hot op), chained in-graph.
        # The O(n) data arrays are passed as jit ARGUMENTS (logdensity_data):
        # the closure form embeds them as multi-MB HLO literals, which the
        # remote TPU compile service handles pathologically at n=2^20
        q0 = jax.vmap(model.initial_position)(
            jax.random.split(jax.random.key(5), CHAINS))
        ITERS = 20

        @jax.jit
        def vg(qs, d):
            def body(c, _):
                g = jax.vmap(
                    jax.grad(lambda q: model.logdensity_data(q, d))
                )(qs + 1e-6 * c)
                return 1e-9 * jnp.sum(g), None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None,
                                length=ITERS)
            return c

        float(vg(q0, model.data))
        say(f"n={n_obs}: value+grad compiled")
        t0 = time.time()
        float(vg(q0, model.data))
        dt_vg = (time.time() - t0) / ITERS
        print(json.dumps({
            "metric": f"sde exact marginal value+grad, n={n_obs}, "
                      f"{CHAINS} chains vmapped",
            "value": round(CHAINS / dt_vg, 2),
            "unit": "evals/s",
            "seconds_per_batch_eval": round(dt_vg, 5),
        }), flush=True)

        if os.environ.get("GAPLAC_SDE_VG_ONLY", "") == "1":
            # value+grad programs run clean at every n/chains tried; the
            # end-to-end sampler programs fault the axon worker at
            # n >= 2^18 (4/4 crashes, round 4) — this knob charts the hot
            # op without risking the worker
            continue

        # GAPLAC_SDE_SAMPLER=hmc swaps in the fixed-trajectory static-scan
        # sampler (run_hmc): NO while_loop in the compiled program.  (This
        # eliminated one axon-fault suspect but n=2^19 sampler programs
        # fault the worker regardless — 3/3 crashes across ChEES and HMC;
        # program size is the correlate.  CLAUDE.md round-4 notes.)
        sampler_name = os.environ.get("GAPLAC_SDE_SAMPLER", "chees")
        if sampler_name == "segmented":
            # the round-5 large-n mode: jit ONE short segment (value+grad
            # scale), drive warmup/sampling from the host — the compiled
            # program never reaches the n>=2^18 program-size fault class
            from gaplac_tpu.inference.segmented import run_hmc_segmented

            LEAPS = int(os.environ.get("GAPLAC_SDE_LEAPFROGS", 16))
            SEG = int(os.environ.get("GAPLAC_SDE_SEGMENT", 25))
            t0 = time.time()
            r = run_hmc_segmented(
                jax.random.key(7), None, q0, SAMPLES, num_warmup=WARMUP,
                num_leapfrogs=LEAPS, segment_size=SEG,
                data=model.data, logdensity_data=model.logdensity_data,
                progress=False,
            )
            dt = time.time() - t0
            rate = CHAINS * (SAMPLES + WARMUP) / dt
            say(
                f"n={n_obs} chains={CHAINS} segmented "
                f"accept={float(np.asarray(r.accept_prob).mean()):.2f} "
                f"eps={float(r.step_size):.4f} (incl. segment compiles)"
            )
            print(json.dumps({
                "metric": f"EXACT GP sampling END-TO-END, n={n_obs} obs "
                          f"({formula!r} state-space "
                          f"marginal, segmented HMC({LEAPS} lf) x{SEG}/seg, "
                          f"{CHAINS} chains, warmup+samples="
                          f"{WARMUP}+{SAMPLES})",
                "value": round(rate, 2),
                "unit": "samples/s/chip",
                "seconds_per_transition": round(
                    dt / (CHAINS * (SAMPLES + WARMUP)), 5),
                "wallclock_incl_compile_s": round(dt, 1),
            }), flush=True)
            continue
        if sampler_name == "hmc":
            from gaplac_tpu.inference.chees import run_hmc
            LEAPS = int(os.environ.get("GAPLAC_SDE_LEAPFROGS", 16))
            run = jax.jit(
                lambda k, d: run_hmc(
                    k, lambda u: model.logdensity_data(u, d), q0, SAMPLES,
                    num_warmup=WARMUP, num_leapfrogs=LEAPS)
            )
            label = f"HMC({LEAPS} leapfrogs)"
        else:
            run = jax.jit(
                lambda k, d: run_chees(
                    k, lambda u: model.logdensity_data(u, d), q0, SAMPLES,
                    num_warmup=WARMUP)
            )
            label = "ChEES-HMC"
        r = run(jax.random.key(6), model.data)
        float(jnp.sum(r.positions))  # compile + host sync
        say(f"n={n_obs}: {label} compiled")
        t0 = time.time()
        r = run(jax.random.key(7), model.data)
        float(jnp.sum(r.positions))
        dt = time.time() - t0
        rate = CHAINS * (SAMPLES + WARMUP) / dt
        say(
            f"n={n_obs} chains={CHAINS} "
            f"accept={float(np.asarray(r.accept_prob).mean()):.2f} "
            f"T={float(getattr(r, 'traj_length', 0.0)):.2f} "
            f"eps={float(r.step_size):.4f}"
        )
        print(json.dumps({
            "metric": f"EXACT GP sampling, n={n_obs} obs "
                      f"(OU state-space marginal, {label} {CHAINS} chains)",
            "value": round(rate, 2),
            "unit": "samples/s/chip",
            "seconds_per_transition": round(
                dt / (CHAINS * (SAMPLES + WARMUP)), 5),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
