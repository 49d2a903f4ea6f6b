"""Forward-only state-space SMOOTHING/PREDICTION at large n (TPU).

The gradient path of the matrix-state filter stores (chains, n, d, d) scan
elements, which caps the quasi-periodic d=42 block at n=16384 on a 16 GB
chip (results_v5e.txt round-4).  Prediction needs NO reverse pass: this
times the full posterior-predictive pipeline — filter + RTS smoother +
per-point predictive mean/var (ops/markov_ss.py::ss_smooth/ss_predict
machinery as driven by `gaplac predict --approx sde`) — forward-only, where
memory is O(n d^2) and n two orders beyond the dense-Cholesky ceiling fits
comfortably.

Env knobs: GAPLAC_SDEP_FORMULA (default quasi-periodic Periodic*Matern32),
GAPLAC_SDEP_STAGES (default 16384,131072).  Prints BENCH-style JSON lines.
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


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops import markov_ss as mss

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    say(f"backend={backend}")

    formula = os.environ.get(
        "GAPLAC_SDEP_FORMULA", "y ~| Periodic(:x; p=3.0) * Matern32(:x)")
    stages = tuple(int(s) for s in os.environ.get(
        "GAPLAC_SDEP_STAGES", f"{1 << 14},{1 << 17}").split(","))
    spec = parse_formula(formula)
    ck = compile_formula(spec.formula)

    for n in stages:
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0, 500.0, n))
        y = np.sin(2 * np.pi * x / 3.0) * np.exp(-0.1 * x % 1) \
            + rng.normal(0, 0.3, n)
        X = jnp.asarray(x[:, None], dtype)
        if ck.n_leaves > 1:
            X = jnp.broadcast_to(X, (n, ck.n_leaves))
        model = build_model(ck, ["x"], X, jnp.asarray(y, dtype),
                            spec.likelihood, approx="sde")
        d = model.data

        # the predict pipeline: build steps -> smooth -> H·m_s and pointwise
        # predictive variance (what predict_cmd evaluates per chain draw)
        from gaplac_tpu.inference.model import (
            _markov_structure, markov_param_vals)

        st = _markov_structure(ck, np.asarray(X))
        kindsT = tuple(b[0] for b in st.blocks)

        # GAPLAC_SDEP_WINDOW chunks the smoother (ss_smooth_windowed):
        # compile cost independent of n — the d=42 n=2^17 MONOLITHIC
        # program never finished compiling (35 min, abandoned; round 4)
        window = int(os.environ.get("GAPLAC_SDEP_WINDOW", "0"))
        overlap = int(os.environ.get("GAPLAC_SDEP_OVERLAP", "0")) \
            or max(1, window // 8)

        @jax.jit
        def smooth_predict(p, data):
            if window and n > window:
                mean, var = mss.ss_smooth_windowed(
                    kindsT, markov_param_vals(ck, st, p, dtype),
                    data["ts"], list(data["xs"]), data["ys"], 0.1, None,
                    data["resets"], window, overlap)
                return mean, var
            A, Q, H = mss.build_steps(
                kindsT, markov_param_vals(ck, st, p, dtype),
                data["ts"], data["xs"], resets=data["resets"])
            m_s, P_s = mss.ss_smooth(A, Q, H, data["ys"], 0.1)
            mean = jnp.einsum("nd,nd->n", H, m_s)
            var = jnp.einsum("nd,nde,ne->n", H, P_s, H)
            return mean, var

        p0 = ck.default_params(dtype)
        mean, var = smooth_predict(p0, d)
        float(jnp.sum(mean) + jnp.sum(var))
        say(f"n={n}: compiled")
        t0 = time.time()
        mean, var = smooth_predict(p0, d)
        s = float(jnp.sum(mean) + jnp.sum(var))
        dt = time.time() - t0
        assert np.isfinite(s)
        wtag = (f", windowed W={window}/V={overlap}"
                if window and n > window else "")
        print(json.dumps({
            "metric": f"sde posterior smooth+predict (forward-only), "
                      f"{formula.split('~|')[1].strip()}, n={n}{wtag}",
            "value": round(n / dt, 1),
            "unit": "obs/s",
            "seconds": round(dt, 4),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
