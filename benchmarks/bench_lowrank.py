"""Large-n low-rank path benchmark: logdensity+grad throughput at n >> dense.

The low-rank marginal (--approx rff; kernels/features.py + ops/lowrank.py) is
the framework's answer to the reference's dense-only O(n^3) FiniteGP math
(/root/reference/CLI/src/select.jl:49-50): every NUTS/SMC density evaluation
is O(n m^2) MXU matmuls + one m x m Cholesky.  This harness measures the
sampler hot op — value+grad of the low-rank marginal w.r.t. the lengthscale —
at observation counts where the dense path cannot even allocate its Gram
(n=65536 f32 -> 16 GB), plus the crossover ratio vs dense at a dense-feasible n.

Run on the real chip:  python benchmarks/bench_lowrank.py
Prints one JSON line per measurement.

Timing protocol (see .claude/skills/verify/SKILL.md): in-graph chaining with a
real data dependency + host-transfer sync — block_until_ready is async through
the axon tunnel and XLA partial-evaluates un-consumed results.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def chain_time_scalar(vgrad, u0, reps=8):
    """Time one value+grad eval: chain reps evals through a real data
    dependency on the previous eval's gradient."""

    @jax.jit
    def many(u):
        def body(c, _):
            v, g = vgrad(c)
            return c + 1e-30 * jnp.tanh(v + g), ()

        c, _ = lax.scan(body, u, None, length=reps)
        return jnp.sum(jnp.abs(c))

    float(many(u0))  # compile
    t0 = time.time()
    float(many(u0))
    return (time.time() - t0) / reps


def _model(kind, n, m, dtype=jnp.float32):
    """Build the (dense|rff) marginal logdensity for y ~| SqExp(:x), n obs.

    The dense density is constructed WITHOUT CompiledKernel.bind: bind bakes
    the theta-independent n x n distance structure into the program as a
    constant (a sampler-loop win at n<=1e3), which at bench sizes exceeds the
    axon remote-compile request limit (HTTP 413) — recompute the gram from X
    (n x 1, tiny) at runtime instead."""
    from types import SimpleNamespace

    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.model import (
        build_gaussian_marginal_lowrank,
        slot_groups_for,
    )
    from gaplac_tpu.inference.transforms import Interval
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops import mvn

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-5, 5, (n, 1)), dtype)
    y = jnp.asarray(rng.standard_normal(n), dtype)
    ck = compile_formula(parse_formula("y ~| SqExp(:x)").formula)
    groups = slot_groups_for(ck, ["x"])
    if kind == "dense":
        tr = Interval(0.0, 20.0)
        defaults = ck.default_params(dtype)
        slots = jnp.asarray(groups[0], dtype=jnp.int32)

        def logdensity(u):
            theta = tr.forward(u)
            p = defaults.at[slots].set(theta[0])
            K = ck.gram(p, X)
            return mvn.mvn_logpdf(K, y, jitter=1.1) + jnp.sum(tr.uniform_logprior(u))

        return SimpleNamespace(logdensity=logdensity)
    return build_gaussian_marginal_lowrank(ck, groups, X, y, num_features=m)


def main():
    small = "--small" in sys.argv  # CPU smoke mode
    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr)
    results = []
    u0 = jnp.asarray([0.3], jnp.float32)

    # 1. low-rank value+grad at scales the dense path cannot reach
    sizes = ((2048, 128),) if small else (
        (16384, 512), (65536, 512), (262144, 512), (65536, 2048))
    if "--crossover-only" in sys.argv:
        sizes = ()
    for n, m in sizes:
        print(f"# compiling rff n={n} m={m} ...", file=sys.stderr, flush=True)
        model = _model("rff", n, m)
        vgrad = jax.value_and_grad(model.logdensity)
        t = chain_time_scalar(vgrad, u0)
        # flop model: fwd A = Phi^T(Phi/d) 2nm^2 + chol m^3/3; bwd ~2x fwd
        fl = 3 * (2 * n * m * m + m**3 / 3)
        rec = {
            "metric": f"lowrank_vgrad n={n} m={m}",
            "value": round(1.0 / t, 1), "unit": "evals/s",
            "seconds": round(t, 5), "gflops": round(fl / t / 1e9, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # 2. crossover: dense vs low-rank at a dense-feasible n
    n, m = (1024, 128) if small else (8192, 512)
    dense = _model("dense", n, m)
    lr = _model("rff", n, m)
    td = chain_time_scalar(jax.value_and_grad(dense.logdensity), u0)
    tl = chain_time_scalar(jax.value_and_grad(lr.logdensity), u0)
    print(json.dumps({
        "metric": f"dense_vgrad n={n}", "value": round(1.0 / td, 2),
        "unit": "evals/s", "seconds": round(td, 5),
    }), flush=True)
    print(json.dumps({
        "metric": f"lowrank_speedup_vs_dense n={n} m={m}",
        "value": round(td / tl, 2), "unit": "x",
    }), flush=True)


if __name__ == "__main__":
    main()
