"""Staged bisect of the axon-worker fault in the multi-chain low-rank path.

Each stage escalates one axis (vmap, grad, n, full sampler) and host-syncs
with a DONE line, so a single worker crash identifies the first faulting
stage.  Run ONLY when you can afford ~30-60 min tunnel downtime; one crash
per run by design.

Context (2026-08-20): bench_large_n.py (ChEES, 4 chains, n=65536, m=512)
kills the worker even with the capacitance cholesky routed through the
custom-call-free ops/cholesky.py::cholesky_nocc — so the original
"batched cholesky custom call" attribution (CLAUDE.md) is incomplete.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_BIG = 65536
M = 512
CHAINS = 4


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.kernels.covariance import compile_formula

    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def make_model(n):
        x = rng.uniform(-5, 5, n)
        y = np.sin(x / 1.5) + rng.normal(0, 1.0, n)
        spec = parse_formula("y ~| SqExp(:x)")
        return build_model(
            compile_formula(spec.formula), ["x"],
            jnp.asarray(x[:, None], dtype), jnp.asarray(y, dtype),
            spec.likelihood, approx="rff", rff_features=M,
        )

    def scan_eval(fn, qs, iters=10):
        @jax.jit
        def run(qs):
            def body(c, _):
                v = jax.vmap(fn)(qs + 1e-6 * c)
                return jnp.sum(v if v.ndim <= 1 else v[..., 0]) * 1e-9, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c
        return float(run(qs))

    # stage 1: vmapped VALUE at small n
    m1 = make_model(8192)
    q1 = jax.vmap(m1.initial_position)(jax.random.split(jax.random.key(1), CHAINS))
    scan_eval(m1.logdensity, q1)
    say("DONE stage1: vmapped value n=8192")

    # stage 2: vmapped GRAD at small n (chol pullback -> batched trsm)
    scan_eval(jax.grad(m1.logdensity), q1)
    say("DONE stage2: vmapped grad n=8192")

    # stage 3: vmapped value+grad at n=65536
    mb = make_model(N_BIG)
    qb = jax.vmap(mb.initial_position)(jax.random.split(jax.random.key(2), CHAINS))
    scan_eval(mb.logdensity, qb)
    say("DONE stage3a: vmapped value n=65536")
    scan_eval(jax.grad(mb.logdensity), qb)
    say("DONE stage3b: vmapped grad n=65536")

    # stage 4: tiny ChEES at n=65536 (adaptation machinery on top)
    from gaplac_tpu.inference.chees import run_chees

    r = jax.jit(lambda k: run_chees(k, mb.logdensity, qb, 5, num_warmup=5))(
        jax.random.key(3)
    )
    float(jnp.sum(r.positions))
    say("DONE stage4: ChEES 5+5 n=65536")

    # stage 5: longer ChEES (the bench's 100+100)
    r = jax.jit(lambda k: run_chees(k, mb.logdensity, qb, 100, num_warmup=100))(
        jax.random.key(4)
    )
    float(jnp.sum(r.positions))
    say("DONE stage5: ChEES 100+100 n=65536 — full bench path survives")


if __name__ == "__main__":
    sys.exit(main())
