"""Component benchmarks: Gram GB/s and Cholesky GFLOP/s vs roofline
(BASELINE.md "Gram + Cholesky throughput (GFLOP/s) at roofline" row).

Run on the real chip:  python benchmarks/bench_ops.py
Prints one JSON line per measurement.

Timing protocol (see .claude/skills/verify/SKILL.md): in-graph chaining with
a real data dependency + host-transfer sync — block_until_ready is async
through the axon tunnel and XLA partial-evaluates un-consumed results.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

# v5e roofline (BASELINE.md "GFLOP/s vs roofline" row): single-chip peaks.
# bf16 MXU peak 197 TF/s; HBM bandwidth 819 GB/s.  Multi-pass precisions
# EXECUTE more MXU FLOPs than the nominal n^3/3: DEFAULT = 1 bf16 pass,
# HIGH = 3 passes, HIGHEST = 6 passes — peak fractions are reported both
# nominal (algorithmic FLOPs) and executed (passes x nominal).
V5E_BF16_PEAK_GFLOPS = 197_000.0
V5E_HBM_GBPS = 819.0
_PASSES = {"hi": 3, "highest": 6, "fast": 1, "xla": 1}


def _emit(results, r):
    results.append(r)
    print(json.dumps(r), flush=True)


def chain_time(op, x, remake, reps=8):
    @jax.jit
    def many(x):
        def body(c, _):
            r = op(c)
            return remake(r, c), ()
        c, _ = lax.scan(body, x, None, length=reps)
        return jnp.sum(jnp.abs(c))
    float(many(x))
    t0 = time.time()
    float(many(x))
    return (time.time() - t0) / reps


def main(only=None):
    # section arg may carry sizes: e.g. "fused:8192" or "fused:4096,8192"
    sizes = None
    if only and ":" in only:
        only, sz = only.split(":", 1)
        sizes = tuple(int(v) for v in sz.split(","))
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.ops.cholesky import blocked_cholesky
    from gaplac_tpu.ops.gram import pallas_gram

    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr)
    results = []

    ck = compile_formula(
        parse_formula("y ~| SqExp(:t) * Cat(:g) + Linear(:x) + Noise").formula
    )
    p = ck.default_params(jnp.float32)

    for n in (sizes or (4096, 8192, 16384)) if only in (None, "gram") else ():
        X = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
        X[:, 1] = np.floor(np.abs(X[:, 1]) * 2)
        Xj = jnp.asarray(X)
        remake = lambda K, c: c + 1e-30 * jnp.exp(-jnp.abs(jnp.mean(K)))
        for name, op in (
            ("gram_xla", lambda x: ck.gram(p, x)),
            ("gram_pallas", lambda x: pallas_gram(ck, p, x)),
        ):
            t = chain_time(op, Xj, remake)
            gbs = n * n * 4 / t / 1e9
            _emit(results, {
                "metric": f"{name} n={n}", "value": round(gbs, 1),
                "unit": "GB/s(out)", "seconds": round(t, 5),
                "pct_hbm_peak": round(100 * gbs / V5E_HBM_GBPS, 1),
            })

    for n in ((sizes or (2048, 4096, 8192)) if only in (None, "chol") else ()):
        Xg = np.random.default_rng(0).normal(size=(n, 16)).astype(np.float32)
        K = jnp.asarray(Xg @ Xg.T / 16 + np.eye(n, dtype=np.float32))
        def remake_chol(L, c):
            M = L * lax.rsqrt(jnp.mean(L * L) + 1e-30)
            return jnp.matmul(M, M.T) * 0.001 + jnp.eye(n, dtype=jnp.float32)
        fl = n**3 / 3
        for name, op in (
            ("chol_xla", jnp.linalg.cholesky),
            ("chol_blocked_hi", lambda A: blocked_cholesky(A, base=256)),
            ("chol_blocked_fast", lambda A: blocked_cholesky(
                A, base=256, precision=lax.Precision.DEFAULT)),
        ):
            t = chain_time(op, K, remake_chol)
            gfs = fl / t / 1e9
            passes = _PASSES.get(name.rsplit("_", 1)[-1], 1)
            _emit(results, {
                "metric": f"{name} n={n}", "value": round(gfs, 1),
                "unit": "GFLOP/s", "seconds": round(t, 5),
                "pct_bf16_peak": round(100 * gfs / V5E_BF16_PEAK_GFLOPS, 2),
                "pct_bf16_peak_executed": round(
                    100 * passes * gfs / V5E_BF16_PEAK_GFLOPS, 2),
            })

    # ---- fused gram->cholesky vs the two-step production pipeline --------
    # (VERDICT r1 item 1) op is params -> L so every rep regenerates the
    # gram; remake perturbs params by an epsilon derived from mean|L| to
    # force full recompute with a live data dependency.
    from gaplac_tpu.ops.cholesky import adaptive_base
    from gaplac_tpu.ops.fused import fused_gram_cholesky

    for n in ((sizes or (4096, 8192, 16384)) if only in (None, "fused") else ()):
        X = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
        X[:, 1] = np.floor(np.abs(X[:, 1]) * 2)
        Xj = jnp.asarray(X)
        p0 = ck.default_params(jnp.float32)
        remake_p = lambda L, c: c + 1e-30 * jnp.exp(-jnp.abs(jnp.mean(L)))

        def pipe_blocked(p, prec=lax.Precision.HIGHEST):
            K = ck.gram(p, Xj) + 1.1 * jnp.eye(n, dtype=jnp.float32)
            return blocked_cholesky(K, base=adaptive_base(n), precision=prec)

        def pipe_xla(p):
            K = ck.gram(p, Xj) + 1.1 * jnp.eye(n, dtype=jnp.float32)
            return jnp.linalg.cholesky(K)

        for name, op in (
            ("pipe_gram+blocked_hi", pipe_blocked),
            ("pipe_gram+xla", pipe_xla),
            ("pipe_fused_hi", lambda p: fused_gram_cholesky(
                ck, 1.1, 2048, lax.Precision.HIGHEST, p, Xj)),
            ("pipe_fused_fast", lambda p: fused_gram_cholesky(
                ck, 1.1, 2048, lax.Precision.DEFAULT, p, Xj)),
        ):
            t = chain_time(op, p0, remake_p)
            gfs = n**3 / 3 / t / 1e9
            passes = _PASSES.get(name.rsplit("_", 1)[-1], 1)
            _emit(results, {
                "metric": f"{name} n={n}", "value": round(gfs, 1),
                "unit": "GFLOP/s(chol-equiv)", "seconds": round(t, 5),
                "pct_bf16_peak": round(100 * gfs / V5E_BF16_PEAK_GFLOPS, 2),
                "pct_bf16_peak_executed": round(
                    100 * passes * gfs / V5E_BF16_PEAK_GFLOPS, 2),
            })


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
