"""Pallas/blocked op equivalence tests (SURVEY.md §4: "Pallas-vs-XLA
equivalence tests").  The Pallas gram runs in interpret mode on the CPU test
mesh; the blocked Cholesky/trisolve recursion is exact mathematics and is
tested against jnp.linalg on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops.cholesky import (
    blocked_cholesky,
    blocked_solve_lower,
    blocked_solve_upper,
)
from gaplac_tpu.ops.gram import pallas_gram


@pytest.mark.parametrize("n", [100, 256, 500, 1000])
def test_blocked_cholesky_matches_lapack(n):
    rng = np.random.default_rng(n)
    Xg = rng.normal(size=(n, 16))
    A = jnp.asarray(Xg @ Xg.T / 16 + np.eye(n))
    L = blocked_cholesky(A, base=256)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), atol=1e-10)
    # zero above the diagonal (padding must not leak)
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_blocked_solves_match():
    n = 777
    rng = np.random.default_rng(7)
    Xg = rng.normal(size=(n, 16))
    A = jnp.asarray(Xg @ Xg.T / 16 + np.eye(n))
    L = jnp.linalg.cholesky(A)
    B = jnp.asarray(rng.normal(size=(n, 5)))
    from jax.scipy.linalg import solve_triangular

    np.testing.assert_allclose(
        np.asarray(blocked_solve_lower(L, B)),
        np.asarray(solve_triangular(L, B, lower=True)),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(blocked_solve_upper(L.T, B)),
        np.asarray(solve_triangular(L.T, B, lower=False)),
        atol=1e-9,
    )
    b = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(
        np.asarray(blocked_solve_lower(L, b)),
        np.asarray(solve_triangular(L, b, lower=True)),
        atol=1e-9,
    )


@pytest.fixture(scope="module")
def composite_ck():
    return compile_formula(
        parse_formula("y ~| SqExp(:t) * Cat(:g) + Linear(:x) + OU(:t2) + Noise").formula
    )


def _data(n, seed=0):
    X = np.random.default_rng(seed).normal(size=(n, 4))
    X[:, 1] = np.floor(np.abs(X[:, 1]) * 2)
    return jnp.asarray(X, jnp.float32)


def test_pallas_gram_interpret_symmetric(composite_ck):
    ck = composite_ck
    p = ck.default_params(jnp.float32).at[0].set(1.7).at[2].set(0.4)
    X = _data(300)
    Kp = pallas_gram(ck, p, X, interpret=True, tile=256)
    Kr = ck.gram(p, X)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kr), atol=1e-5)


def test_pallas_gram_interpret_cross(composite_ck):
    ck = composite_ck
    p = ck.default_params(jnp.float32)
    X1, X2 = _data(300), _data(129, seed=1)
    Kp = pallas_gram(ck, p, X1, X2, interpret=True, tile=256)
    Kr = ck.gram(p, X1, X2)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kr), atol=1e-5)
    # bare-Noise must contribute nothing across datasets
    assert Kp.shape == (300, 129)


def test_pallas_gram_nondivisible_padding(composite_ck):
    ck = composite_ck
    p = ck.default_params(jnp.float32)
    X = _data(257)  # forces one ragged tile
    Kp = pallas_gram(ck, p, X, interpret=True, tile=256)
    Kr = ck.gram(p, X)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kr), atol=1e-5)


def test_cholesky_small_batched_matches_native():
    """cholesky_small_batched: forward + custom VJP equal jnp.linalg.cholesky
    (general cotangents and θ-gradients through a symmetric gram)."""
    import numpy as np

    from gaplac_tpu.ops import cholesky as C

    rng = np.random.default_rng(0)
    B, n = 3, 37
    X = rng.normal(size=(B, n, n))
    A = jnp.asarray(X @ np.swapaxes(X, -1, -2) + n * np.eye(n))

    np.testing.assert_allclose(
        np.asarray(C.cholesky_small_batched(A)),
        np.asarray(jnp.linalg.cholesky(A)), rtol=1e-12, atol=1e-12,
    )
    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(jnp.linalg.cholesky(a))))(A)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(C.cholesky_small_batched(a))))(A)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-12)

    # θ-gradient through a symmetric gram construction (the sampler path)
    x = rng.uniform(-5, 5, 50)
    D2 = jnp.asarray((x[:, None] - x[None, :]) ** 2)[None].repeat(B, 0)
    z = jnp.asarray(rng.normal(size=(B, 50)))

    def h(fn):
        def f(ls):
            K = jnp.exp(D2 * (-0.5 / (ls[:, None, None] ** 2))) + 1.1 * jnp.eye(50)
            return jnp.sum(jnp.einsum("bij,bj->bi", fn(K), z) ** 2)
        return f

    ls = jnp.asarray(rng.uniform(1, 2, B))
    gn = jax.grad(h(jnp.linalg.cholesky))(ls)
    gc = jax.grad(h(C.cholesky_small_batched))(ls)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gc), rtol=1e-10)


def test_chol_batched_pallas_kernel_interpret():
    """The single-kernel batched Pallas factorization (interpret mode) equals
    the native factor on the unpadded block."""
    import numpy as np

    from gaplac_tpu.ops import cholesky as C

    rng = np.random.default_rng(1)
    B, n, pn = 2, 37, 128
    X = rng.normal(size=(B, n, n)).astype(np.float32)
    A = jnp.asarray(X @ np.swapaxes(X, -1, -2) + n * np.eye(n, dtype=np.float32))
    P = jnp.zeros((B, pn, pn), jnp.float32).at[:, :n, :n].set(A)
    P = P.at[:, jnp.arange(n, pn), jnp.arange(n, pn)].set(1.0)
    Lk = C._chol_batched_pallas(P, interpret=True)[:, :n, :n]
    np.testing.assert_allclose(
        np.asarray(Lk), np.asarray(jnp.linalg.cholesky(A)), rtol=1e-4, atol=1e-4
    )


def test_pallas_gram_interpret_extended_kernels():
    """Pallas tile path must cover Matern32/52, Periodic, RQ (regression:
    the extended kinds once NameError'd inside _leaf_tile, invisible to CPU
    tests because pallas_gram falls back to ck.gram off-TPU)."""
    ck = compile_formula(
        parse_formula(
            "y ~| Matern32(:t) + Matern52(:t2) * Periodic(:s; l=1.2, p=2.5)"
            " + RQ(:x; l=0.8, alpha=1.5)"
        ).formula
    )
    p = ck.default_params(jnp.float32).at[0].set(1.9)
    X = _data(200)
    Kp = pallas_gram(ck, p, X, interpret=True, tile=128)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(ck.gram(p, X)), atol=1e-5)
    X2 = _data(70, seed=2)
    Kc = pallas_gram(ck, p, X, X2, interpret=True, tile=128)
    np.testing.assert_allclose(np.asarray(Kc), np.asarray(ck.gram(p, X, X2)), atol=1e-5)


def test_solve_triangular_blocked_routing(monkeypatch):
    """solve_triangular routes large matrix-RHS solves through the blocked
    trsm once registered (and the result matches XLA's)."""
    from jax.scipy.linalg import solve_triangular as jsp_solve

    from gaplac_tpu.ops import linalg
    from gaplac_tpu.ops.cholesky import blocked_solve_lower, blocked_solve_upper

    rng = np.random.default_rng(0)
    n = 32
    A = rng.normal(size=(n, n))
    L = jnp.asarray(np.linalg.cholesky(A @ A.T + n * np.eye(n)))
    B = jnp.asarray(rng.normal(size=(n, 8)))
    try:
        linalg.register_blocked_solves(
            blocked_solve_lower, blocked_solve_upper, min_n=8, min_rhs=4
        )
        monkeypatch.setattr(linalg, "_on_tpu", lambda: True)
        got = linalg.solve_triangular(L, B, lower=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jsp_solve(L, B, lower=True)), atol=1e-9
        )
        got_u = linalg.solve_triangular(L.T, B, lower=False)
        np.testing.assert_allclose(
            np.asarray(got_u), np.asarray(jsp_solve(L.T, B, lower=False)), atol=1e-9
        )
        # vector RHS must stay on the XLA path (shape guard)
        v = linalg.solve_triangular(L, B[:, 0], lower=True)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(jsp_solve(L, B[:, 0], lower=True)), atol=1e-9
        )
    finally:
        linalg.register_blocked_solves(blocked_solve_lower, blocked_solve_upper)


# ---------------------------------------------------------------------------
# Fused gram->cholesky (ops/fused.py) — equivalence vs the two-step pipeline
# (measured slower/parity on v5e, kept as the memory-lean opt-in; see
# benchmarks/results_v5e.txt round-2 conclusions)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fused_setup():
    from gaplac_tpu.ops.fused import _gram_full

    ck = compile_formula(
        parse_formula("y ~| SqExp(:t) * Cat(:g) + Linear(:x) + Noise").formula
    )
    rng = np.random.default_rng(3)
    n = 900  # non-multiple of the panel: exercises the ragged last panel
    X = rng.normal(size=(n, 3))
    X[:, 1] = np.floor(np.abs(X[:, 1]) * 2)
    Xj = jnp.asarray(X)
    p = ck.default_params()
    K = _gram_full(ck, 1.1, p, Xj)
    y = jnp.asarray(rng.normal(size=n))
    return ck, p, Xj, K, y


def test_fused_gram_cholesky_matches_two_step(fused_setup):
    from jax import lax

    from gaplac_tpu.ops.fused import fused_gram_cholesky

    ck, p, Xj, K, y = fused_setup
    L = fused_gram_cholesky(ck, 1.1, 256, lax.Precision.HIGHEST, p, Xj)
    Lref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), atol=1e-10)
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_fused_logpdf_and_grad_match(fused_setup):
    from jax import lax

    from gaplac_tpu.ops.fused import _gram_full, mvn_logpdf_fused
    from gaplac_tpu.ops import mvn

    ck, p, Xj, K, y = fused_setup

    def lp_fused(pp):
        return mvn_logpdf_fused(ck, pp, Xj, y, 1.1, panel=256,
                                precision=lax.Precision.HIGHEST)

    def lp_plain(pp):
        return mvn.mvn_logpdf(_gram_full(ck, 1.1, pp, Xj), y)

    v1, g1 = jax.value_and_grad(lp_fused)(p)
    v2, g2 = jax.value_and_grad(lp_plain)(p)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)
