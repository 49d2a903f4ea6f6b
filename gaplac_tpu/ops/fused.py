"""Fused Gram -> Cholesky: factor K(θ) without ever materializing K.

Replaces the two-step ``K = gram(θ, X); L = cholesky(K)`` production pipeline
(the L1 hot path the reference outsources to AbstractGPs kernelmatrix +
LAPACK, abstractgp_translations.jl:45-69) with a LEFT-LOOKING panel
factorization whose K entries are generated on the fly:

    for each panel j (columns j0:j1, width B):
        P  = K[j0:, j0:j1]              # generated from X — never from HBM
        P -= L[j0:, :j0] @ L[j0:j1, :j0]^T     # one big MXU GEMM
        L[j0:j1, j0:j1] = chol(P[:B])          # blocked (ops/cholesky.py)
        L[j1:,  j0:j1] = P[B:] L11^{-T}        # recursive blocked trsm

Why this is the TPU-native shape of the fusion (VERDICT r1 item 1):
  - K is consumed exactly once by a left-looking factorization, so
    generating tiles inline removes the full n^2 HBM write + read of K;
  - only the LOWER-triangular panels are ever generated — half the
    transcendental (exp) work of a full symmetric gram;
  - the panel update is one large (n-j0, j0) x (j0, B) GEMM per panel —
    the same n^3/3 MXU FLOPs as the standalone factorization;
  - all shapes are static (Python-level panel loop), one jit compilation.

Gradients: a custom VJP reuses the standard Cholesky pullback (Murray 2016,
blocked solves) and pulls dK back through the gram with jax.vjp — the
backward materializes K's cotangent (unavoidable: dθ needs all of dK), so
grad cost matches the unfused path while the forward keeps the fusion win.

MEASURED OUTCOME (TPU v5e, benchmarks/results_v5e.txt round-2 section):
at equal matmul precision the fused forward never clearly beats the
two-step ``chol(gram())`` pipeline — 0.84x at n=8192 (DEFAULT), 0.93x
(HIGHEST), ~parity at n=4096/16384 (HIGH).  XLA already fuses the
elementwise gram into its first consumer, and left-looking re-reads the
whole left factor panel-by-panel, spending the HBM traffic the K
round-trip saved.  Therefore NOT routed into production (that pipeline
runs blocked-HIGH, ops/cholesky.py::PROD_PREC).  This module is kept as a
tested, differentiable opt-in whose real value is MEMORY: no n x n K
buffer alongside L, so the largest single-chip dense n grows ~sqrt(2)x.
Equivalence: tests/test_ops.py::test_fused_*.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gaplac_tpu.kernels.covariance import CompiledKernel
from gaplac_tpu.ops.cholesky import (
    _rtrsm_right_lt,
    adaptive_base,
    blocked_cholesky,
    blocked_solve_lower,
)

#: default panel width: wide enough that the per-panel GEMM saturates the
#: MXU, small enough that panel buffers ((n, B) f32) stay cheap
PANEL = 2048
_DEF_PREC = lax.Precision.HIGHEST

#: route the fused path at and above this n (below it, dispatch overhead of
#: the panel loop beats the saved gram; the registered blocked cholesky
#: threshold is 2048 — keep them aligned)
FUSED_MIN_N = 4096


def _panel_ranges(n: int, panel: int) -> Tuple[Tuple[int, int], ...]:
    return tuple((j0, min(j0 + panel, n)) for j0 in range(0, n, panel))


def _fused_chol_impl(
    ck: CompiledKernel,
    diag: float,
    panel: int,
    precision,
    params: jnp.ndarray,
    X: jnp.ndarray,
) -> jnp.ndarray:
    n = X.shape[0]
    dtype = X.dtype
    row_ids = jnp.arange(n, dtype=dtype)  # bare-Noise/Constant row identity
    cols: list[jnp.ndarray] = []  # k-th: L[k0:, k0:k1] block column
    ranges = _panel_ranges(n, panel)
    for j, (j0, j1) in enumerate(ranges):
        b = j1 - j0
        # on-the-fly lower gram panel K[j0:, j0:j1] (+ diag on its diagonal)
        P = ck.gram_cross_with_rowids(
            params, X[j0:], X[j0:j1], row_ids[j0:], row_ids[j0:j1]
        )
        if diag:
            P = P.at[jnp.arange(b), jnp.arange(b)].add(jnp.asarray(diag, dtype))
        if j0:
            # left-looking trailing update, one GEMM: L[j0:, :j0] @ L[j0:j1, :j0]^T
            left = jnp.concatenate([c[j0 - k0:] for (k0, _), c in zip(ranges, cols)], axis=1)
            P = P - jnp.matmul(left, left[:b].T, precision=precision)
        L11 = blocked_cholesky(P[:b], base=adaptive_base(b), precision=precision)
        if j1 < n:
            L21 = _rtrsm_right_lt(P[b:], L11, adaptive_base(b), precision)
            cols.append(jnp.concatenate([L11, L21], axis=0))
        else:
            cols.append(L11)
    L = jnp.zeros((n, n), dtype)
    for (k0, k1), c in zip(ranges, cols):
        L = L.at[k0:, k0:k1].set(c)
    return L


def _gram_full(ck: CompiledKernel, diag: float, params, X):
    """Materialized symmetric gram + diag — backward-pass reference only."""
    n = X.shape[0]
    K = ck.gram(params, X)
    if diag:
        K = K + jnp.asarray(diag, X.dtype) * jnp.eye(n, dtype=X.dtype)
    return K


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_gram_cholesky(
    ck: CompiledKernel,
    diag: float,
    panel: int,
    precision,
    params: jnp.ndarray,
    X: jnp.ndarray,
) -> jnp.ndarray:
    """L = chol(gram(params, X) + diag*I) with K generated tile-wise on the
    fly (never materialized).  ``ck``/``diag``/``panel``/``precision`` are
    static.  Differentiable in ``params`` and ``X``."""
    return _fused_chol_impl(ck, diag, panel, precision, params, X)


def _fused_fwd(ck, diag, panel, precision, params, X):
    L = _fused_chol_impl(ck, diag, panel, precision, params, X)
    return L, (L, params, X)


def _fused_bwd(ck, diag, panel, precision, res, Lbar):
    L, params, X = res
    n = L.shape[0]
    base = adaptive_base(n)
    # Cholesky pullback (Murray 2016): dK = 0.5 L^{-T} (P + P^T) L^{-1},
    # P = Phi(L^T Lbar) with Phi = tril, diagonal halved — blocked solves
    P = jnp.matmul(L.T, Lbar, precision=precision)
    P = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    S = P + P.T
    from gaplac_tpu.ops.cholesky import blocked_solve_upper

    tmp = blocked_solve_upper(L.T, S, base=base, precision=precision)  # L^-T S
    Z = blocked_solve_upper(L.T, tmp.T, base=base, precision=precision).T
    dK = 0.5 * Z
    # pull dK back through the (materialized) gram — dtheta needs every
    # entry of dK anyway, so the backward pays the n^2 buffer the forward saved
    _, vjp = jax.vjp(lambda p, x: _gram_full(ck, diag, p, x), params, X)
    dparams, dX = vjp(dK)
    return dparams, dX


fused_gram_cholesky.defvjp(_fused_fwd, _fused_bwd)


_LOG_2PI = math.log(2.0 * math.pi)


def mvn_logpdf_fused(
    ck: CompiledKernel,
    params: jnp.ndarray,
    X: jnp.ndarray,
    y: jnp.ndarray,
    diag: float,
    panel: int = PANEL,
    precision=_DEF_PREC,
) -> jnp.ndarray:
    """log N(y; 0, gram(params, X) + diag*I) through the fused factorization
    — the large-n dense marginal (build_gaussian_marginal / select
    --formulae) without materializing K."""
    L = fused_gram_cholesky(ck, diag, panel, precision, params, X)
    alpha = blocked_solve_lower(L, y, base=adaptive_base(L.shape[0]),
                                precision=precision)
    return (
        -0.5 * jnp.sum(alpha * alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * y.shape[0] * _LOG_2PI
    )
