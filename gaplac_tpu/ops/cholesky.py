"""Blocked Cholesky + triangular solves for TPU (SURVEY.md §2.12 core-math).

XLA's native ``cholesky`` on this chip runs ~6-13x below matmul throughput
(measured: 18 TF/s effective vs 120 TF/s bf16 matmul at n=8192).  This module
rebuilds the factorization as a *recursive 2x2 blocked* algorithm whose FLOPs
are optimal (n^3/3) and live almost entirely in MXU matmuls:

    chol([[A11,  . ], [A21, A22]]):
        L11 = chol(A11)                     (recurse, n/2)
        L21 = A21 L11^{-T}                  (recursive triangular solve)
        L22 = chol(A22 - L21 L21^T)         (SYRK on MXU + recurse)

All shapes are static (halving recursion, Python-level), so one jit
compilation; the base case is a Pallas kernel factoring a VMEM-resident tile.
The triangular solve is likewise recursive (matmul-rich), replacing XLA's
sequential ``triangular_solve`` for large right-hand sides.

Matmul precision: trailing updates default to f32-accumulated
``preferred_element_type`` with HIGHEST precision (3-pass bf16) — configurable
via ``precision=`` for speed (DEFAULT = 1-pass bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:  # Pallas is TPU/Mosaic; fall back to XLA base case off-TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

BASE = 256          # base-case tile (VMEM resident: 256x256 f32 = 256 KB)
_DEF_PREC = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Base case: unblocked Cholesky of one VMEM tile (Pallas)
# ---------------------------------------------------------------------------


def _chol_tile_kernel(a_ref, out_ref):
    """Factor a (B, B) SPD tile in VMEM.

    Column-sweep with rank-1 trailing updates on the VPU: per column j,
    scale below-diagonal entries by 1/sqrt(d_j) and subtract the outer
    product from the trailing submatrix.  Dynamic column access goes through
    the output ref (``pl.ds``) — Pallas TPU cannot dynamic-slice values.
    """
    b = a_ref.shape[0]
    rows2 = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rows1 = lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    def body(j, a):
        colmask = cols2 == j
        col = jnp.sum(jnp.where(colmask, a, 0.0), axis=1, keepdims=True)   # (b,1)
        diag = jnp.sum(jnp.where(rows1 == j, col, 0.0))
        d = jnp.sqrt(jnp.maximum(diag, 1e-30))
        colj = jnp.where(rows1 > j, col / d, 0.0)         # exact div, not rsqrt
        colj = jnp.where(rows1 == j, d, colj)             # L[j,j] = sqrt(d)
        a = jnp.where(colmask, colj, a)                   # write column j
        # trailing -= colj colj^T (outer product on MXU, no transposes)
        upd = lax.dot_general(colj, colj, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        mask = (rows2 > j) & (cols2 > j)
        return a - jnp.where(mask, upd, 0.0)

    a = lax.fori_loop(0, b, body, a_ref[:])
    out_ref[:] = jnp.where(rows2 >= cols2, a, 0.0)


@functools.partial(jax.jit, static_argnames=())
def _chol_base_pallas(A: jnp.ndarray) -> jnp.ndarray:
    return pl.pallas_call(
        _chol_tile_kernel,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(A)


def _chol_sweep_lax(A: jnp.ndarray) -> jnp.ndarray:
    """Unblocked column-sweep Cholesky in PLAIN lax ops (same masked
    algorithm as ``_chol_tile_kernel``, but as a scan over columns instead
    of a Pallas kernel).  Pure HLO — no LAPACK/Mosaic custom call — so it
    vmaps into elementwise + batched-matmul ops that cannot hit the axon
    worker's batched-cholesky fault (see ``cholesky_nocc``).  Serial depth
    is the column count; use only where the factor cost is negligible."""
    b = A.shape[0]
    rows2 = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rows1 = jnp.arange(b)

    def body(a, j):
        colmask = cols2 == j
        col = jnp.sum(jnp.where(colmask, a, 0.0), axis=1)          # (b,)
        diag = jnp.sum(jnp.where(rows1 == j, col, 0.0))
        d = jnp.sqrt(jnp.maximum(diag, 1e-30))
        colj = jnp.where(rows1 > j, col / d, 0.0)
        colj = jnp.where(rows1 == j, d, colj)
        a = jnp.where(colmask, colj[:, None], a)
        upd = colj[:, None] * colj[None, :]
        mask = (rows2 > j) & (cols2 > j)
        return a - jnp.where(mask, upd, 0.0), None

    a, _ = lax.scan(body, A, jnp.arange(b))
    return jnp.where(rows2 >= cols2, a, 0.0)


def _chol_base(A: jnp.ndarray, base_impl) -> jnp.ndarray:
    # base_impl: "xla" (native custom call), "pallas", or "lax" (pure HLO);
    # legacy bool means use_pallas
    if base_impl in (True, "pallas") and _HAS_PALLAS and jax.default_backend() != "cpu":
        return _chol_base_pallas(A)
    if base_impl == "lax":
        return _chol_sweep_lax(A)
    return jnp.linalg.cholesky(A)


# ---------------------------------------------------------------------------
# Recursive blocked algorithms (static shapes; one jit)
# ---------------------------------------------------------------------------


def _rchol(A: jnp.ndarray, base: int, use_pallas: bool, precision) -> jnp.ndarray:
    n = A.shape[0]
    if n <= base:
        return _chol_base(A, use_pallas)
    h = _split_point(n, base)
    A11 = A[:h, :h]
    A21 = A[h:, :h]
    A22 = A[h:, h:]
    L11 = _rchol(A11, base, use_pallas, precision)
    L21 = _rtrsm_right_lt(A21, L11, base, precision)  # A21 L11^{-T}
    S = A22 - jnp.matmul(L21, L21.T, precision=precision)
    L22 = _rchol(S, base, use_pallas, precision)
    top = jnp.concatenate([L11, jnp.zeros((h, n - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _rtrsm_right_lt(B: jnp.ndarray, L: jnp.ndarray, base: int, precision) -> jnp.ndarray:
    """Solve X L^T = B for X (L lower-triangular): X = B L^{-T}.

    Recursive: with L = [[L11, 0], [L21, L22]],
      X1 = B1 L11^{-T}
      X2 = (B2 - X1 L21^T) L22^{-T}
    """
    n = L.shape[0]
    if n <= base:
        return lax.linalg.triangular_solve(
            L, B, left_side=False, lower=True, transpose_a=True
        )
    h = _split_point(n, base)
    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    B1, B2 = B[:, :h], B[:, h:]
    X1 = _rtrsm_right_lt(B1, L11, base, precision)
    X2 = _rtrsm_right_lt(B2 - jnp.matmul(X1, L21.T, precision=precision), L22, base, precision)
    return jnp.concatenate([X1, X2], axis=1)


def _rtrsm_left_lower(L: jnp.ndarray, B: jnp.ndarray, base: int, precision) -> jnp.ndarray:
    """Solve L X = B (L lower-triangular)."""
    n = L.shape[0]
    if n <= base:
        return lax.linalg.triangular_solve(L, B, left_side=True, lower=True)
    h = _split_point(n, base)
    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    B1, B2 = B[:h], B[h:]
    X1 = _rtrsm_left_lower(L11, B1, base, precision)
    X2 = _rtrsm_left_lower(L22, B2 - jnp.matmul(L21, X1, precision=precision), base, precision)
    return jnp.concatenate([X1, X2], axis=0)


def _rtrsm_left_upper(U: jnp.ndarray, B: jnp.ndarray, base: int, precision) -> jnp.ndarray:
    """Solve U X = B with U = L^T upper-triangular (for the second stage of
    SPD solves)."""
    n = U.shape[0]
    if n <= base:
        return lax.linalg.triangular_solve(U, B, left_side=True, lower=False)
    h = _split_point(n, base)
    U11, U12, U22 = U[:h, :h], U[:h, h:], U[h:, h:]
    B1, B2 = B[:h], B[h:]
    X2 = _rtrsm_left_upper(U22, B2, base, precision)
    X1 = _rtrsm_left_upper(U11, B1 - jnp.matmul(U12, X2, precision=precision), base, precision)
    return jnp.concatenate([X1, X2], axis=0)


def _split_point(n: int, base: int) -> int:
    """Largest multiple of ``base`` that is >= n/2 (keeps all blocks
    base-aligned when n is a multiple of base)."""
    h = ((n + 1) // 2 + base - 1) // base * base
    return min(h, n - base) if n > base else n


# ---------------------------------------------------------------------------
# Public API (with padding to multiples of BASE)
# ---------------------------------------------------------------------------


def blocked_cholesky(
    A: jnp.ndarray,
    base: int = BASE,
    use_pallas: bool = False,
    precision=_DEF_PREC,
) -> jnp.ndarray:
    """Lower Cholesky factor of SPD A; pads to a multiple of ``base`` with an
    identity tail (factor of the padded matrix is the padded factor)."""
    n = A.shape[0]
    pn = max(base, -(-n // base) * base)
    if pn != n:
        P = jnp.zeros((pn, pn), A.dtype)
        P = P.at[:n, :n].set(A)
        P = P.at[jnp.arange(n, pn), jnp.arange(n, pn)].set(1.0)
        return _rchol(P, base, use_pallas, precision)[:n, :n]
    return _rchol(A, base, use_pallas, precision)


def blocked_solve_lower(L: jnp.ndarray, B: jnp.ndarray, base: int = BASE,
                        precision=_DEF_PREC) -> jnp.ndarray:
    """L X = B (B may be a vector or matrix)."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    X = _rtrsm_left_lower(L, B, base, precision)
    return X[:, 0] if vec else X


def blocked_solve_upper(U: jnp.ndarray, B: jnp.ndarray, base: int = BASE,
                        precision=_DEF_PREC) -> jnp.ndarray:
    """U X = B with upper-triangular U."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    X = _rtrsm_left_upper(U, B, base, precision)
    return X[:, 0] if vec else X


# ---------------------------------------------------------------------------
# Small-n BATCHED Cholesky as ONE Pallas kernel (sampler hot path)
# ---------------------------------------------------------------------------
#
# At sampler sizes (n~500, a handful of chains) the backend is op-dispatch
# bound, not FLOP bound: XLA expands a (batched) cholesky into blocked while
# loops of dozens of HLO ops, each paying the dispatch floor inside the
# leapfrog scan.  Factoring each batch member entirely inside ONE Pallas
# kernel (column sweep in VMEM — the whole padded matrix fits easily)
# collapses those ops to a single call.  The custom VJP below implements the
# standard Cholesky pullback (Murray 2016) with two batched triangular
# solves, matching jnp.linalg.cholesky's gradient.
#
# MEASURED (TPU v5e, (8,500,500) f32, in-scan): this kernel 7.3 ms vs XLA
# batched cholesky 2.0 ms — the sequential VPU column sweep loses to XLA's
# MXU-blocked algorithm despite the op-count savings, so it is NOT routed by
# default.  Kept as a tested, differentiable opt-in for backends where the
# native batched-cholesky custom call is unavailable or unstable (this
# image's axon worker faults on it at >= ~16 chains at n=500).


def _chol_batched_kernel(a_ref, out_ref):
    """Factor one (1, pn, pn) SPD slab in VMEM (same column sweep as
    _chol_tile_kernel, batched via the grid)."""
    b = a_ref.shape[-1]
    rows2 = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rows1 = lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    def body(j, a):
        colmask = cols2 == j
        col = jnp.sum(jnp.where(colmask, a, 0.0), axis=1, keepdims=True)
        diag = jnp.sum(jnp.where(rows1 == j, col, 0.0))
        d = jnp.sqrt(jnp.maximum(diag, 1e-30))
        colj = jnp.where(rows1 > j, col / d, 0.0)
        colj = jnp.where(rows1 == j, d, colj)
        a = jnp.where(colmask, colj, a)
        upd = lax.dot_general(colj, colj, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        mask = (rows2 > j) & (cols2 > j)
        return a - jnp.where(mask, upd, 0.0)

    a = lax.fori_loop(0, b, body, a_ref[0])
    out_ref[0] = jnp.where(rows2 >= cols2, a, 0.0)


def _chol_batched_pallas(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, pn, pn) -> (B, pn, pn) lower factors, one grid step per batch
    member; pn must be a multiple of 128 (caller pads)."""
    nb, pn, _ = A.shape
    return pl.pallas_call(
        _chol_batched_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, pn, pn), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, pn, pn), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, pn, pn), A.dtype),
        interpret=interpret,
    )(A)


def _chol_small_fwd_impl(A: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky; Pallas single-kernel path on TPU, XLA native
    elsewhere.  A: (..., n, n)."""
    if not _HAS_PALLAS or jax.default_backend() == "cpu" or A.dtype != jnp.float32:
        return jnp.linalg.cholesky(A)
    n = A.shape[-1]
    pn = -(-n // 128) * 128
    batch = A.shape[:-2]
    Ab = A.reshape((-1, n, n))
    if pn != n:
        nb = Ab.shape[0]
        P = jnp.zeros((nb, pn, pn), A.dtype)
        P = P.at[:, :n, :n].set(Ab)
        idx = jnp.arange(n, pn)
        P = P.at[:, idx, idx].set(1.0)
        L = _chol_batched_pallas(P)[:, :n, :n]
    else:
        L = _chol_batched_pallas(Ab)
    return L.reshape(batch + (n, n))


@jax.custom_vjp
def cholesky_small_batched(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of (..., n, n) SPD matrices as one Pallas kernel per
    batch member — the op-count-minimal path for sampler-sized problems
    (n <= ~1k).  Differentiable via the standard Cholesky pullback."""
    return _chol_small_fwd_impl(A)


def _chol_small_fwd(A):
    L = _chol_small_fwd_impl(A)
    return L, L


def _chol_small_bwd(L, Lbar):
    # Murray (2016), "Differentiation of the Cholesky decomposition":
    #   P  = Phi(L^T Lbar)           Phi = tril with halved diagonal
    #   Ab = L^{-T} (P + P^T) L^{-1} / 2 ... symmetric convention; matches
    # jnp.linalg.cholesky's VJP for symmetric downstream use (tested).
    mT = lambda X: jnp.swapaxes(X, -1, -2)
    P = jnp.matmul(mT(L), Lbar)
    P = jnp.tril(P) - 0.5 * _batched_diag_embed(jnp.diagonal(P, axis1=-2, axis2=-1))
    S = P + mT(P)
    # Z = L^{-T} S L^{-1}: two batched triangular solves
    tmp = lax.linalg.triangular_solve(L, S, left_side=True, lower=True,
                                      transpose_a=True)           # L^{-T} S
    Z = lax.linalg.triangular_solve(L, tmp, left_side=False, lower=True,
                                    transpose_a=False)            # ... L^{-1}
    return (0.5 * Z,)


def _batched_diag_embed(d: jnp.ndarray) -> jnp.ndarray:
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


cholesky_small_batched.defvjp(_chol_small_fwd, _chol_small_bwd)


# ---------------------------------------------------------------------------
# Crash-safe batched Cholesky: NO custom calls anywhere (pure HLO)
# ---------------------------------------------------------------------------
#
# The axon TPU worker faults (kernel fault, ~30-60 min tunnel downtime) on
# XLA's BATCHED cholesky custom call: observed at >= ~16 chains n=500, at
# 8 chains m=512, and once at 4 chains m=512 (2026-08-20) — the vmapped
# low-rank capacitance factorization.  This path removes the custom call
# entirely: recursive 2x2 blocking (matmuls) down to a ``base`` tile
# factored by the plain-lax column sweep, so under vmap everything lowers
# to batched matmuls + elementwise HLO.  Serial depth = total column count
# (m scan steps); for the low-rank capacitance (m << n) the cost is
# negligible next to the 2 n m^2 feature matmuls.


def _chol_nocc_impl(A: jnp.ndarray, base: int) -> jnp.ndarray:
    n = A.shape[-1]
    if A.ndim > 2:
        batch = A.shape[:-2]
        L = jax.vmap(lambda M: _chol_nocc_impl(M, base))(A.reshape((-1, n, n)))
        return L.reshape(batch + (n, n))
    if n <= base:
        return _chol_sweep_lax(A)
    pn = -(-n // base) * base
    if pn != n:
        P = jnp.zeros((pn, pn), A.dtype)
        P = P.at[:n, :n].set(A)
        P = P.at[jnp.arange(n, pn), jnp.arange(n, pn)].set(1.0)
        return _rchol(P, base, "lax", lax.Precision.HIGHEST)[:n, :n]
    return _rchol(A, base, "lax", lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=None)
def _chol_nocc_for_base(base: int):
    @jax.custom_vjp
    def chol(A):
        return _chol_nocc_impl(A, base)

    def fwd(A):
        L = _chol_nocc_impl(A, base)
        return L, L

    def bwd(L, Lbar):
        return _chol_small_bwd(L, Lbar)  # same pullback (batched trsm is stable)

    chol.defvjp(fwd, bwd)
    return chol


def cholesky_nocc(A: jnp.ndarray, base: int = 128) -> jnp.ndarray:
    """Lower Cholesky of (..., n, n) SPD matrices with NO custom calls
    (vmap/batch-safe on backends whose native batched cholesky is unstable).
    Differentiable via the standard Cholesky pullback."""
    return _chol_nocc_for_base(int(base))(A)


def adaptive_base(n: int) -> int:
    """Block size scaling with n: the recursion emits O((n/base)^2) HLO ops,
    so a fixed base=256 explodes compile time beyond n~8k.  n/16 (power-of-2,
    >=256) keeps op count bounded while blocks stay MXU-sized."""
    b = 256
    while b * 16 < n:
        b *= 2
    return b


#: production matmul precision for the routed blocked factorization/solves.
#: MEASURED (v5e, n=8192, gram+chol pipeline, in-session): HIGH (3-pass bf16)
#: 11.1 ms vs HIGHEST (6-pass) 15.1 ms vs XLA native chol 13.5 ms, with
#: marginal-logpdf error vs the XLA f32 reference |dlp| <= 0.008 nats across
#: a lengthscale grid (DEFAULT 1-pass bf16 is 8.4 ms but errs up to ~1.0 nat
#: — too coarse to default; available via precision=).  HIGH is therefore
#: the accuracy-safe 1.36x-vs-HIGHEST / 1.21x-vs-XLA production setting.
PROD_PREC = lax.Precision.HIGH


def _auto_cholesky(A: jnp.ndarray) -> jnp.ndarray:
    return blocked_cholesky(A, base=adaptive_base(A.shape[0]), precision=PROD_PREC)


def _prod_solve_lower(L, B, **kw):
    kw.setdefault("precision", PROD_PREC)
    return blocked_solve_lower(L, B, **kw)


def _prod_solve_upper(U, B, **kw):
    kw.setdefault("precision", PROD_PREC)
    return blocked_solve_upper(U, B, **kw)


def register(min_n: int = 2048) -> None:
    """Route gaplac_tpu.ops.linalg.cholesky to the blocked kernel for
    n >= min_n on TPU, solve_triangular to the recursive blocked trsm
    for large matrix RHS — at PROD_PREC (see above) — and
    cholesky_batchsafe to the no-custom-call factorization (set
    GAPLAC_NATIVE_BATCHED_CHOL=1 to keep XLA's batched custom call)."""
    import os

    from gaplac_tpu.ops import linalg

    linalg.register_pallas_cholesky(_auto_cholesky, min_n=min_n)
    linalg.register_blocked_solves(_prod_solve_lower, _prod_solve_upper)
    if not os.environ.get("GAPLAC_NATIVE_BATCHED_CHOL"):
        linalg.register_batchsafe_cholesky(cholesky_nocc)
