"""Linear-algebra backend seam: XLA (jnp) now, Pallas blocked kernels for
large problems on TPU (gaplac_tpu.ops.cholesky) once registered.

The reference delegates all of this to Julia's LAPACK via AbstractGPs
(SURVEY.md §1 L1 boundary); here it is a first-class component
(SURVEY.md §2.12 core-math rows).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular as _jsp_solve_triangular

# Registered Pallas overrides: set by gaplac_tpu.ops.cholesky when available.
_pallas_cholesky: Optional[Callable] = None
_pallas_min_n: int = 1024
_blocked_solve_lower: Optional[Callable] = None
_blocked_solve_upper: Optional[Callable] = None
_solve_min_n: int = 4096
_solve_min_rhs: int = 128


def register_pallas_cholesky(fn: Callable, min_n: int = 1024) -> None:
    global _pallas_cholesky, _pallas_min_n
    _pallas_cholesky = fn
    _pallas_min_n = min_n


def register_blocked_solves(
    lower: Callable, upper: Callable, min_n: int = 4096, min_rhs: int = 128
) -> None:
    """Route solve_triangular through the recursive blocked trsm for large
    matrix right-hand sides on TPU (measured v5e: 1.3x XLA at n=4096,
    matrix RHS; parity at 2048 — see benchmarks/results_v5e.txt)."""
    global _blocked_solve_lower, _blocked_solve_upper, _solve_min_n, _solve_min_rhs
    _blocked_solve_lower = lower
    _blocked_solve_upper = upper
    _solve_min_n = min_n
    _solve_min_rhs = min_rhs


_batchsafe_cholesky: Optional[Callable] = None


def register_batchsafe_cholesky(fn: Callable) -> None:
    """Route ``cholesky_batchsafe`` through a pure-HLO factorization (no
    LAPACK/custom-call) on TPU — the native BATCHED cholesky custom call
    faults this image's axon worker (kernel fault; CLAUDE.md)."""
    global _batchsafe_cholesky
    _batchsafe_cholesky = fn


_batchsafe_default = False


def set_batchsafe_default(on: bool) -> None:
    """Trace-time switch: when on, ``cholesky`` routes SMALL factorizations
    (below the blocked-kernel threshold — exactly the ones that appear
    BATCHED under a multi-chain vmap) through the pure-HLO no-custom-call
    path.  Enables chain counts past the axon worker's batched-cholesky
    fault threshold (>= ~16 chains at n=500).  Set before jit tracing
    (e.g. mcmc --chains > 8 on TPU does this automatically)."""
    global _batchsafe_default
    _batchsafe_default = bool(on)


def cholesky_batchsafe(K: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky for matrices that are (or may be vmapped into) a
    BATCH of small factorizations — e.g. the low-rank capacitance matrix
    under multi-chain samplers.  On TPU with a registered pure-HLO
    implementation, avoids the batched-cholesky custom call entirely; the
    serial column sweep costs O(m) scan steps, negligible next to the
    2 n m^2 feature matmuls that dominate the low-rank path."""
    if _batchsafe_cholesky is not None and _on_tpu():
        return _batchsafe_cholesky(K)
    return jnp.linalg.cholesky(K)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def cholesky(K: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor. Routes to the Pallas blocked kernel for large
    symmetric problems on TPU, else XLA's native cholesky."""
    n = K.shape[-1]
    if (
        _pallas_cholesky is not None
        and K.ndim == 2
        and n >= _pallas_min_n
        and _on_tpu()
    ):
        return _pallas_cholesky(K)
    if _batchsafe_default and _batchsafe_cholesky is not None and _on_tpu():
        return _batchsafe_cholesky(K)
    return jnp.linalg.cholesky(K)


def solve_triangular(L: jnp.ndarray, b: jnp.ndarray, lower: bool = True) -> jnp.ndarray:
    """Triangular solve. Routes to the recursive blocked trsm for large
    matrix right-hand sides on TPU (XLA's triangular_solve is sequential in
    the RHS panel), else XLA's native op."""
    fn = _blocked_solve_lower if lower else _blocked_solve_upper
    if (
        fn is not None
        and L.ndim == 2
        and b.ndim == 2
        and L.shape[-1] >= _solve_min_n
        and b.shape[-1] >= _solve_min_rhs
        and _on_tpu()
    ):
        return fn(L, b)
    return _jsp_solve_triangular(L, b, lower=lower)
