"""Pallas tiled Gram-matrix builder (SURVEY.md §2.12 core-math row 2).

Replaces AbstractGPs' ``kernelmatrix`` with a single fused TPU kernel: one
grid step computes one (T, T) tile of K, evaluating EVERY term of the
compiled formula's sum-of-products in VMEM — no (n, n) intermediates are
ever materialized in HBM (the pure-jnp path in kernels/covariance.py builds
one broadcast difference per leaf and relies on XLA fusion; here the fusion
is explicit and guaranteed, single HBM pass, one output write).

Layout (transpose-free): the ROW side streams in natural (n, d) layout so a
feature column is a static (T, 1) slice; the COLUMN side streams transposed
(d, n) so a feature column is a static (1, T) slice.  Broadcasting the two
gives the (T, T) pairwise tile directly on the VPU.  Per-leaf hyperparameters
ride in SMEM.  The kernel structure (leaf kinds / columns / term groupings)
is STATIC, baked into the kernel closure at trace time.

MEASURED OUTCOME (v5e, benchmarks/results_v5e.txt): 15-36% SLOWER than the
pure-jnp gram at every size — XLA's automatic fusion of the elementwise
kernel math into its consumer already achieves the single-pass behavior
this kernel guarantees by hand, with better pipelining.  NOT routed into
production (covariance.py::gram/bind is the production gram; the fused
gram->cholesky experiment in ops/fused.py reached the same conclusion).
Kept as a tested reference Pallas kernel for backends where XLA's fusion
is unavailable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gaplac_tpu.kernels.covariance import (
    _SQRT3,
    _SQRT5,
    CompiledKernel,
    K_CAT,
    K_CONST,
    K_LINEAR,
    K_MATERN32,
    K_MATERN52,
    K_NOISE,
    K_OU,
    K_PERIODIC,
    K_RQ,
    K_SQEXP,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

TILE = 256
_LANE = 128  # row-side feature padding (lane dimension granularity)


def _leaf_tile(kind: int, x1, x2, p, extra=()):
    """One leaf's (T1, T2) tile from x1: (T1, 1) and x2: (1, T2)."""
    if kind == K_SQEXP:
        d = x1 - x2
        return jnp.exp(d * d * (-0.5 / (p * p)))
    if kind == K_OU:
        return jnp.exp(jnp.abs(x1 - x2) * (-1.0 / p))
    if kind == K_LINEAR:
        return x1 * x2 + p
    if kind == K_CAT:
        return (x1 == x2).astype(jnp.float32)
    if kind == K_NOISE:
        return p * (x1 == x2).astype(jnp.float32)
    if kind == K_MATERN32:
        r = _SQRT3 * jnp.abs(x1 - x2) / p
        return (1.0 + r) * jnp.exp(-r)
    if kind == K_MATERN52:
        r = _SQRT5 * jnp.abs(x1 - x2) / p
        return (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    if kind == K_PERIODIC:
        s = jnp.sin(jnp.pi * (x1 - x2) / extra[0]) ** 2
        return jnp.exp(-2.0 * s / (p * p))
    if kind == K_RQ:
        d = x1 - x2
        return (1.0 + d * d / (2.0 * extra[0] * p * p)) ** (-extra[0])
    raise ValueError(kind)


def _make_gram_kernel(ck: CompiledKernel, symmetric: bool, t1: int, t2: int):
    kinds, cols, terms = ck.kinds, ck.cols, ck.terms

    def kernel(params_ref, x1_ref, x2t_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # global row/col ids for bare-Noise row-identity terms
        r1 = i * t1 + lax.broadcasted_iota(jnp.int32, (t1, 1), 0)
        r2 = j * t2 + lax.broadcasted_iota(jnp.int32, (1, t2), 1)

        acc = jnp.zeros((t1, t2), jnp.float32)
        for term in terms:
            block = None
            for li in term:
                c = cols[li]
                p = params_ref[0, li]
                if c >= 0:
                    x1 = x1_ref[:, c : c + 1]        # (t1, 1) natural layout
                    x2 = x2t_ref[c : c + 1, :]       # (1, t2) transposed layout
                    b = _leaf_tile(kinds[li], x1, x2, p, ck._extra(li))
                elif kinds[li] == K_CONST:
                    b = jnp.full((t1, t2), 1.0) * p
                elif symmetric:                      # bare Noise: row identity
                    b = p * (r1 == r2).astype(jnp.float32)
                else:                                # white noise never crosses
                    b = jnp.zeros((t1, t2), jnp.float32)
                block = b if block is None else block * b
            acc = acc + block
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def _pad_rows(X: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(n, d) -> (n_pad, LANE) natural layout, zero-padded."""
    n, d = X.shape
    npad = -(-n // tile) * tile
    out = jnp.zeros((npad, _LANE), X.dtype)
    if d > 0:
        out = out.at[:n, :d].set(X)
    return out


def _pad_cols(X: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(n, d) -> (max(d,1) sublane-padded, n_pad) transposed layout."""
    n, d = X.shape
    npad = -(-n // tile) * tile
    d_eff = max(8, d)  # sublane granularity
    out = jnp.zeros((d_eff, npad), X.dtype)
    if d > 0:
        out = out.at[:d, :n].set(X.T)
    return out


@functools.partial(jax.jit, static_argnames=("ck", "symmetric", "tile", "interpret"))
def _pallas_gram_padded(ck: CompiledKernel, params, X1p, X2t, symmetric: bool, tile: int,
                        interpret: bool = False):
    n1p = X1p.shape[0]
    d_eff, n2p = X2t.shape
    kernel = _make_gram_kernel(ck, symmetric, tile, tile)
    grid = (n1p // tile, n2p // tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), X1p.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, max(ck.n_leaves, 1)), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_eff, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params.reshape(1, -1).astype(X1p.dtype), X1p, X2t)


def pallas_gram(
    ck: CompiledKernel,
    params: jnp.ndarray,
    X1: jnp.ndarray,
    X2: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Gram matrix via the fused Pallas kernel; falls back to the pure-jnp
    builder off-TPU (or runs the kernel in interpret mode when
    ``interpret=True`` — used by CPU equivalence tests).  Semantics identical
    to ``ck.gram`` (tests assert equivalence)."""
    on_cpu = jax.default_backend() == "cpu"
    if not _HAS_PALLAS or (on_cpu and not interpret):
        return ck.gram(params, X1, X2)
    interpret = bool(interpret) if interpret is not None else False
    symmetric = X2 is None
    n1 = X1.shape[0]
    n2 = n1 if symmetric else X2.shape[0]
    X1p = _pad_rows(X1, tile)
    X2t = _pad_cols(X1 if symmetric else X2, tile)
    K = _pallas_gram_padded(ck, params, X1p, X2t, symmetric, tile, interpret)
    return K[:n1, :n2]
