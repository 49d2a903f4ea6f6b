"""Distributed large-n path: block-sharded Gram + distributed blocked
Cholesky / solves over a 1-D device mesh (SURVEY.md §2.4 "within-chain model
parallelism" and §5 "long-context" rows — the moral equivalent of sequence
parallelism here is blockwise streaming over K's row panels so no single
device holds the full n x n Gram).

Formulation: K is sharded by BLOCK-ROWS over mesh axis ``"data"``.  The
right-looking factorization runs as one SPMD program under ``shard_map``:

  per panel k (= device k's row block):
    1. the diagonal block reaches every device via a masked psum,
       which each device factors redundantly (tiny, avoids a broadcast root);
    2. each device trisolves its own panel rows locally;
    3. the full panel column is all-gathered over ICI and every device
       SYRK-updates its trailing block-row on the MXU (column-masked).

Collectives: one psum + one all_gather per panel, both riding ICI.  Works
identically on the virtual 8-device CPU mesh (tests) and a real slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gaplac_tpu.kernels.covariance import CompiledKernel


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devs, axis_names=("data",))


# ---------------------------------------------------------------------------
# Sharded Gram: each device builds its row block K[rows_d, :] locally
# ---------------------------------------------------------------------------


def sharded_gram(
    ck: CompiledKernel,
    params: jnp.ndarray,
    X: jnp.ndarray,
    mesh: Mesh,
    jitter: float = 0.0,
) -> jnp.ndarray:
    """K (+ jitter I), row-sharded over mesh axis "data".

    X is replicated (n x d is small); each device computes only its (n/P, n)
    row block — no device ever materializes the full Gram during
    construction, and the result stays sharded for the distributed solver.
    Bare-Noise row identity is handled via global row offsets.
    """
    n = X.shape[0]
    p = mesh.devices.size
    if n % p != 0:
        raise ValueError(f"n={n} must be divisible by the mesh size {p}")
    nb = n // p

    def local_block(X_local, X_full):
        d = lax.axis_index("data")
        row0 = d * nb
        K = ck.gram_cross_with_rowids(
            params, X_local, X_full,
            row_ids1=row0 + jnp.arange(nb, dtype=jnp.int32),
            row_ids2=jnp.arange(n, dtype=jnp.int32),
        )
        if jitter:
            cols = jnp.arange(n)
            K = K + jitter * (row0 + jnp.arange(nb)[:, None] == cols[None, :]).astype(K.dtype)
        return K

    fn = shard_map(
        local_block,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None)),
        out_specs=P("data", None),
    )
    return fn(X, X)


# ---------------------------------------------------------------------------
# Distributed blocked Cholesky (row-panel sharded)
# ---------------------------------------------------------------------------


def _dist_chol_local(K_local, nb: int, p: int, precision):
    """Per-device body under shard_map.  K_local: (nb, n) block-row."""
    n = nb * p
    d = lax.axis_index("data")
    row0 = jnp.asarray(d * nb, jnp.int32)
    local_rows = row0 + jnp.arange(nb)          # global row ids of this shard
    cols = jnp.arange(n)

    def panel_step(k, A):
        col0 = jnp.asarray(k * nb, jnp.int32)
        # (1) masked-psum the current diagonal block to every device
        mine = jnp.where(d == k, 1.0, 0.0).astype(A.dtype)
        diag_cand = lax.dynamic_slice(A, (jnp.int32(0), col0), (nb, nb)) * mine
        diag = lax.psum(diag_cand, "data")
        L_kk = jnp.linalg.cholesky(diag)

        # (2) local panel trisolve: rows with global id > panel rows
        panel_cols = lax.dynamic_slice(A, (jnp.int32(0), col0), (nb, nb))
        L_dk = lax.linalg.triangular_solve(
            L_kk, panel_cols, left_side=False, lower=True, transpose_a=True
        )
        is_owner = d == k
        below = local_rows[:, None] >= col0 + nb   # strictly-below-panel rows
        L_panel_local = jnp.where(is_owner, L_kk, jnp.where(below, L_dk, 0.0))
        # write the finished panel column into A
        A = lax.dynamic_update_slice(A, L_panel_local, (jnp.int32(0), col0))

        # (3) all-gather the panel column and SYRK-update trailing columns
        F = lax.all_gather(L_panel_local, "data", tiled=True)   # (n, nb)
        F_local = lax.dynamic_slice(F, (row0, jnp.int32(0)), (nb, nb))
        upd = jnp.matmul(F_local, F.T, precision=precision)     # (nb, n)
        trailing = (cols[None, :] >= col0 + nb) & (local_rows[:, None] > col0 + nb - 1)
        return A - jnp.where(trailing, upd, 0.0)

    A = lax.fori_loop(0, p, panel_step, K_local)
    # zero the strict upper triangle of the global matrix in this shard
    return jnp.where(local_rows[:, None] >= cols[None, :], A, 0.0)


def distributed_cholesky(
    K: jnp.ndarray,
    mesh: Mesh,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Cholesky of a (row-sharded or replicated) SPD matrix; returns L with
    the same row sharding.  n must divide the mesh size."""
    n = K.shape[0]
    p = mesh.devices.size
    if n % p != 0:
        raise ValueError(f"n={n} must be divisible by mesh size {p}")
    nb = n // p
    fn = shard_map(
        functools.partial(_dist_chol_local, nb=nb, p=p, precision=precision),
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P("data", None),
    )
    return fn(K)


# ---------------------------------------------------------------------------
# Distributed low-rank (feature-space) marginal — the multi-chip --approx rff
# path: Phi's ROWS are sharded over the mesh, the m x m capacitance matrix is
# psum-reduced, and no device ever holds more than (n/P, m) features.
# ---------------------------------------------------------------------------


def sharded_lowrank_logpdf(
    fm,
    params: jnp.ndarray,
    X: jnp.ndarray,
    extra_diag,
    y: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """log N(y; 0, Phi Phi^T + D) with observation rows sharded over "data".

    ``fm`` is a kernels/features.py FeatureMap; each device builds only its
    own (n/P, m) feature rows (phi is row-local — no cross-row terms), the
    capacitance A = I_m + Phi^T D^-1 Phi accumulates via ONE psum of an
    m x m partial, and the quadratic/logdet pieces reduce with scalar psums.
    D = extra_diag + bare-Noise diag.  Differentiable w.r.t. ``params``
    (collectives have transposes), so a multi-chip NUTS/ChEES logdensity can
    shard a single chain's observations — the within-chain model-parallel
    row of SURVEY.md §2.4 for the feature path, complementing the dense
    distributed_cholesky above.  Compute is O(n m^2 / P) per device; comms is
    one m x m psum riding ICI.
    """
    n = X.shape[0]
    p = mesh.devices.size
    if n % p != 0:
        raise ValueError(f"n={n} must be divisible by mesh size {p}")
    extra_diag = jnp.asarray(extra_diag)
    if extra_diag.ndim != 0:
        # a per-observation (n,) array is captured as a REPLICATED closure
        # constant inside shard_map and would broadcast against the (n/P,)
        # local noise diag; fold per-row terms into fm.noise_diag instead
        raise ValueError(
            "extra_diag must be a scalar (jitter + obs variance); "
            "per-observation diagonals belong in the FeatureMap's noise_diag"
        )
    m = fm.m_total
    _log2pi = float(np.log(2.0 * np.pi))

    def local(params_r, X_l, y_l):
        phi_l = fm.phi(params_r, X_l)                     # (n/P, m)
        d_l = extra_diag + fm.noise_diag(params_r, X_l)
        pod = phi_l / d_l[:, None]
        A = jnp.eye(m, dtype=phi_l.dtype) + lax.psum(phi_l.T @ pod, "data")
        A = 0.5 * (A + A.T)
        R = jnp.linalg.cholesky(A)                        # replicated, tiny
        b = lax.psum(pod.T @ y_l, "data")                 # (m,)
        u = lax.linalg.triangular_solve(
            R, b[:, None], left_side=True, lower=True
        )[:, 0]
        quad = lax.psum(jnp.sum(y_l * y_l / d_l), "data") - jnp.sum(u * u)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(R))) + lax.psum(
            jnp.sum(jnp.log(d_l)), "data"
        )
        return -0.5 * (quad + logdet + n * _log2pi)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None), P("data", None), P("data")),
        out_specs=P(),
    )
    return fn(params, X, y)


def distributed_solve_lower(L: jnp.ndarray, b: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Solve L x = b with L row-sharded: block forward substitution.

    Per panel k: owner's rows solve locally; the solved sub-vector is
    psum-broadcast; every later row block folds the contribution into its
    residual.  O(P) rounds, one psum each.
    """
    n = L.shape[0]
    p = mesh.devices.size
    nb = n // p

    def local(L_local, b_full):
        d = lax.axis_index("data")
        row0 = jnp.asarray(d * nb, jnp.int32)
        b_local = lax.dynamic_slice(b_full, (row0,), (nb,))

        def step(k, carry):
            x_full, resid_local = carry
            col0 = jnp.asarray(k * nb, jnp.int32)
            L_kk = lax.dynamic_slice(L_local, (jnp.int32(0), col0), (nb, nb))
            # non-owners hold zeros here (upper triangle) -> guard the
            # diagonal so their (masked-away) solve stays finite
            L_kk_safe = jnp.where(d == k, L_kk, jnp.eye(nb, dtype=L_kk.dtype))
            xk_cand = lax.linalg.triangular_solve(
                L_kk_safe, resid_local[:, None], left_side=True, lower=True
            )[:, 0]
            mine = jnp.where(d == k, 1.0, 0.0).astype(L_local.dtype)
            xk = lax.psum(xk_cand * mine, "data")
            x_full = lax.dynamic_update_slice(x_full, xk, (col0,))
            # fold into local residual for later panels
            L_colk = lax.dynamic_slice(L_local, (jnp.int32(0), col0), (nb, nb))
            resid_local = resid_local - jnp.where(
                d > k, L_colk @ xk, jnp.zeros_like(resid_local)
            )
            return x_full, resid_local

        x_full = jnp.zeros((n,), L_local.dtype)
        x_full, _ = lax.fori_loop(0, p, step, (x_full, b_local))
        return x_full

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P(None)),
        out_specs=P(None),
    )
    return fn(L, b)
