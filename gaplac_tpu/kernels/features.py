"""Feature-map compiler: CompiledKernel -> Phi(params, X) with K ~ Phi Phi^T.

The low-rank companion to kernels/covariance.py.  Every formula the DSL can
express (SURVEY.md §2.2 grammar) lowers to an (n, m) feature matrix whose
outer product approximates — or for finite-rank leaves, EXACTLY equals — the
dense gram, so the whole inference stack can run in the O(n m^2) weight-space
ops of ops/lowrank.py.  This is the TPU-first scaling path: Phi construction
and all downstream algebra are large dense matmuls (MXU-shaped), no n x n
matrix is ever formed.

Per-leaf feature maps:
  SqExp/OU/Matern32/Matern52/RQ — random Fourier features (Rahimi & Recht):
      phi_j(x) = sqrt(2/m) cos(w0_j x / l + b_j)
    with base frequencies w0 drawn ONCE from the kernel's spectral density at
    unit lengthscale (Gaussian / Cauchy / Student-t(3) / Student-t(5) /
    Gaussian scale-mixture with Gamma(alpha, alpha) precision), so the
    sampled lengthscale enters only through the differentiable 1/l scaling.
  Periodic(p; l) — exact warp to u(x) = (cos 2pi x/p, sin 2pi x/p): the
    periodic kernel is the SqExp kernel on u with the same lengthscale, so
    2-D RFF on u is unbiased for it.
  Linear(c)   — EXACT: phi = [x, sqrt(c)]              (k = x x' + c)
  Constant(c) — EXACT: phi = [sqrt(c)]
  Cat(v)      — EXACT: one-hot over the category vocabulary
  Noise(v)    — EXACT: sqrt(s2) * one-hot(v)           (k = s2 1[v==v'])
  bare Noise  — rank-n diagonal, NOT a feature: any product term containing
    it contributes only to the symmetric covariance diagonal
    (``noise_diag``), and nothing to cross covariances — identical to the
    dense path's row-identity semantics (covariance.py::gram).

Products (tensor-product terms) are row-wise Khatri-Rao products of the leaf
features (E[(a ox b)(a ox b)^T] = E[a a^T] . E[b b^T] for independent draws);
sums concatenate along the feature axis.  Finite-rank-only formulas (Linear/
Constant/Cat/Noise compositions — e.g. the reference's legacy composite model
Cat*Cat + Cat + Linear + Noise, test/oldtests.jl:25) are therefore EXACT at
tiny m, and tests assert equality with the dense gram to float tolerance.

Category vocabularies are collected from the concrete data at build time
(train + any prediction inputs); unseen categories at apply time map to the
zero vector (k = 0 against everything — a documented deviation from the dense
path, which would return 1 for two EQUAL unseen categories).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gaplac_tpu.kernels.covariance import (
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
    KIND_NAMES,
    _leaf_diag,
)

#: stationary leaves approximated by random Fourier features
RFF_KINDS = (K_SQEXP, K_OU, K_MATERN32, K_MATERN52, K_RQ, K_PERIODIC)


def _draw_base_frequencies(
    rng: np.random.Generator, kind: int, m: int, extra: Tuple[float, ...]
) -> np.ndarray:
    """Base frequencies at unit lengthscale; the live lengthscale scales them
    by 1/l inside phi (differentiable w.r.t. l)."""
    if kind == K_SQEXP:
        return rng.standard_normal(m)
    if kind == K_OU:  # Matern nu=1/2: Cauchy (Lorentzian spectrum)
        return rng.standard_cauchy(m)
    if kind == K_MATERN32:  # nu=3/2 -> Student-t, df = 2 nu = 3
        return rng.standard_t(3.0, m)
    if kind == K_MATERN52:  # nu=5/2 -> df = 5
        return rng.standard_t(5.0, m)
    if kind == K_RQ:
        # RQ(alpha) = E_s[SqExp with precision s], s ~ Gamma(alpha, rate=alpha)
        alpha = extra[0]
        s = rng.gamma(alpha, 1.0 / alpha, m)
        return rng.standard_normal(m) * np.sqrt(s)
    if kind == K_PERIODIC:  # 2-D Gaussian on the warped circle coords
        return rng.standard_normal((m, 2))
    raise ValueError(f"kind {kind} has no spectral sampler")


@dataclass(frozen=True)
class FeatureMap:
    """Compiled feature map.  ``phi(params, X)`` -> (n, m_total); jit/grad/
    vmap-safe in ``params`` (frequencies/phases/vocabs are baked constants).
    ``noise_diag(params, X)`` is the bare-Noise diagonal for SYMMETRIC
    covariances (add it to the jitter/obs diagonal in ops/lowrank calls)."""

    ck: CompiledKernel
    num_features: int
    seed: int
    m_total: int
    _leaf_builders: Tuple[Optional[Callable], ...]
    _feature_terms: Tuple[Tuple[int, ...], ...]
    _diag_terms: Tuple[Tuple[int, ...], ...]
    #: per ck.terms index: (start, stop) column slice of phi for that additive
    #: term, or None when the term is a bare-Noise diag term — powers
    #: per-component posterior decomposition (fitplot --approx rff)
    term_slices: Tuple[Optional[Tuple[int, int]], ...]

    def phi(self, params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
        n = X.shape[0]
        blocks = []
        for term in self._feature_terms:
            block = None
            for li in term:
                f = self._leaf_builders[li](params, X)  # (n, m_leaf)
                if block is None:
                    block = f
                else:  # row-wise Khatri-Rao product
                    block = (block[:, :, None] * f[:, None, :]).reshape(n, -1)
            blocks.append(block)
        return jnp.concatenate(blocks, axis=1)

    def term_diag(self, params: jnp.ndarray, X: jnp.ndarray, term) -> jnp.ndarray:
        """Diagonal of one bare-Noise product term (tuple of leaf indices).

        SHARDING CONTRACT: this diag must depend only on each row's VALUES,
        never its global row index — under sharded_lowrank_logpdf X is a
        (n/P, cols) LOCAL shard, so the arange row-ids below are shard-local.
        That is correct today because _leaf_diag ignores x for the col<0
        kinds (Noise/Constant are row-identity: diag is a constant); a future
        diag kind that reads row identity would silently break sharded
        results (contrast sharded_gram's explicit global-row-offset handling
        in parallel/distributed.py)."""
        ck = self.ck
        block = None
        for li in term:
            col = ck.cols[li]
            x = X[:, col] if col >= 0 else jnp.arange(X.shape[0], dtype=X.dtype)
            b = _leaf_diag(ck.kinds[li], x, params[li])
            block = b if block is None else block * b
        return block

    def noise_diag(self, params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
        """Diagonal contributed by product terms containing a bare Noise leaf
        (zero off-diagonal by row-identity; covariance.py::gram semantics)."""
        d = jnp.zeros((X.shape[0],), X.dtype)
        for term in self._diag_terms:
            d = d + self.term_diag(params, X, term)
        return d


def build_feature_map(
    ck: CompiledKernel,
    data: Sequence[np.ndarray],
    num_features: int = 256,
    seed: int = 0,
) -> FeatureMap:
    """Compile ``ck`` into a FeatureMap.

    ``data`` — one or more concrete (n_i, n_cols) input matrices (training
    inputs plus any prediction inputs) used to collect Cat/Noise category
    vocabularies; pass every input the map will later be applied to.
    ``num_features`` — RFF count per stationary leaf (finite-rank leaves use
    their natural dimension).
    """
    rng = np.random.default_rng(seed)
    mats = [np.asarray(a) for a in data]

    def _vocab(col: int) -> np.ndarray:
        return np.unique(np.concatenate([m[:, col] for m in mats]))

    builders: List[Optional[Callable]] = []
    leaf_dims: List[int] = []
    for li, kind in enumerate(ck.kinds):
        col = ck.cols[li]
        extra = ck.extras[li] if ck.extras else ()
        if kind in RFF_KINDS:
            w0 = _draw_base_frequencies(rng, kind, num_features, extra)
            b0 = rng.uniform(0.0, 2.0 * np.pi, num_features)
            scale = float(np.sqrt(2.0 / num_features))
            if kind == K_PERIODIC:
                tau = 2.0 * np.pi / extra[0]

                def builder(params, X, *, col=col, li=li, w0=w0, b0=b0, tau=tau,
                            scale=scale):
                    x = X[:, col]
                    u = jnp.stack([jnp.cos(tau * x), jnp.sin(tau * x)], axis=1)
                    w = jnp.asarray(w0, X.dtype) / params[li]
                    return scale * jnp.cos(u @ w.T + jnp.asarray(b0, X.dtype))
            else:

                def builder(params, X, *, col=col, li=li, w0=w0, b0=b0, scale=scale):
                    x = X[:, col]
                    w = jnp.asarray(w0, X.dtype) / params[li]
                    return scale * jnp.cos(x[:, None] * w[None, :]
                                           + jnp.asarray(b0, X.dtype))

            builders.append(builder)
            leaf_dims.append(num_features)
        elif kind == K_LINEAR:

            def builder(params, X, *, col=col, li=li):
                x = X[:, col]
                c = jnp.sqrt(jnp.maximum(params[li], 0.0))
                return jnp.stack([x, jnp.broadcast_to(c, x.shape)], axis=1)

            builders.append(builder)
            leaf_dims.append(2)
        elif kind == K_CONST:

            def builder(params, X, *, li=li):
                c = jnp.sqrt(jnp.maximum(params[li], 0.0))
                return jnp.broadcast_to(c, (X.shape[0], 1)).astype(X.dtype)

            builders.append(builder)
            leaf_dims.append(1)
        elif kind == K_CAT or (kind == K_NOISE and col >= 0):
            vocab = _vocab(col)

            def builder(params, X, *, col=col, li=li, vocab=vocab, kind=kind):
                onehot = (X[:, col][:, None] == jnp.asarray(vocab, X.dtype)[None, :])
                onehot = onehot.astype(X.dtype)
                if kind == K_NOISE:
                    onehot = onehot * jnp.sqrt(jnp.maximum(params[li], 0.0))
                return onehot

            builders.append(builder)
            leaf_dims.append(len(vocab))
        elif kind == K_NOISE:  # bare Noise: rank-n diagonal, no feature
            builders.append(None)
            leaf_dims.append(0)
        else:  # pragma: no cover - all kinds handled above
            raise ValueError(f"unsupported leaf kind {KIND_NAMES[kind]}")

    feature_terms: List[Tuple[int, ...]] = []
    diag_terms: List[Tuple[int, ...]] = []
    term_slices: List[Optional[Tuple[int, int]]] = []
    m_total = 0
    for term in ck.terms:
        if any(builders[li] is None for li in term):
            diag_terms.append(term)
            term_slices.append(None)
        else:
            feature_terms.append(term)
            m_term = 1
            for li in term:
                m_term *= leaf_dims[li]
            term_slices.append((m_total, m_total + m_term))
            m_total += m_term
    if not feature_terms:
        raise ValueError(
            "formula has no feature-representable term (only bare Noise); "
            "use the exact path"
        )

    return FeatureMap(
        ck, num_features, seed, m_total, tuple(builders),
        tuple(feature_terms), tuple(diag_terms), tuple(term_slices),
    )
