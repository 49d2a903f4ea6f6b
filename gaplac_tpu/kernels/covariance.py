"""Covariance library + formula compiler: AST -> pure JAX gram builders.

Replaces the reference's L1 boundary (AbstractGPs/KernelFunctions): leaf
kernels (ref: makekernel, abstractgp_translations.jl:8-15), the
SelectTransform column-assignment semantics (abstractgp_translations.jl:45-69)
and kernel-tree flattening (_walk_kernel, :17-19).

Semantics (SURVEY.md §2.2): the formula's leaves, left-to-right, define the
input-matrix columns; the compiled kernel is a SUM over product terms, each
term the elementwise PRODUCT of its leaves' 1-D kernels applied to their own
columns (ANOVA-style tensor product — never two kernels on one column):

    SqExp(:t) * Cat(:g) + Linear(:x)
      => k((t,g,x),(t',g',x')) = SqExp(t,t') * Cat(g,g') + Linear(x,x')

Design: ``CompiledKernel`` is a static description (hashable pytree-free
metadata); ``gram(params, X1, X2)`` is a pure jit-able/vmappable/gradable
function of a flat ``(n_leaves,)`` hyperparameter vector.  Hyperparameter
override for inference (ref: kernel(eq; hyperparams=...), mcmc.jl:33)
becomes a functional parameter-vector update — no kernel rebuilding per
density evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.dsl.ast import (
    Cat,
    Constant,
    GPComponent,
    Leaf,
    Linear,
    Matern32,
    Matern52,
    Noise,
    OU,
    Periodic,
    RQ,
    SqExp,
    leaves as ast_leaves,
    sum_of_products,
)

# Leaf kind codes (static ints baked into the compiled closure)
(K_SQEXP, K_OU, K_LINEAR, K_CAT, K_NOISE, K_CONST,
 K_MATERN32, K_MATERN52, K_PERIODIC, K_RQ) = range(10)

_KIND_OF = {
    SqExp: K_SQEXP,
    OU: K_OU,
    Linear: K_LINEAR,
    Cat: K_CAT,
    Noise: K_NOISE,
    Constant: K_CONST,
    Matern32: K_MATERN32,
    Matern52: K_MATERN52,
    Periodic: K_PERIODIC,
    RQ: K_RQ,
}

#: kind code -> display name (single source for CLI labels/reports)
KIND_NAMES = {
    K_SQEXP: "SqExp", K_OU: "OU", K_LINEAR: "Linear", K_CAT: "Cat",
    K_NOISE: "Noise", K_CONST: "Constant", K_MATERN32: "Matern32",
    K_MATERN52: "Matern52", K_PERIODIC: "Periodic", K_RQ: "RQ",
}

#: kinds whose scalar hyperparameter is a lengthscale (the `--infer`-able,
#: chain-sampled class; predict/select default-slot logic keys on this)
LENGTHSCALE_KINDS = (K_SQEXP, K_OU, K_MATERN32, K_MATERN52, K_PERIODIC, K_RQ)

_SQRT3 = 3.0 ** 0.5
_SQRT5 = 5.0 ** 0.5


def _leaf_cross(
    kind: int,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    p: jnp.ndarray,
    extra: Tuple[float, ...] = (),
) -> jnp.ndarray:
    """1-D cross covariance block k(x1[:,None], x2[None,:]) for one leaf.

    ``p`` is the leaf's scalar hyperparameter (l / c / s2; ignored for Cat);
    ``extra`` are the leaf's STATIC shape parameters (Periodic period,
    RQ alpha).  Definitions match KernelFunctions numerically
    (abstractgp_translations.jl:8-15):
      SqExp   : exp(-d^2 / (2 l^2))
      OU      : exp(-|d| / l)
      Linear  : x*x' + c
      Cat     : 1[x == x']
      Noise   : s2 * 1[x == x']   (column-keyed white noise)
      Const   : c
      Matern32: (1 + sqrt(3)|d|/l) exp(-sqrt(3)|d|/l)
      Matern52: (1 + sqrt(5)|d|/l + 5 d^2/(3 l^2)) exp(-sqrt(5)|d|/l)
      Periodic: exp(-2 sin^2(pi d / period) / l^2)
      RQ      : (1 + d^2 / (2 alpha l^2))^(-alpha)
    """
    d = x1[:, None] - x2[None, :]
    if kind == K_SQEXP:
        inv2l2 = 0.5 / (p * p)
        return jnp.exp(-d * d * inv2l2)
    if kind == K_OU:
        return jnp.exp(-jnp.abs(d) / p)
    if kind == K_LINEAR:
        return x1[:, None] * x2[None, :] + p
    if kind == K_CAT:
        return (d == 0).astype(x1.dtype)
    if kind == K_NOISE:
        return p * (d == 0).astype(x1.dtype)
    if kind == K_CONST:
        return jnp.broadcast_to(p, (x1.shape[0], x2.shape[0])).astype(x1.dtype)
    if kind == K_MATERN32:
        r = _SQRT3 * jnp.abs(d) / p
        return (1.0 + r) * jnp.exp(-r)
    if kind == K_MATERN52:
        r = _SQRT5 * jnp.abs(d) / p
        return (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    if kind == K_PERIODIC:
        s = jnp.sin(jnp.pi * d / extra[0]) ** 2
        return jnp.exp(-2.0 * s / (p * p))
    if kind == K_RQ:
        alpha = extra[0]
        return (1.0 + d * d / (2.0 * alpha * p * p)) ** (-alpha)
    raise ValueError(f"unknown leaf kind {kind}")


def _leaf_diag(kind: int, x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of the symmetric gram for one leaf: k(x_i, x_i)."""
    n = x.shape[0]
    one = jnp.ones((n,), x.dtype)
    if kind in (K_SQEXP, K_OU, K_CAT, K_MATERN32, K_MATERN52, K_PERIODIC, K_RQ):
        return one
    if kind == K_LINEAR:
        return x * x + p
    if kind == K_NOISE:
        return p * one
    if kind == K_CONST:
        return p * one
    raise ValueError(f"unknown leaf kind {kind}")


@dataclass(frozen=True)
class CompiledKernel:
    """Static compilation of a formula AST (hashable; safe as a jit static arg).

    Fields:
      varnames : data columns, formula left-to-right order (gp_parts.jl:53)
      kinds    : per-leaf kernel kind code
      cols     : per-leaf input-matrix column (or -1 for bare Noise/Constant,
                 which key on row identity instead of a column)
      terms    : sum-of-products structure as leaf-index tuples
      defaults : per-leaf default hyperparameter values
      leaf_vars: per-leaf varname ("" for bare Noise/Constant)
      extras   : per-leaf shape parameters (Periodic period, RQ alpha).
                 Static by default; they ALSO occupy trailing slots of the
                 extended parameter vector (see ``n_params``/``extra_slots``)
                 so inference may treat them as hyperparameters
                 (--infer-extra).  A params vector of length ``n_leaves``
                 keeps the legacy static behavior.
    """

    varnames: Tuple[str, ...]
    kinds: Tuple[int, ...]
    cols: Tuple[int, ...]
    terms: Tuple[Tuple[int, ...], ...]
    defaults: Tuple[float, ...]
    leaf_vars: Tuple[str, ...]
    extras: Tuple[Tuple[float, ...], ...] = ()

    # -- construction ------------------------------------------------------

    @staticmethod
    def compile(formula: GPComponent) -> "CompiledKernel":
        lvs = ast_leaves(formula)
        varnames: list[str] = []
        cols: list[int] = []
        for lf in lvs:
            if lf.varnames():
                cols.append(len(varnames))
                varnames.append(lf.varname)
            else:
                cols.append(-1)
        index_of = {id(lf): i for i, lf in enumerate(lvs)}
        terms = tuple(
            tuple(index_of[id(lf)] for lf in term) for term in sum_of_products(formula)
        )
        kinds = tuple(_KIND_OF[type(lf)] for lf in lvs)
        defaults = tuple(
            lf.hyperparam_default() if lf.hyperparam_name is not None else 0.0 for lf in lvs
        )
        leaf_vars = tuple(lf.varname for lf in lvs)
        extras = tuple(
            (float(lf.p),) if isinstance(lf, Periodic)
            else (float(lf.alpha),) if isinstance(lf, RQ)
            else ()
            for lf in lvs
        )
        return CompiledKernel(tuple(varnames), kinds, tuple(cols), terms, defaults,
                              leaf_vars, extras)

    # -- parameters --------------------------------------------------------

    @property
    def n_leaves(self) -> int:
        return len(self.kinds)

    @cached_property
    def extra_slots(self) -> Tuple[Tuple[int, ...], ...]:
        """Per-leaf indices of its shape parameters in the EXTENDED param
        vector (extras are appended after the ``n_leaves`` leaf params)."""
        slots = []
        off = self.n_leaves
        for e in (self.extras or ((),) * self.n_leaves):
            slots.append(tuple(range(off, off + len(e))))
            off += len(e)
        return tuple(slots)

    @property
    def n_params(self) -> int:
        """Extended parameter-vector length: leaf params + trailing extras."""
        return self.n_leaves + (sum(len(e) for e in self.extras) if self.extras else 0)

    def default_params(self, dtype=jnp.float64) -> jnp.ndarray:
        flat_extras = [v for e in (self.extras or ()) for v in e]
        return jnp.asarray(tuple(self.defaults) + tuple(flat_extras), dtype=dtype)

    def extra_slots_for_vars(self, varnames: Sequence[str]) -> Tuple[int, ...]:
        """Extended-param indices of the shape parameters (Periodic period,
        RQ alpha) of every leaf on the named variables (--infer-extra)."""
        want = set(varnames)
        slots = tuple(
            s
            for v, es in zip(self.leaf_vars, self.extra_slots)
            if v in want
            for s in es
        )
        if not slots:
            raise ValueError(
                f"--infer-extra variables {sorted(want)} match no kernel shape "
                f"parameter (only Periodic's period and RQ's alpha are shape "
                f"parameters; formula vars: {self.varnames})"
            )
        return slots

    def param_slots_for_vars(self, inferable: Sequence[str]) -> Tuple[int, ...]:
        """Leaf-param indices whose natural hyperparameter is replaced when
        inferring the named variables (ref: --infer semantics,
        CLI/src/main.jl:57-64 + mcmc.jl:33 — one shared scalar for all)."""
        inferable = set(inferable)
        slots = tuple(
            i
            for i, (v, kind) in enumerate(zip(self.leaf_vars, self.kinds))
            if v in inferable and kind != K_CAT
        )
        if not slots:
            raise ValueError(
                f"--infer variables {sorted(inferable)} match no inferable kernel "
                f"hyperparameter (formula vars: {self.varnames})"
            )
        return slots

    def set_params(
        self, params: jnp.ndarray, slots: Tuple[int, ...], value: jnp.ndarray
    ) -> jnp.ndarray:
        """Functional hyperparameter override: params with ``slots`` <- value."""
        return params.at[jnp.array(slots)].set(value)

    # -- gram construction (pure JAX; Pallas path lives in ops/gram.py) ----

    def _leaf_axis(self, X: jnp.ndarray, col: int) -> jnp.ndarray:
        if col >= 0:
            return X[:, col]
        # bare Noise/Constant: key on row identity
        return jnp.arange(X.shape[0], dtype=X.dtype)

    def _extra(self, li: int) -> Tuple[float, ...]:
        return self.extras[li] if self.extras else ()

    def _extra_vals(self, params: jnp.ndarray, li: int) -> Tuple:
        """Leaf ``li``'s shape parameters: read from the extended params
        vector when one is passed (so they differentiate / can be inferred),
        else the static compile-time values.  The branch is on a static
        shape, so it resolves at trace time."""
        es = self.extra_slots[li]
        if es and params.shape[0] == self.n_params and self.n_params > self.n_leaves:
            return tuple(params[s] for s in es)
        return self._extra(li)

    def gram(
        self,
        params: jnp.ndarray,
        X1: jnp.ndarray,
        X2: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full covariance matrix K[i,j] = k(X1[i,:], X2[j,:]).

        When ``X2 is None`` the gram is symmetric and bare-Noise terms hit the
        diagonal; in a cross-gram, row identities never match (standard
        white-noise prediction semantics), so bare Noise contributes 0.
        """
        symmetric = X2 is None
        X2v = X1 if symmetric else X2
        n1, n2 = X1.shape[0], X2v.shape[0]
        K = jnp.zeros((n1, n2), X1.dtype)
        for term in self.terms:
            block = None
            for li in term:
                col = self.cols[li]
                if col < 0 and not symmetric:
                    x1 = jnp.arange(n1, dtype=X1.dtype)
                    x2 = jnp.full((n2,), -1.0, X1.dtype)  # never equal
                else:
                    x1 = self._leaf_axis(X1, col)
                    x2 = self._leaf_axis(X2v, col)
                b = _leaf_cross(self.kinds[li], x1, x2, params[li],
                                self._extra_vals(params, li))
                block = b if block is None else block * b
            K = K + block
        return K

    def gram_cross_with_rowids(
        self,
        params: jnp.ndarray,
        X1: jnp.ndarray,
        X2: jnp.ndarray,
        row_ids1: jnp.ndarray,
        row_ids2: jnp.ndarray,
    ) -> jnp.ndarray:
        """Cross gram where bare-Noise leaves key on EXPLICIT global row ids —
        the primitive behind the block-sharded Gram (parallel/distributed.py),
        whose row blocks see only a slice of the global row index space."""
        K = jnp.zeros((X1.shape[0], X2.shape[0]), X1.dtype)
        for term in self.terms:
            block = None
            for li in term:
                col = self.cols[li]
                if col >= 0:
                    b = _leaf_cross(self.kinds[li], X1[:, col], X2[:, col],
                                    params[li], self._extra_vals(params, li))
                else:
                    b = _leaf_cross(
                        self.kinds[li],
                        row_ids1.astype(X1.dtype),
                        row_ids2.astype(X1.dtype),
                        params[li],
                        self._extra_vals(params, li),
                    )
                block = b if block is None else block * b
            K = K + block
        return K

    def bind(
        self,
        X: jnp.ndarray,
        dynamic_slots: Sequence[int] = (),
        diag: float = 0.0,
    ):
        """Precompute every θ-independent piece of the symmetric gram at
        fixed inputs ``X``; returns ``gram_bound(params) -> K``.

        The samplers evaluate gram(θ, X) once per leapfrog step with X fixed
        for the whole run, so all pairwise structure is hoisted to bind time:
        fully static product terms (e.g. ``Cat*Cat``) collapse into a single
        cached matrix, and each dynamic leaf caches its θ-independent factor
        (squared distances for SqExp, |d| for OU, the outer product for
        Linear, the match indicator for Noise).  ``diag`` is folded into the
        static base (the per-eval ``+ jitter*I``).  Per evaluation only the
        scalar hyperparameter transforms remain — on a dispatch-bound backend
        this is the difference between ~6 and ~2 ops per leaf.

        ``dynamic_slots`` are the extended-param indices that may change
        between calls (the union of the model's slot groups): leaf indices
        for the natural hyperparameters, and/or ``extra_slots`` indices for
        dynamic shape parameters (inferred Periodic period / RQ alpha, whose
        θ-independent cache degrades to raw differences).  Every other
        parameter is baked at its default value, matching what
        ``gram(params_from(θ), X)`` computes when only those slots of the
        param vector are updated.
        """
        dyn = frozenset(int(s) for s in dynamic_slots)
        n = X.shape[0]
        dtype = X.dtype
        K0 = diag * jnp.eye(n, dtype=dtype) if diag else None
        dyn_terms = []  # (static_block | None, [(kind, cache, leaf_index)])
        for term in self.terms:
            static_block = None
            dyn_leaves = []
            for li in term:
                x = self._leaf_axis(X, self.cols[li])
                kind = self.kinds[li]
                dyn_extra = any(s in dyn for s in self.extra_slots[li])
                if (li in dyn or dyn_extra) and kind != K_CAT:  # Cat: no hyperparam
                    if kind in (K_SQEXP, K_RQ):
                        d = x[:, None] - x[None, :]
                        cache = d * d
                    elif kind in (K_OU, K_MATERN32, K_MATERN52):
                        cache = jnp.abs(x[:, None] - x[None, :])
                    elif kind == K_LINEAR:
                        cache = x[:, None] * x[None, :]
                    elif kind == K_NOISE:
                        cache = (x[:, None] == x[None, :]).astype(dtype)
                    elif kind == K_PERIODIC:
                        d = x[:, None] - x[None, :]
                        if dyn_extra:
                            # period inferred: only raw differences cacheable
                            cache = d
                        else:
                            # static period: cache sin^2(pi d / p)
                            cache = jnp.sin(jnp.pi * d / self._extra(li)[0]) ** 2
                    else:  # K_CONST
                        cache = None
                    dyn_leaves.append((kind, cache, li, dyn_extra))
                else:
                    b = _leaf_cross(kind, x, x, jnp.asarray(self.defaults[li], dtype),
                                    self._extra(li))
                    static_block = b if static_block is None else static_block * b
            if not dyn_leaves:
                K0 = static_block if K0 is None else K0 + static_block
            else:
                dyn_terms.append((static_block, tuple(dyn_leaves)))
        if K0 is None:
            K0 = jnp.zeros((n, n), dtype)

        def gram_bound(params: jnp.ndarray) -> jnp.ndarray:
            K = K0
            for static_block, dls in dyn_terms:
                block = static_block
                for kind, cache, li, dyn_extra in dls:
                    p = params[li]
                    if kind == K_SQEXP:
                        b = jnp.exp(cache * (-0.5 / (p * p)))
                    elif kind == K_OU:
                        b = jnp.exp(cache * (-1.0 / p))
                    elif kind == K_LINEAR:
                        b = cache + p
                    elif kind == K_NOISE:
                        b = cache * p
                    elif kind == K_MATERN32:
                        r = cache * (_SQRT3 / p)
                        b = (1.0 + r) * jnp.exp(-r)
                    elif kind == K_MATERN52:
                        r = cache * (_SQRT5 / p)
                        b = (1.0 + r + r * r / 3.0) * jnp.exp(-r)
                    elif kind == K_PERIODIC:
                        if dyn_extra:  # cache = raw d; period from params
                            period = params[self.extra_slots[li][0]]
                            s2 = jnp.sin(jnp.pi * cache / period) ** 2
                            b = jnp.exp(s2 * (-2.0 / (p * p)))
                        else:  # cache = sin^2(pi d / p_static)
                            b = jnp.exp(cache * (-2.0 / (p * p)))
                    elif kind == K_RQ:
                        alpha = (params[self.extra_slots[li][0]] if dyn_extra
                                 else self._extra(li)[0])
                        b = (1.0 + cache / (2.0 * alpha * p * p)) ** (-alpha)
                    else:  # K_CONST
                        b = jnp.broadcast_to(p.astype(dtype), (n, n))
                    block = b if block is None else block * b
                K = K + block
            return K

        return gram_bound

    def gram_diag(self, params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
        """diag(gram(params, X)) without forming the matrix."""
        d = jnp.zeros((X.shape[0],), X.dtype)
        for term in self.terms:
            block = None
            for li in term:
                b = _leaf_diag(self.kinds[li], self._leaf_axis(X, self.cols[li]), params[li])
                block = b if block is None else block * b
            d = d + block
        return d


def compile_formula(formula: GPComponent) -> CompiledKernel:
    """Compile a kernel AST (ref: kernel(), abstractgp_translations.jl:45-69)."""
    return CompiledKernel.compile(formula)
