"""Log-density model builders for GP hyperparameter inference.

Reference parity: the Turing model (CLI/src/mcmc.jl:31-37)

    ℓ  ~ Uniform(0, 20)                      # hardcoded prior, mcmc.jl:32
    fx ~ FiniteGP(GP(kern(ℓ)), X, 0.1)       # latent GP, jitter 0.1
    Y .~ Normal.(fx, 1)                      # obs noise sigma=1

Two TPU-first formulations (SURVEY.md §2.12 "inference" rows):

1. ``build_gaussian_marginal`` — for (possibly parameterized) Gaussian
   likelihoods the latents are integrated out analytically:
   y ~ N(0, K(θ) + jitter·I + σ²·I).  NUTS then runs in dim = #hyperparams
   (vs 1+n in the reference — same posterior over θ, radically better
   geometry and speed).  Latent draws for the chain's fx columns are
   recovered exactly from p(f | θ, y), and ``lp`` is the SAME joint density
   the reference reports (natural log), so ``select --chains`` parity holds.

2. ``build_latent_whitened`` — the general path (any likelihood):
   whitened parameterization f = L(θ) z, z ~ N(0, I) (SURVEY.md §7 hard
   part (b): whitening is mandatory for geometry), NUTS over [u, z].

Both return pure closures over static structure: jit/grad/vmap-safe.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gaplac_tpu.dsl.parser import LikelihoodSpec
from gaplac_tpu.inference.likelihoods import gaussian_obs_sigma2, make_loglik
from gaplac_tpu.inference.priors import as_prior
from gaplac_tpu.kernels.covariance import CompiledKernel
from gaplac_tpu.ops import linalg, mvn

_LOG_2PI = math.log(2.0 * math.pi)

DEFAULT_PRIOR_BOUNDS = (0.0, 20.0)  # ref: ℓ ~ Uniform(0,20), mcmc.jl:32

# every builder's ``prior_bounds`` accepts either the legacy (lo, hi) Uniform
# tuple or any priors.Prior (LogNormal/Gamma/TruncatedNormal; --prior string)


def slot_groups_for(
    ck: CompiledKernel,
    inferable: Sequence[str],
    shared: bool = True,
    infer_extras: Sequence[str] = (),
) -> Tuple[Tuple[int, ...], ...]:
    """Map --infer variables to hyperparameter groups.

    ``shared=True`` reproduces the reference exactly: ONE scalar sets the
    natural hyperparameter of every inferred leaf (mcmc.jl:33 builds
    Dict(v => ℓ for v in inferable)).  ``shared=False`` gives one scalar per
    distinct inferred variable (a strict capability extension).

    ``infer_extras`` names variables whose kernel SHAPE parameters (Periodic
    period, RQ alpha) are also inferred: each such parameter gets its own
    trailing θ entry (never shared — shape parameters are not commensurable
    across leaves).  Chain columns stay positional (ℓ, ℓ_2, …), so predict/
    fitplot reconstruct the same ordering from the same flags.
    """
    groups: list = []
    if inferable:
        if shared:
            groups.append(ck.param_slots_for_vars(inferable))
        else:
            seen = set()
            for v in inferable:
                if v in seen:
                    continue
                seen.add(v)
                groups.append(ck.param_slots_for_vars([v]))
    seen_e = set()
    for v in infer_extras:
        if v in seen_e:
            continue
        seen_e.add(v)
        groups.extend((s,) for s in ck.extra_slots_for_vars([v]))
    if not groups:
        raise ValueError("nothing to infer: give --infer and/or --infer-extra")
    return tuple(groups)


@dataclass(frozen=True)
class GPModel:
    """A compiled inference problem.

    ``logdensity(v)`` is the unconstrained-space target for NUTS/HMC/VI.
    ``dim`` is v's length.  ``report(key, v)`` materializes the chain row
    pieces: (theta  — constrained hyperparams, f — latent draw, lp — the
    reference-schema joint log density at (theta, f)).
    """

    dim: int
    n_hyper: int
    logdensity: Callable[[jnp.ndarray], jnp.ndarray]
    report: Callable[[jax.Array, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]
    constrain: Callable[[jnp.ndarray], jnp.ndarray]
    initial_position: Callable[[jax.Array], jnp.ndarray]
    marginalized: bool
    #: (theta, f) -> unconstrained position v; inverse of report's draw —
    #: powers warm-start/extension from a previous chain's last row
    position_from: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None
    #: optional data-as-arguments form: ``logdensity_data(u, data)`` ==
    #: ``logdensity(u)`` when called with ``data``.  Large-n callers jit
    #: ``lambda key, data: sampler(..., lambda u: m.logdensity_data(u, data))``
    #: so the O(n) arrays enter the program as PARAMETERS — jitting the
    #: closure form embeds them as multi-MB HLO literals, which the TPU
    #: compile service handles pathologically (measured: n=2^20 OU program
    #: = 17 MB of hex literals, remote compile hangs >45 min; the same
    #: program with data parameters compiles normally)
    logdensity_data: Callable = None
    data: "object" = None


def _params_from(ck: CompiledKernel, slot_groups, dtype):
    # extended vector: leaf params + trailing shape params (extras), so
    # slot groups may point at either class
    defaults = ck.default_params(dtype)
    idx_groups = [jnp.asarray(g, dtype=jnp.int32) for g in slot_groups]

    def params(theta: jnp.ndarray) -> jnp.ndarray:
        p = defaults
        for g, idx in enumerate(idx_groups):
            p = p.at[idx].set(theta[g])
        return p

    return params


def build_gaussian_marginal(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    jitter: float = mvn.DEFAULT_JITTER,
    obs_sigma2: float = 1.0,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
) -> GPModel:
    """Collapsed model: θ -> log N(y; 0, K(θ) + (jitter+σ²) I) + prior."""
    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    eye = jnp.eye(n, dtype=dtype)
    # hot path: all θ-independent gram structure (pairwise distances, static
    # product terms, + (jitter+σ²)·I) is precomputed ONCE at build time
    dynamic = tuple(sorted({s for g in slot_groups for s in g}))
    gram_bound = ck.bind(X, dynamic, diag=jitter + obs_sigma2)

    def logdensity(u: jnp.ndarray) -> jnp.ndarray:
        theta = tr.forward(u)
        S = gram_bound(params_from(theta))
        return mvn.mvn_logpdf(S, y) + jnp.sum(tr.logprior_u(u))

    def report(key: jax.Array, u: jnp.ndarray):
        """Draw f ~ p(f | θ, y) exactly and evaluate the reference-schema
        joint lp = log p(θ) + log N(f; 0, K+jitter·I) + Σ log N(y; f, σ²)."""
        theta = tr.forward(u)
        Kf = ck.gram(params_from(theta), X) + jitter * eye
        Ls = linalg.cholesky(Kf + obs_sigma2 * eye)
        A = linalg.solve_triangular(Ls, Kf, lower=True)        # L^-1 Kf
        mean_f = A.T @ linalg.solve_triangular(Ls, y, lower=True)
        cond_cov = Kf - A.T @ A
        Lc = linalg.cholesky(cond_cov + (1e-8 * jnp.trace(cond_cov) / n) * eye)
        f = mean_f + Lc @ jax.random.normal(key, (n,), dtype)
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + mvn.mvn_logpdf(Kf, f)
            + jnp.sum(-0.5 * ((y - f) ** 2 / obs_sigma2 + jnp.log(obs_sigma2) + _LOG_2PI))
        )
        return theta, f, lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        # Turing inits uniformly in [-2,2] unconstrained; same here.
        return jax.random.uniform(key, (nh,), dtype, -2.0, 2.0)

    def position_from(theta: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        return tr.inverse(jnp.asarray(theta, dtype))

    return GPModel(nh, nh, logdensity, report, tr.forward, initial_position, True,
                   position_from)


def build_gaussian_marginal_lowrank(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    num_features: int = 256,
    feature_seed: int = 0,
    jitter: float = mvn.DEFAULT_JITTER,
    obs_sigma2: float = 1.0,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
) -> GPModel:
    """Low-rank collapsed model: θ -> log N(y; 0, Φ(θ)Φ(θ)^T + D(θ)).

    The large-n scaling path (--approx rff): the gram never materializes —
    Φ is the (n, m) feature matrix of kernels/features.py (random Fourier
    features for stationary leaves, exact features for finite-rank leaves)
    and all algebra is the O(n m^2) Woodbury of ops/lowrank.py.  Same prior/
    jitter/σ² semantics as ``build_gaussian_marginal``; the posterior is over
    the SAME hyperparameters, approximated by the feature expansion (exact
    for finite-rank formulas).
    """
    import numpy as _np

    from gaplac_tpu.kernels.features import build_feature_map
    from gaplac_tpu.ops import lowrank

    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    fm = build_feature_map(ck, [_np.asarray(X)], num_features=num_features,
                           seed=feature_seed)

    def _phi_d0(theta):
        """Features + the latent prior diagonal d0 = jitter + bare-Noise."""
        p = params_from(theta)
        return fm.phi(p, X), jitter + fm.noise_diag(p, X)

    def logdensity(u: jnp.ndarray) -> jnp.ndarray:
        theta = tr.forward(u)
        phi, d0 = _phi_d0(theta)
        return (
            lowrank.lowrank_logpdf(phi, d0 + obs_sigma2, y)
            + jnp.sum(tr.logprior_u(u))
        )

    def report(key: jax.Array, u: jnp.ndarray):
        """Exact f ~ p(f | θ, y) via Matheron pathwise conditioning, and the
        reference-schema joint lp (all O(n m^2); mirrors the dense report)."""
        theta = tr.forward(u)
        phi, d0 = _phi_d0(theta)
        f = lowrank.lowrank_conditional_sample(key, phi, d0, obs_sigma2, y)
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + lowrank.lowrank_logpdf(phi, d0, f)
            + jnp.sum(-0.5 * ((y - f) ** 2 / obs_sigma2 + jnp.log(obs_sigma2) + _LOG_2PI))
        )
        return theta, f, lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(key, (nh,), dtype, -2.0, 2.0)

    def position_from(theta: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        return tr.inverse(jnp.asarray(theta, dtype))

    return GPModel(nh, nh, logdensity, report, tr.forward, initial_position, True,
                   position_from)


@dataclass(frozen=True)
class MarkovStructure:
    """State-space decomposition of a formula (--approx sde).

    ``blocks``: per additive term, (block_kind, leaf_slot, col) — OU /
    Matern32 / Matern52 / Constant / Linear (ops/markov_ss.py block kinds);
    ``leaf_slot == -1`` marks a pure-Cat term (a unit-variance Constant
    block, since Cat products are 1 within a group).  Multi-factor product
    terms store a TUPLE in each field ((kinds...), (slots...), (cols...))
    and lower to the Kronecker-composed SSM.  ``group_cols``: the
    term's Cat design columns — the block restarts from its stationary
    prior at every group change (kernel×Cat grouping, exactly the
    block-diagonal-in-groups covariance of the reference's longitudinal
    formulas, /root/reference/test/pred.jl:3-6).  ``noise_slots``: Noise
    leaves folded into the observation variance.  ``sort_idx`` orders rows
    by (Markov group key ..., time); ``resets`` are the per-block
    group-boundary masks in that order.  ``scalar_ou``: the single-OU
    ungrouped fast path (scalar ops/markov.py)."""

    blocks: Tuple[Tuple[int, int, int], ...]
    group_cols: Tuple[Tuple[int, ...], ...]
    noise_slots: Tuple[int, ...]
    sort_idx: "object"
    t_sorted: "object"
    resets: "object"
    scalar_ou: bool
    time_col: int
    markov_gcols: Tuple[int, ...]
    #: per formula term: ("b", block_index) or ("n", noise leaf slot) —
    #: lets fitplot map additive components back to state blocks
    term_map: Tuple[Tuple[str, int], ...] = ()


def markov_param_vals(ck: CompiledKernel, st: MarkovStructure, p, dtype):
    """Per-block parameter payloads for ops/markov_ss.build_steps: the
    leaf's natural scalar (unit variance for pure-Cat blocks); Periodic
    blocks get (l, period) with the period read from the extended params
    vector when dynamic (--infer-extra) else the static compile-time
    extra.  Product blocks get a tuple of per-factor payloads."""
    from gaplac_tpu.ops import markov_ss as _ss

    def leaf_val(bk, li):
        if li < 0:
            return jnp.asarray(1.0, dtype)
        if bk == _ss.BLOCK_PERIODIC:
            es = ck.extra_slots[li]
            if es and p.shape[0] == ck.n_params and ck.n_params > ck.n_leaves:
                period = p[es[0]]
            else:
                period = jnp.asarray(ck.extras[li][0], dtype)
            return (p[li], period)
        if bk == _ss.BLOCK_RQ:
            # alpha is STATIC under sde (quadrature nodes are polynomial
            # roots); --infer-extra × RQ × sde is rejected at structure
            # extraction (``_markov_structure(dynamic_slots=...)``)
            c, w = _ss.rq_mixture_constants(float(ck.extras[li][0]))
            return (p[li], jnp.asarray(c, dtype), jnp.asarray(w, dtype))
        return p[li]

    vals = []
    for bk, li, _ in st.blocks:
        if isinstance(bk, tuple):
            vals.append(tuple(leaf_val(b, s) for b, s in zip(bk, li)))
        else:
            vals.append(leaf_val(bk, li))
    return vals


def markov_block_xs(st: MarkovStructure, X, idx=None):
    """Per-block data-column payloads for ops/markov_ss.build_steps: the
    leaf's data column (None when unused — everything except Linear), a
    tuple of per-factor columns for product blocks.  ``idx`` optionally
    permutes rows (the state-space sort order)."""

    def one(col):
        if col < 0:
            return None
        v = X[:, col]
        return v if idx is None else v[idx]

    return [
        tuple(one(c) for c in col) if isinstance(col, tuple) else one(col)
        for _, _, col in st.blocks
    ]


def markov_order_resets(st: MarkovStructure, X):
    """Sort permutation, sorted time axis and per-block reset masks for an
    arbitrary row set with ``st``'s design columns (training rows at build
    time; the joined train+test rows in predict).  Sort order: Markov group
    key lexicographically, then time (group-only / row order when the
    formula has no Markov leaf).  Raises if any grouped block's level sets
    are not contiguous under that order (crossed groupings have no exact
    reset-based Markov form)."""
    import numpy as _np

    X = _np.asarray(X)
    N = X.shape[0]
    if st.time_col >= 0:
        t = _np.asarray(X[:, st.time_col], dtype=float)
        keys = (t,) + tuple(X[:, c] for c in reversed(st.markov_gcols))
        order = _np.lexsort(keys)
        t_sorted = t[order]
    else:
        seen: list = []
        for gc in st.group_cols:
            for c in gc:
                if c not in seen:
                    seen.append(c)
        order = (_np.lexsort(tuple(X[:, c] for c in reversed(seen)))
                 if seen else _np.arange(N))
        # no Markov leaf: every transition is dt-independent (A = 0/I), so
        # a fresh monotone axis keeps build_steps' dt clean
        t_sorted = _np.arange(N, dtype=float)
    resets = []
    for gc in st.group_cols:
        if not gc:
            resets.append(None)
            continue
        key = X[:, list(gc)][order]
        change = _np.any(key[1:] != key[:-1], axis=1)
        if 1 + int(change.sum()) != len(_np.unique(key, axis=0)):
            raise ValueError(
                "--approx sde: a 'kernel * Cat' term's groups are not "
                "contiguous under the state-space sort order (crossed with "
                "the Markov grouping); only shared/nested Cat groupings "
                "have an exact Markov form — use the dense path or "
                "--approx rff"
            )
        resets.append(_np.concatenate([[True], change]))
    return order, t_sorted, tuple(resets)


def _markov_structure(ck: CompiledKernel, X, dynamic_slots=()) -> MarkovStructure:
    """Validate + extract the state-space structure for --approx sde.

    Supported terms: products of SqExp / OU / Matern32 / Matern52 / Periodic
    / Constant / Linear leaves (multi-factor products lower to the
    Kronecker-composed SSM — e.g. quasi-periodic Periodic*Matern), each
    optionally multiplied by any number of Cat leaves (per-group independent
    state-space chains), pure-Cat products (group random intercepts,
    variance 1), and Noise.  All OU/Matern leaves must share ONE time
    variable and ONE Cat grouping.  Raises with a clear message otherwise."""
    import numpy as _np

    from gaplac_tpu.kernels.covariance import (
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
    )
    from gaplac_tpu.ops import markov_ss as _ss

    block_of = {
        K_OU: _ss.BLOCK_OU,
        K_MATERN32: _ss.BLOCK_M32,
        K_MATERN52: _ss.BLOCK_M52,
        K_CONST: _ss.BLOCK_CONST,
        K_LINEAR: _ss.BLOCK_LINEAR,
        # the APPROXIMATE blocks (every other block is exact): SqExp lowers
        # to the order-6 spectral-Taylor SSM (max kernel error 4.3e-3);
        # Periodic to the J-harmonic Fourier-series SSM; RQ to the K-node
        # Gamma mixture of SqExp blocks (static alpha)
        K_SQEXP: _ss.BLOCK_SQEXP,
        K_PERIODIC: _ss.BLOCK_PERIODIC,
        K_RQ: _ss.BLOCK_RQ,
    }
    markov_kinds = (K_OU, K_MATERN32, K_MATERN52, K_SQEXP, K_PERIODIC, K_RQ)
    blocks = []
    group_cols = []
    noise_slots = []
    term_map = []
    time_vars = set()
    time_col = -1
    markov_gvars = None
    markov_gcols: Tuple[int, ...] = ()
    dynamic_slots = frozenset(dynamic_slots)

    def check_static_extras(kind, li):
        # RQ's alpha selects static quadrature nodes (polynomial roots, not
        # differentiable) — unlike Periodic's period, it cannot be dynamic
        if kind == K_RQ and any(s in dynamic_slots
                                for s in ck.extra_slots[li]):
            raise ValueError(
                "--approx sde: RQ's alpha cannot be inferred "
                "(--infer-extra) — the Gamma-mixture quadrature nodes are "
                "static polynomial roots; drop --infer-extra for this "
                "variable or use the dense path"
            )

    def note_markov(li, cats, gcols):
        """Shared-time-axis / shared-grouping bookkeeping for a Markov
        (dt-dependent) leaf — single-leaf terms and product factors alike."""
        nonlocal time_col, markov_gvars, markov_gcols
        time_vars.add(ck.leaf_vars[li])
        gvars = frozenset(ck.leaf_vars[c] for c in cats)
        if markov_gvars is None:
            time_col = ck.cols[li]
            markov_gvars = gvars
            markov_gcols = gcols
        elif gvars != markov_gvars:
            raise ValueError(
                "--approx sde needs all OU/Matern leaves to share "
                "ONE Cat grouping; got groupings "
                f"{sorted(markov_gvars)} and {sorted(gvars)}"
            )

    for term in ck.terms:
        cats = [li for li in term if ck.kinds[li] == K_CAT]
        others = [li for li in term if ck.kinds[li] != K_CAT]
        gcols = tuple(ck.cols[li] for li in cats)
        if len(others) > 1:
            # PRODUCT kernel: Kronecker-composed SSM (markov_ss._block_APH) —
            # e.g. the quasi-periodic Periodic*Matern / Periodic*OU of
            # longitudinal seasonality.  Exact for products of exact factor
            # blocks; state dim is the product of factor dims.
            bks, slots, cols = [], [], []
            for li in others:
                kind = ck.kinds[li]
                if kind not in block_of:
                    raise ValueError(
                        "--approx sde: product factors must be SqExp / OU / "
                        "Matern32 / Matern52 / Periodic / Constant / Linear "
                        f"(each optionally × Cat); got {KIND_NAMES[kind]} "
                        "inside a product (no state-space form; use the "
                        "dense path or --approx rff)"
                    )
                check_static_extras(kind, li)
                bks.append(block_of[kind])
                slots.append(li)
                cols.append(ck.cols[li])
                if kind in markov_kinds:
                    note_markov(li, cats, gcols)
            dim = 1
            for b in bks:
                dim *= _ss.block_dim(b)
            if dim > 64:
                import logging
                logging.getLogger("gaplac").warning(
                    "--approx sde: product term's Kronecker state dimension "
                    "is %d — O(n·d³) filtering will be slow; consider the "
                    "dense path or --approx rff for this formula", dim,
                )
            term_map.append(("b", len(blocks)))
            blocks.append((tuple(bks), tuple(slots), tuple(cols)))
            group_cols.append(gcols)
            continue
        if not others:
            # pure-Cat product: k = 1[g==g'] — a unit-variance group
            # random intercept (Constant block with per-group resets)
            term_map.append(("b", len(blocks)))
            blocks.append((_ss.BLOCK_CONST, -1, -1))
            group_cols.append(gcols)
            continue
        li = others[0]
        kind = ck.kinds[li]
        if kind == K_NOISE:
            if cats:
                raise ValueError(
                    "--approx sde does not support Noise * Cat products "
                    "(group-correlated noise is not diagonal); use the "
                    "dense path"
                )
            if ck.cols[li] >= 0:
                col_vals = _np.asarray(X[:, ck.cols[li]])
                if len(_np.unique(col_vals)) != col_vals.shape[0]:
                    raise ValueError(
                        "--approx sde: Noise(:var) requires distinct values "
                        "(duplicates couple rows off-diagonally); use bare "
                        "Noise for per-row noise"
                    )
            noise_slots.append(li)
            term_map.append(("n", li))
        elif kind in block_of:
            check_static_extras(kind, li)
            term_map.append(("b", len(blocks)))
            blocks.append((block_of[kind], li, ck.cols[li]))
            group_cols.append(gcols)
            if kind in markov_kinds:
                # repeated uses of one variable get separate (duplicate)
                # design columns, so the shared-axis check is by varname
                note_markov(li, cats, gcols)
        else:
            raise ValueError(
                f"--approx sde supports additive SqExp / OU / Matern32 / "
                f"Matern52 / Periodic / Constant / Linear / Noise terms "
                f"(each optionally × Cat); got {KIND_NAMES[kind]} (no "
                f"finite-dimensional state-space form; use --approx rff)"
            )
    if len(time_vars) > 1:
        raise ValueError(
            "--approx sde needs all OU/Matern leaves on ONE shared column "
            f"(the Markov time axis); got variables {sorted(time_vars)}"
        )
    if not blocks:
        raise ValueError("--approx sde needs at least one kernel leaf")
    st = MarkovStructure(
        tuple(blocks), tuple(group_cols), tuple(noise_slots),
        None, None, None,
        scalar_ou=(len(blocks) == 1 and blocks[0][0] == _ss.BLOCK_OU
                   and not group_cols[0]),
        time_col=time_col, markov_gcols=markov_gcols,
        term_map=tuple(term_map),
    )
    sort_idx, t_sorted, resets = markov_order_resets(st, X)
    return MarkovStructure(
        st.blocks, st.group_cols, st.noise_slots, sort_idx, t_sorted, resets,
        st.scalar_ou, st.time_col, st.markov_gcols, st.term_map,
    )


def build_gaussian_marginal_markov(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    jitter: float = mvn.DEFAULT_JITTER,
    obs_sigma2: float = 1.0,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
) -> GPModel:
    """EXACT state-space marginal for additive OU / Matern32 / Matern52 /
    Constant / Linear (+ Noise) formulas (--approx sde):
    θ -> log N(y; 0, K(θ) + (jitter + Σ s2 + σ²) I) by parallel Kalman
    filtering — O(n log n) work, O(log n) depth, no n×n gram and no
    Cholesky.  Single-OU formulas take the scalar fast path (ops/markov.py);
    everything else runs the block-diagonal matrix state (ops/markov_ss.py).
    Same posterior as ``build_gaussian_marginal`` to floating point; scales
    to millions of observations.

    The chain report draws the latent exactly via Matheron pathwise
    conditioning, all through the same associative-scan primitives:
    f = f* + S T⁻¹ (y − f* − ε*) with S = K + j_eff·I, T = S + σ²·I, where
    S T⁻¹ r = m_x + j_eff (r − m_x)/(j_eff + σ²) and m_x = ou_smooth(r).
    """
    import numpy as _np

    from gaplac_tpu.ops import markov
    from gaplac_tpu.ops import markov_ss as mss

    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    st = _markov_structure(ck, X,
                           dynamic_slots={s for g in slot_groups for s in g})
    ts = jnp.asarray(st.t_sorted, dtype)
    idx = jnp.asarray(st.sort_idx)
    inv_idx = jnp.asarray(_np.argsort(st.sort_idx))
    ys = jnp.asarray(y, dtype)[idx]
    kinds = tuple(b[0] for b in st.blocks)
    xs_sorted = tuple(markov_block_xs(st, jnp.asarray(X, dtype), idx=idx))

    resets_j = tuple(None if r is None else jnp.asarray(r)
                     for r in st.resets)
    #: the O(n) arrays, exposed as GPModel.data so large-n callers can pass
    #: them through jit as PARAMETERS (see GPModel.logdensity_data)
    data = {"ts": ts, "ys": ys, "xs": xs_sorted, "resets": resets_j}

    def _jeff(p):
        j_eff = jnp.asarray(jitter, dtype)
        for s in st.noise_slots:
            j_eff = j_eff + p[s]
        return j_eff

    if st.scalar_ou:
        ou_slot = st.blocks[0][1]

        def latent_loglik(p, vals, R, d):
            return markov.ou_loglik(d["ts"], vals, p[ou_slot], R)

        def smooth_mean(p, vals, R, d):
            return markov.ou_smooth(d["ts"], vals, p[ou_slot], R)[0]

        def prior_path(key, p, d):
            return markov.ou_prior_sample(key, d["ts"], p[ou_slot])
    else:

        def _steps(p, d, layout="auto"):
            # layout="auto": SoA-native tiny-d steps — no (n, d, d) buffer
            # in the vg/SMC hot programs (the round-5 remat-copy OOM fix)
            return mss.build_steps(kinds, markov_param_vals(ck, st, p, dtype),
                                   d["ts"], d["xs"], resets=d["resets"],
                                   layout=layout)

        def latent_loglik(p, vals, R, d):
            A, Q, H = _steps(p, d)
            return mss.ss_loglik(A, Q, H, vals, R)

        def smooth_mean(p, vals, R, d):
            A, Q, H = _steps(p, d)
            m_s, _ = mss.ss_smooth(A, Q, H, vals, R)
            return mss.measure_row(H, m_s)

        def prior_path(key, p, d):
            A, Q, H = _steps(p, d, layout="dense")
            return jnp.einsum("nd,nd->n", H, mss.ss_prior_sample(key, A, Q))

    def logdensity_data(u: jnp.ndarray, d) -> jnp.ndarray:
        theta = tr.forward(u)
        p = params_from(theta)
        return (
            latent_loglik(p, d["ys"], _jeff(p) + obs_sigma2, d)
            + jnp.sum(tr.logprior_u(u))
        )

    def logdensity(u: jnp.ndarray) -> jnp.ndarray:
        return logdensity_data(u, data)

    def report(key: jax.Array, u: jnp.ndarray, d=None):
        d = data if d is None else d
        theta = tr.forward(u)
        p = params_from(theta)
        j_eff = _jeff(p)
        ys_d = d["ys"]
        kx, kj, ke = jax.random.split(key, 3)
        # Matheron: prior draw f* = x* + sqrt(j_eff) ζ, obs-noise draw ε*
        x_star = prior_path(kx, p, d)
        f_star = x_star + jnp.sqrt(j_eff) * jax.random.normal(kj, (n,), dtype)
        eps = jnp.sqrt(jnp.asarray(obs_sigma2, dtype)) * jax.random.normal(
            ke, (n,), dtype
        )
        r = ys_d - f_star - eps
        m_x = smooth_mean(p, r, j_eff + obs_sigma2, d)
        corr = m_x + j_eff * (r - m_x) / (j_eff + obs_sigma2)
        f_sorted = f_star + corr
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + latent_loglik(p, f_sorted, j_eff, d)
            + jnp.sum(
                -0.5 * ((ys_d - f_sorted) ** 2 / obs_sigma2
                        + jnp.log(obs_sigma2) + _LOG_2PI)
            )
        )
        return theta, f_sorted[inv_idx], lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(key, (nh,), dtype, -2.0, 2.0)

    def position_from(theta: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        return tr.inverse(jnp.asarray(theta, dtype))

    return GPModel(nh, nh, logdensity, report, tr.forward, initial_position, True,
                   position_from, logdensity_data=logdensity_data, data=data)


def build_latent_whitened_markov(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    likelihood: LikelihoodSpec,
    aux: Optional[jnp.ndarray] = None,
    jitter: float = mvn.DEFAULT_JITTER,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
) -> GPModel:
    """Whitened latent model over v = [u (nh,), z (n,)] with f = L(θ) z
    realized by the state-space INNOVATION recurrence instead of a dense
    Cholesky (``--approx sde --no-marginalize``; any likelihood).

    The innovation factorization of K + j·I is its unique Cholesky
    factorization in time order (ops/markov_ss.py::ss_innovation_coeffs),
    so for exact blocks this is the SAME model as ``build_latent_whitened``
    on sorted rows — built from two O(n log n) associative scans with no
    n×n matrix and no cholesky custom call (immune to the axon
    worker's batched-cholesky fault),
    and usable at observation counts the dense whitened path cannot touch.
    Reference parity: the whitened non-Gaussian NUTS path
    (src/liklihoods.jl via Turing) at state-space cost."""
    import numpy as _np

    from gaplac_tpu.ops import markov_ss as mss

    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    loglik = make_loglik(likelihood)
    st = _markov_structure(ck, X,
                           dynamic_slots={s for g in slot_groups for s in g})
    ts = jnp.asarray(st.t_sorted, dtype)
    idx = jnp.asarray(st.sort_idx)
    inv_idx = jnp.asarray(_np.argsort(st.sort_idx))
    ys = jnp.asarray(y, dtype)[idx]
    aux_s = None if aux is None else jnp.asarray(aux, dtype)[idx]
    kinds = tuple(b[0] for b in st.blocks)
    xs_sorted = tuple(markov_block_xs(st, jnp.asarray(X, dtype), idx=idx))
    resets_j = tuple(None if r is None else jnp.asarray(r)
                     for r in st.resets)
    data = {"ts": ts, "ys": ys, "xs": xs_sorted, "resets": resets_j,
            "aux": aux_s}

    def _jeff(p):
        # Noise leaves are diagonal kernel components: under whitening they
        # fold into the innovation jitter exactly as in the dense gram
        j = jnp.asarray(jitter, dtype)
        for s in st.noise_slots:
            j = j + p[s]
        return j

    def _steps(p, d):
        return mss.build_steps(kinds, markov_param_vals(ck, st, p, dtype),
                               d["ts"], d["xs"], resets=d["resets"])

    def _whiten(u, z, d):
        theta = tr.forward(u)
        p = params_from(theta)
        A, Q, H = _steps(p, d)
        Kg, S = mss.ss_innovation_coeffs(A, Q, H, _jeff(p))
        return theta, mss.ss_whiten_apply(A, H, Kg, S, z), S

    def logdensity_data(v: jnp.ndarray, d) -> jnp.ndarray:
        u, z = v[:nh], v[nh:]
        _, f, _ = _whiten(u, z, d)
        return (
            jnp.sum(tr.logprior_u(u))
            - 0.5 * jnp.sum(z * z)
            - 0.5 * n * _LOG_2PI
            + jnp.sum(loglik(d["ys"], f, d["aux"]))
        )

    def logdensity(v: jnp.ndarray) -> jnp.ndarray:
        return logdensity_data(v, data)

    def report(key: jax.Array, v: jnp.ndarray, d=None):
        d = data if d is None else d
        u, z = v[:nh], v[nh:]
        theta, f, S = _whiten(u, z, d)
        # log N(f; 0, LLᵀ) = −½(Σz² + Σlog S + n log 2π) — the prediction
        # -error decomposition, identical to mvn_logpdf_chol(L, f)
        lp = (
            jnp.sum(tr.logprior_x(theta))
            - 0.5 * (jnp.sum(z * z) + jnp.sum(jnp.log(S)) + n * _LOG_2PI)
            + jnp.sum(loglik(d["ys"], f, d["aux"]))
        )
        return theta, f[inv_idx], lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        ku, kz = jax.random.split(key)
        u0 = jax.random.uniform(ku, (nh,), dtype, -2.0, 2.0)
        z0 = 0.1 * jax.random.normal(kz, (n,), dtype)
        return jnp.concatenate([u0, z0])

    def position_from(theta: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        u = tr.inverse(jnp.asarray(theta, dtype))
        p = params_from(tr.forward(u))
        A, Q, H = _steps(p, data)
        Kg, S = mss.ss_innovation_coeffs(A, Q, H, _jeff(p))
        z = mss.ss_unwhiten(A, H, Kg, S, jnp.asarray(f, dtype)[idx])
        return jnp.concatenate([u, z])

    return GPModel(nh + n, nh, logdensity, report, tr.forward,
                   initial_position, False, position_from,
                   logdensity_data=logdensity_data, data=data)


def build_latent_whitened(
    ck: CompiledKernel,
    slot_groups: Tuple[Tuple[int, ...], ...],
    X: jnp.ndarray,
    y: jnp.ndarray,
    likelihood: LikelihoodSpec,
    aux: Optional[jnp.ndarray] = None,
    jitter: float = mvn.DEFAULT_JITTER,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
) -> GPModel:
    """Whitened latent model over v = [u (nh,), z (n,)]: f = L(θ) z."""
    tr = as_prior(prior_bounds)
    nh = len(slot_groups)
    n = y.shape[0]
    dtype = X.dtype
    params_from = _params_from(ck, slot_groups, dtype)
    loglik = make_loglik(likelihood)
    y = jnp.asarray(y, dtype)
    aux_arr = None if aux is None else jnp.asarray(aux, dtype)
    # hot path: θ-independent gram structure + jitter·I precomputed once
    dynamic = tuple(sorted({s for g in slot_groups for s in g}))
    gram_bound = ck.bind(X, dynamic, diag=jitter)

    def _latent_chol(u):
        theta = tr.forward(u)
        K = gram_bound(params_from(theta))
        return theta, linalg.cholesky(K)

    def logdensity(v: jnp.ndarray) -> jnp.ndarray:
        u, z = v[:nh], v[nh:]
        _, L = _latent_chol(u)
        f = L @ z
        return (
            jnp.sum(tr.logprior_u(u))
            - 0.5 * jnp.sum(z * z)
            - 0.5 * n * _LOG_2PI
            + jnp.sum(loglik(y, f, aux_arr))
        )

    def report(key: jax.Array, v: jnp.ndarray):
        u, z = v[:nh], v[nh:]
        theta, L = _latent_chol(u)
        f = L @ z
        lp = (
            jnp.sum(tr.logprior_x(theta))
            + mvn.mvn_logpdf_chol(L, f)
            + jnp.sum(loglik(y, f, aux_arr))
        )
        return theta, f, lp

    def initial_position(key: jax.Array) -> jnp.ndarray:
        ku, kz = jax.random.split(key)
        u0 = jax.random.uniform(ku, (nh,), dtype, -2.0, 2.0)
        z0 = 0.1 * jax.random.normal(kz, (n,), dtype)
        return jnp.concatenate([u0, z0])

    def position_from(theta: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        u = tr.inverse(jnp.asarray(theta, dtype))
        _, L = _latent_chol(u)
        z = linalg.solve_triangular(L, jnp.asarray(f, dtype), lower=True)
        return jnp.concatenate([u, z])

    return GPModel(nh + n, nh, logdensity, report, tr.forward, initial_position, False,
                   position_from)


def build_model(
    ck: CompiledKernel,
    inferable: Sequence[str],
    X: jnp.ndarray,
    y: jnp.ndarray,
    likelihood: LikelihoodSpec,
    aux: Optional[jnp.ndarray] = None,
    jitter: float = mvn.DEFAULT_JITTER,
    prior_bounds: Tuple[float, float] = DEFAULT_PRIOR_BOUNDS,
    shared_hyper: bool = True,
    marginalize: bool = True,
    approx: str = "exact",
    rff_features: int = 256,
    rff_seed: int = 0,
    infer_extras: Sequence[str] = (),
) -> GPModel:
    """Pick the marginalized path for Gaussian likelihoods (default), the
    whitened latent path otherwise.  ``approx="rff"`` selects the low-rank
    feature-space marginal (Gaussian likelihoods only)."""
    groups = slot_groups_for(ck, inferable, shared=shared_hyper,
                             infer_extras=infer_extras)
    sigma2 = gaussian_obs_sigma2(likelihood)
    if approx == "sde":
        if not marginalize:
            # joint (whitened) sampling over [θ, z] — f = Lz via the
            # innovation recurrence; exact NUTS for ANY likelihood at
            # state-space cost
            return build_latent_whitened_markov(
                ck, groups, X, y, likelihood, aux=aux, jitter=jitter,
                prior_bounds=prior_bounds,
            )
        if sigma2 is None:
            # non-Gaussian: Laplace-marginalize the latents with every dense
            # solve replaced by an O(n log n) Kalman pass
            from gaplac_tpu.inference.laplace import (
                build_laplace_marginal_markov,
            )

            return build_laplace_marginal_markov(
                ck, groups, X, y, likelihood, aux=aux, jitter=jitter,
                prior_bounds=prior_bounds,
            )
        return build_gaussian_marginal_markov(
            ck, groups, X, y, jitter=jitter, obs_sigma2=sigma2,
            prior_bounds=prior_bounds,
        )
    if approx == "rff":
        if sigma2 is None:
            raise ValueError(
                "--approx rff requires a Gaussian likelihood (the low-rank "
                "path marginalizes the latents analytically)"
            )
        if infer_extras:
            raise ValueError(
                "--infer-extra is not supported with --approx rff: the "
                "feature expansion is drawn from the spectral density at the "
                "STATIC shape parameters (period/alpha), so they cannot vary "
                "per density evaluation"
            )
        return build_gaussian_marginal_lowrank(
            ck, groups, X, y, num_features=rff_features, feature_seed=rff_seed,
            jitter=jitter, obs_sigma2=sigma2, prior_bounds=prior_bounds,
        )
    if marginalize and sigma2 is not None:
        return build_gaussian_marginal(
            ck, groups, X, y, jitter=jitter, obs_sigma2=sigma2, prior_bounds=prior_bounds
        )
    return build_latent_whitened(
        ck, groups, X, y, likelihood, aux=aux, jitter=jitter, prior_bounds=prior_bounds
    )
