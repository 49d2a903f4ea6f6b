"""`fitplot` command — per-component posterior decomposition plots.

The reference registers this command but never implements it (SURVEY.md
§2.3.8); the legacy contract (bin/old_options.jl:119-142) is diagnostic plots
of the posterior of each additive component of the GP.

For an additive kernel K = sum_t K_t, the posterior of component t at the
training inputs is

    mu_t  = K_t (K + noise I)^{-1} y
    var_t = diag(K_t) - rows of K_t (K + noise I)^{-1} K_t

Each component is plotted against its first variable (sorted), mean +- 2 sd.
With --mcmc, hyperparameters are set to the chain's posterior means.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from gaplac_tpu.cli.common import design_matrix, response_vector
from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import complete_cases, load_tables
from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.likelihoods import gaussian_obs_sigma2
from gaplac_tpu.kernels.covariance import CompiledKernel, compile_formula
from gaplac_tpu.ops import linalg, mvn

log = logging.getLogger("gaplac")


def term_gram(ck: CompiledKernel, term_idx: int, params, X1, X2=None):
    """Gram of a single additive term (product of its leaves)."""
    sub = CompiledKernel(
        ck.varnames, ck.kinds, ck.cols, (ck.terms[term_idx],), ck.defaults,
        ck.leaf_vars, ck.extras
    )
    return sub.gram(params, X1, X2)


def term_label(ck: CompiledKernel, term_idx: int) -> str:
    from gaplac_tpu.kernels.covariance import KIND_NAMES as kind_names

    parts = []
    for li in ck.terms[term_idx]:
        v = ck.leaf_vars[li]
        parts.append(f"{kind_names[ck.kinds[li]]}({v})" if v else kind_names[ck.kinds[li]])
    return " * ".join(parts)


def _lowrank_component_stats(args, ck, params, X, y, noise):
    """Per-component posterior through the feature path (--approx rff).

    With K = Phi Phi^T + diag(noise_diag) and S = K + noise I, component t is
    either a feature block s (K_t = Phi_s Phi_s^T) or a bare-Noise diag term
    (K_t = diag(d_t)); mu_t = K_t S^-1 y and var_t = diag(K_t - K_t S^-1 K_t)
    reduce to O(n m |s|) matmuls via the Woodbury factorization — no n x n
    matrix is formed (the large-n fitplot mode)."""
    import numpy as _np

    from gaplac_tpu.kernels.features import build_feature_map
    from gaplac_tpu.ops import lowrank

    fm = build_feature_map(
        ck, [_np.asarray(X)],
        num_features=getattr(args, "rff_features", 256),
        seed=getattr(args, "rff_seed", 0),
    )
    phi = fm.phi(params, X)
    D = noise + fm.noise_diag(params, X)
    lr = lowrank.lowrank_chol(phi, D)
    alpha = lowrank.lowrank_solve(lr, y)  # S^-1 y

    def component_stats(t):
        sl = fm.term_slices[t]
        if sl is None:  # bare-Noise product term: K_t = diag(d_t)
            d_t = fm.term_diag(params, X, ck.terms[t])
            # diag(S^-1) = 1/D - rowsum(U^2), U = (D^-1 Phi) R^-T
            U = linalg.solve_triangular(lr.R, lr.phi_over_d.T, lower=True).T
            s_inv_diag = 1.0 / lr.d - jnp.sum(U * U, axis=1)
            return d_t * alpha, d_t - d_t * d_t * s_inv_diag
        phi_s = phi[:, sl[0]:sl[1]]
        mu_t = phi_s @ (phi_s.T @ alpha)
        # var_t = diag(K_t) - diag(K_t S^-1 K_t), K_t = Phi_s Phi_s^T
        B = phi_s.T @ lowrank.lowrank_solve(lr, phi_s)  # (|s|, |s|)
        var_t = jnp.sum(phi_s * phi_s, axis=1) - jnp.sum((phi_s @ B) * phi_s, axis=1)
        return mu_t, var_t

    return component_stats


def _sde_component_stats(args, ck, params, X, y, noise):
    """Per-component posterior through the state-space path (--approx sde).

    One full-model smoothing pass gives the joint state posterior; the
    posterior of additive component t is read off by masking the
    measurement row to t's block: mu_t = H_t m_s, var_t = H_t P_s H_tᵀ
    (blocks are independent, so H_t Cov(x,x') Hᵀ = K_t exactly).  Noise
    components use S⁻¹ = R⁻¹I − R⁻²·Var(Hx|y) — all O(n log n), no n×n
    matrix (the legacy fitplot contract, bin/old_options.jl:119-142, at
    state-space scale)."""
    import numpy as _np

    from gaplac_tpu.inference.model import (
        _markov_structure, markov_block_xs, markov_param_vals,
    )
    from gaplac_tpu.ops import markov_ss as mss

    dtype = X.dtype
    st = _markov_structure(
        ck, _np.asarray(X),
        dynamic_slots=getattr(args, "_sde_dynamic_slots", ()),
    )
    idx = jnp.asarray(st.sort_idx)
    inv = jnp.asarray(_np.argsort(st.sort_idx))
    ts = jnp.asarray(st.t_sorted, dtype)
    ys = y[idx]
    kinds = tuple(b[0] for b in st.blocks)
    xs_sorted = markov_block_xs(st, X, idx=idx)
    vals = markov_param_vals(ck, st, params, dtype)
    A, Q, H = mss.build_steps(kinds, vals, ts, xs_sorted, resets=st.resets)
    R = jnp.asarray(noise, dtype)
    for s in st.noise_slots:
        R = R + params[s]
    m_s, P_s = mss.ss_smooth(A, Q, H, ys, R)
    h_mean = jnp.einsum("nd,nd->n", H, m_s)
    h_var = jnp.einsum("nd,nde,ne->n", H, P_s, H)
    offs = _np.cumsum([0] + [mss.block_dim(k) for k in kinds])

    def component_stats(t):
        tag, i = st.term_map[t]
        if tag == "n":  # Noise term: K_t = s2 I
            s2 = params[i]
            s_inv_diag = 1.0 / R - h_var / (R * R)
            mu = s2 * (ys - h_mean) / R
            var = s2 - s2 * s2 * s_inv_diag
        else:
            mask = jnp.zeros((H.shape[1],), dtype)
            mask = mask.at[int(offs[i]):int(offs[i + 1])].set(1.0)
            Ht = H * mask[None, :]
            mu = jnp.einsum("nd,nd->n", Ht, m_s)
            var = jnp.einsum("nd,nde,ne->n", Ht, P_s, Ht)
        return mu[inv], var[inv]

    return component_stats


def run(args) -> None:
    log.info("running 'fitplot'")
    spec = parse_formula(args.formula)
    ck = compile_formula(spec.formula)
    dtype = default_dtype()

    from gaplac_tpu.cli.common import apply_outlier_policy

    df = complete_cases(load_tables(args.data))
    df = apply_outlier_policy(df, args, spec.response)
    y = jnp.asarray(response_vector(df, spec), dtype)
    X = jnp.asarray(design_matrix(df, ck), dtype)
    n = X.shape[0]

    if getattr(args, "approx", "none") == "auto":
        from gaplac_tpu.inference.routing import resolve_auto_approx

        resolve_auto_approx(args, ck, np.asarray(X), "fitplot", spec)

    params = ck.default_params(dtype)
    if args.mcmc:
        # same chain->slot-group reconstruction as predict/sample --mcmc
        from gaplac_tpu.cli.common import default_slot_groups
        from gaplac_tpu.cli.predict_cmd import _hyper_draws
        from gaplac_tpu.inference.model import slot_groups_for

        shared = getattr(args, "infer_mode", "shared") == "shared"
        extras = list(getattr(args, "infer_extra", None) or [])
        if extras and getattr(args, "approx", "none") == "rff":
            raise ValueError("--infer-extra chains cannot be used with "
                             "--approx rff (feature maps need static shape "
                             "parameters)")
        if getattr(args, "infer", None) or extras:
            slot_groups = slot_groups_for(ck, args.infer or [], shared=shared,
                                          infer_extras=extras)
        else:
            slot_groups = default_slot_groups(ck)
        args._sde_dynamic_slots = {s for g in slot_groups for s in g}
        means = _hyper_draws(args.mcmc, n_hyper=len(slot_groups)).mean(axis=0)
        for g, slots in enumerate(slot_groups):
            if slots:
                params = params.at[jnp.asarray(slots)].set(float(means[g]))
        log.info(
            "using chain posterior-mean hyperparameters %s",
            ", ".join(f"{m:.3f}" for m in means),
        )

    sigma2 = gaussian_obs_sigma2(spec.likelihood)
    if sigma2 is None:  # non-Gaussian: use unit obs noise for the decomposition
        log.warning(
            "fitplot uses the Gaussian component-posterior equations; "
            "non-Gaussian likelihood %s treated as Gaussian(1)",
            spec.likelihood.name,
        )
        sigma2 = 1.0
    noise = args.jitter + sigma2

    if getattr(args, "approx", "none") == "rff":
        component_stats = _lowrank_component_stats(args, ck, params, X, y, noise)
    elif getattr(args, "approx", "none") == "sde":
        component_stats = _sde_component_stats(args, ck, params, X, y, noise)
    else:
        S = ck.gram(params, X) + noise * jnp.eye(n, dtype=dtype)
        L = linalg.cholesky(S)
        a = linalg.solve_triangular(L, y, lower=True)
        alpha = linalg.solve_triangular(L.T, a, lower=False)

        def component_stats(t):
            """(posterior mean, sd) of additive component t at the inputs."""
            Kt = term_gram(ck, t, params, X)
            mu_t = Kt @ alpha
            V = linalg.solve_triangular(L, Kt, lower=True)
            var_t = jnp.diag(Kt) - jnp.sum(V * V, axis=0)
            return mu_t, var_t

    wanted = None
    if args.component:
        wanted = {v.strip() for v in args.component.split(";") if v.strip()}

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []
    for t in range(len(ck.terms)):
        term_vars = {ck.leaf_vars[li] for li in ck.terms[t] if ck.leaf_vars[li]}
        if wanted is not None and not (term_vars & wanted):
            continue
        mu_t, var_t = component_stats(t)
        panels.append((t, np.asarray(mu_t), np.sqrt(np.maximum(np.asarray(var_t), 0.0))))

    if not panels:
        raise ValueError("No components match --component filter")

    fig, axes = plt.subplots(len(panels), 1, figsize=(8, 3.2 * len(panels)), squeeze=False)
    yv = np.asarray(y)
    for ax_row, (t, mu_t, sd_t) in zip(axes, panels):
        ax = ax_row[0]
        lead = next((ck.leaf_vars[li] for li in ck.terms[t] if ck.leaf_vars[li]), None)
        if lead is not None and lead in df.columns:
            # factorizes string categoricals like the design matrix does
            from gaplac_tpu.cli.common import column_values

            xs = column_values(df, lead)
        else:
            xs = np.arange(n, dtype=float)
        order = np.argsort(xs)
        ax.scatter(xs, yv, s=10, color="gray", alpha=0.4, label="data")
        ax.plot(xs[order], mu_t[order], color="dodgerblue", label="component mean")
        ax.fill_between(
            xs[order], (mu_t - 2 * sd_t)[order], (mu_t + 2 * sd_t)[order],
            color="dodgerblue", alpha=0.25, label="±2 sd",
        )
        ax.set_title(term_label(ck, t))
        ax.set_xlabel(lead or "index")
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    log.info("Saved fitplot to %s", args.output)
    print(f"fitplot written to {args.output} ({len(panels)} component(s))")
