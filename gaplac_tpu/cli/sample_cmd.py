"""`sample` command — draw from the GP prior (or posterior) at given inputs.

Reference parity: /root/reference/CLI/src/sample.jl:7-44 — parse spec, build
kernel, eval --at ranges, Cartesian grid, ``rand(gp(RowVecs(X), 0.1))``,
append response column, table output, optional 1-variable plot (warn for
multivariable formulas).

Legacy envelope (bin/old_options.jl:93-118, test/oldtests.jl:48): ``--data``
conditions the GP on training data and samples the POSTERIOR at the
``--at``/``--atdata`` points; ``--mcmc`` draws the hyperparameters from a
chain row; ``--plotx "x:group"`` plots against x grouped/colored by a
grouping variable.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import df_output, load_tables
from gaplac_tpu.dsl import build_at_frame, parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn

log = logging.getLogger("gaplac")


def run(args) -> None:
    log.info("running 'sample'")
    log.info("%s", vars(args))
    spec = parse_formula(args.spec)
    log.debug("GP spec: %s", spec.formula)

    ck = compile_formula(spec.formula)
    log.debug("Model variables: %s", ck.varnames)

    if getattr(args, "atdata", None):
        from gaplac_tpu.data import complete_cases

        df = complete_cases(load_tables(args.atdata))
    elif args.at:
        df = build_at_frame(args.at, formula=spec.formula, seed=args.seed)
    else:
        raise ValueError("'sample' requires either '--at' or '--atdata'")
    dtype = default_dtype()

    seed = args.seed if args.seed is not None else int(np.random.SeedSequence().entropy % (2**63))
    key = jax.random.key(seed)
    params = ck.default_params(dtype)
    jitter = getattr(args, "jitter", mvn.DEFAULT_JITTER)

    if getattr(args, "approx", "none") == "auto" and not getattr(args, "data", None):
        from gaplac_tpu.cli.common import design_matrix
        from gaplac_tpu.inference.routing import resolve_auto_approx

        resolve_auto_approx(args, ck, design_matrix(df, ck), "sample", spec)

    if getattr(args, "data", None):
        y = _sample_posterior(args, spec, ck, df, params, key, dtype, jitter)
    elif getattr(args, "approx", "none") == "sde":
        # million-point prior draw: exact state-space recurrence, O(n log n)
        from gaplac_tpu.cli.common import design_matrix

        y = _sde_prior_draw(ck, design_matrix(df, ck), params, key, dtype,
                            jitter)
    elif getattr(args, "approx", "none") == "rff":
        # large-n prior draw: f = Phi w + sqrt(jitter + noise) eta, O(n m)
        from gaplac_tpu.cli.common import design_matrix
        from gaplac_tpu.ops import lowrank

        X = jnp.asarray(design_matrix(df, ck), dtype)
        fm = _feature_map(args, ck, [np.asarray(X)])
        phi = fm.phi(params, X)
        y = lowrank.sample_lowrank(key, phi, fm.noise_diag(params, X) + jitter)
    else:
        from gaplac_tpu.cli.common import design_matrix

        X = jnp.asarray(design_matrix(df, ck), dtype)
        K = ck.gram(params, X)
        y = mvn.sample_mvn(key, K, jitter=jitter)  # ref: rand(gp(X, 0.1))
    df[spec.response] = np.asarray(y)

    df_output(df, args.output)

    if args.plot:
        _plot(args, spec, ck, df)


def _sample_posterior(args, spec, ck, tdf, params, key, dtype, jitter):
    """Posterior draw at the test points, conditioned on --data (legacy
    samplegp contract; hyperparameters from a random --mcmc chain row)."""
    from gaplac_tpu.cli.common import (
        apply_outlier_policy, design_matrices, response_vector,
    )
    from gaplac_tpu.data import complete_cases

    df = complete_cases(load_tables(args.data))
    df = apply_outlier_policy(df, args, spec.response)
    y = jnp.asarray(response_vector(df, spec), dtype)
    X_np, Xt_np = design_matrices(df, tdf, ck)
    X, Xt = jnp.asarray(X_np, dtype), jnp.asarray(Xt_np, dtype)

    if getattr(args, "approx", "none") == "auto":
        from gaplac_tpu.inference.routing import resolve_auto_approx

        # route on the joined train+test rows (what the conditional draw
        # actually smooths over)
        resolve_auto_approx(args, ck, np.vstack([X_np, Xt_np]), "sample", spec)

    dynamic_slots = ()
    if getattr(args, "mcmc", None):
        from gaplac_tpu.cli.common import default_slot_groups
        from gaplac_tpu.cli.predict_cmd import _hyper_draws
        from gaplac_tpu.inference.model import slot_groups_for

        shared = getattr(args, "infer_mode", "shared") == "shared"
        extras = list(getattr(args, "infer_extra", None) or [])
        if extras and getattr(args, "approx", "none") == "rff":
            raise ValueError("--infer-extra chains cannot be used with "
                             "--approx rff (feature maps need static shape "
                             "parameters)")
        if args.infer or extras:
            slot_groups = slot_groups_for(ck, args.infer or [], shared=shared,
                                          infer_extras=extras)
        else:
            slot_groups = default_slot_groups(ck)
        dynamic_slots = {s for g in slot_groups for s in g}
        draws = _hyper_draws(args.mcmc, n_hyper=len(slot_groups))
        row = int(jax.random.randint(key, (), 0, len(draws)))
        theta = draws[row]
        log.info("Using hyperparameters from chain row %d: %s", row, theta)
        for g, slots in enumerate(slot_groups):
            params = params.at[jnp.asarray(slots)].set(theta[g])

    from gaplac_tpu.inference.likelihoods import gaussian_obs_sigma2

    sigma2 = gaussian_obs_sigma2(spec.likelihood)
    if sigma2 is None:
        log.warning("non-Gaussian likelihood %s treated as Gaussian(1) for "
                    "posterior sampling", spec.likelihood.name)
        sigma2 = 1.0

    if getattr(args, "approx", "none") == "rff":
        # large-n posterior draw: Matheron pathwise conditioning, O((n+nt) m)
        from gaplac_tpu.ops import lowrank

        fm = _feature_map(args, ck, [X_np, Xt_np])
        phi = fm.phi(params, X)
        d0 = fm.noise_diag(params, X) + jitter
        return lowrank.lowrank_conditional_sample_at(
            jax.random.fold_in(key, 1), phi, d0, sigma2, y,
            fm.phi(params, Xt), fm.noise_diag(params, Xt) + jitter,
        )
    if getattr(args, "approx", "none") == "sde":
        return _sde_posterior_draw(
            ck, X_np, Xt_np, y, params, jax.random.fold_in(key, 1), dtype,
            jitter, sigma2, dynamic_slots=dynamic_slots,
        )

    K_xx = ck.gram(params, X) + jitter * jnp.eye(X.shape[0], dtype=dtype)
    K_tx = ck.gram(params, Xt, X)
    K_tt = ck.gram(params, Xt)
    post = mvn.gp_posterior_cache(K_xx, y, sigma2)
    mu = mvn.gp_predict_mean(post, K_tx)
    cov = mvn.gp_predict_cov(post, K_tx, K_tt)
    return mvn.sample_mvn(jax.random.fold_in(key, 1), cov, mean=mu, jitter=jitter)


def _sde_prior_draw(ck, X_np, params, key, dtype, jitter):
    """Exact state-space prior draw (--approx sde): f = H x* + √j_eff z
    where x* runs the Gauss-Markov recurrence as an associative scan —
    O(n log n), no gram (ref contract: rand(gp(X, 0.1)), sample.jl:25)."""
    from gaplac_tpu.inference.model import (
        _markov_structure, markov_block_xs, markov_param_vals,
    )
    from gaplac_tpu.ops import markov_ss as mss

    st = _markov_structure(ck, X_np)
    idx = jnp.asarray(st.sort_idx)
    inv = jnp.asarray(np.argsort(st.sort_idx))
    ts = jnp.asarray(st.t_sorted, dtype)
    X = jnp.asarray(X_np, dtype)
    xs_sorted = markov_block_xs(st, X, idx=idx)
    vals = markov_param_vals(ck, st, params, dtype)
    A, Q, H = mss.build_steps(tuple(b[0] for b in st.blocks), vals, ts,
                              xs_sorted, resets=st.resets)
    j_eff = jnp.asarray(jitter, dtype)
    for s in st.noise_slots:
        j_eff = j_eff + params[s]
    k1, k2 = jax.random.split(key)
    x = mss.ss_prior_sample(k1, A, Q)
    n = X.shape[0]
    f = (jnp.einsum("nd,nd->n", H, x)
         + jnp.sqrt(j_eff) * jax.random.normal(k2, (n,), dtype))
    return f[inv]


def _sde_posterior_draw(ck, X_np, Xt_np, y, params, key, dtype, jitter,
                        sigma2, dynamic_slots=()):
    """Matheron pathwise posterior draw at the test points through the
    joined train+test state-space smoother (--approx sde):
    f_t = f*_t + K_tx (K + j_eff I + σ² I)⁻¹ (y − f*_x − ε*), where f* is a
    joint prior path and the solve is ss_smooth with the test rows
    unobserved — all O((n+m) log) associative scans, no gram."""
    from gaplac_tpu.inference.model import (
        _markov_structure, markov_block_xs, markov_order_resets,
        markov_param_vals,
    )
    from gaplac_tpu.ops import markov_ss as mss

    st = _markov_structure(ck, X_np, dynamic_slots=dynamic_slots)
    n, m = X_np.shape[0], Xt_np.shape[0]
    J = np.vstack([np.asarray(X_np), np.asarray(Xt_np)])
    order, t_sorted, resets = markov_order_resets(st, J)
    inv = jnp.asarray(np.argsort(order))
    oj = jnp.asarray(order)
    Jj = jnp.asarray(J, dtype)
    ts = jnp.asarray(t_sorted, dtype)
    xs_sorted = markov_block_xs(st, Jj, idx=oj)
    vals = markov_param_vals(ck, st, params, dtype)
    A, Q, H = mss.build_steps(tuple(b[0] for b in st.blocks), vals, ts,
                              xs_sorted, resets=resets)
    j_eff = jnp.asarray(jitter, dtype)
    for s in st.noise_slots:
        j_eff = j_eff + params[s]
    k1, k2, k3 = jax.random.split(key, 3)
    x_star = mss.ss_prior_sample(k1, A, Q)
    f_star = (jnp.einsum("nd,nd->n", H, x_star)
              + jnp.sqrt(j_eff) * jax.random.normal(k2, (n + m,), dtype))
    obs = jnp.asarray(order < n)
    y_pad = jnp.concatenate([jnp.asarray(y, dtype),
                             jnp.zeros((m,), dtype)])[oj]
    eps = jnp.sqrt(jnp.asarray(sigma2, dtype)) * jax.random.normal(
        k3, (n + m,), dtype)
    r = jnp.where(obs, y_pad - f_star - eps, 0.0)
    m_s, _ = mss.ss_smooth(A, Q, H, r, j_eff + sigma2, obs=obs)
    f = f_star + jnp.einsum("nd,nd->n", H, m_s)
    return f[inv][n:]


def _feature_map(args, ck, mats):
    from gaplac_tpu.kernels.features import build_feature_map

    return build_feature_map(
        ck, mats,
        num_features=getattr(args, "rff_features", 256),
        seed=getattr(args, "rff_seed", 0),
    )


def _plot(args, spec, ck, df) -> None:
    from gaplac_tpu.viz.plots import grouped_sample_plot, sample_plot

    plotx = getattr(args, "plotx", None)
    group = None
    if plotx:
        xvar, _, group = plotx.partition(":")
        xvar = xvar.strip()
        group = group.strip() or None
        if xvar not in df.columns or (group and group not in df.columns):
            raise ValueError(f"--plotx names unknown column(s) in {plotx!r}")
    elif len(set(ck.varnames)) == 1:
        xvar = ck.varnames[0]
    else:
        log.warning(
            "Auto-generated sample plots not available for multivariable models, "
            "use `--plotx x[:group]` or `--output` to make a table and plot manually"
        )
        return
    log.info("Plotting output")
    if group or len(set(ck.varnames)) > 1:
        # grouped or multivariable: scatter/lines per group (no 1-D GP refit)
        fig = grouped_sample_plot(
            df[xvar].values, df[spec.response].values,
            df[group].values if group else None,
            xlabel=xvar, ylabel=spec.response, grouplabel=group,
        )
    else:
        fig = sample_plot(
            ck, df[xvar].values, df[spec.response].values,
            xlabel=xvar, ylabel=spec.response,
        )
    fig.savefig(args.plot, dpi=120)
    log.info("Saved plot to %s", args.plot)
