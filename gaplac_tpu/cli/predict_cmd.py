"""`predict` command — posterior predictions at --at/--atdata points.

The reference registers this command with help text but never implements it
(SURVEY.md §2.3.8).  The contract comes from the legacy CLI
(bin/old_options.jl:62-87) and its test script (test/pred.jl:6-14): given a
formula, training --data, an optional --mcmc chain of hyperparameter draws,
and --at points, output a table with the at-variables plus

    ymu    - posterior mean of the latent GP
    yQ050  - 5% quantile   }  of the posterior (mixture over chain draws
    yQ950  - 95% quantile  }  when --mcmc is given)

Quantiles are of the latent GP posterior (the smooth band); with a chain the
posterior is a Gaussian mixture over draws and quantiles are found by
vectorized bisection on the mixture CDF.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.special import ndtr

from gaplac_tpu.cli.common import design_matrix, response_vector
from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import complete_cases, df_output, load_tables, read_table
from gaplac_tpu.dsl import build_at_frame, parse_formula
from gaplac_tpu.inference.likelihoods import gaussian_obs_sigma2
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn

log = logging.getLogger("gaplac")

MAX_CHAIN_DRAWS = 200  # thin chains beyond this for prediction


def _hyper_draws(chain_path: str, n_hyper: int) -> np.ndarray:
    """(draws, n_hyper) hyperparameter draws from an mcmc chain table."""
    from gaplac_tpu.cli.common import resolve_hyper_columns

    df = read_table(chain_path)
    names = resolve_hyper_columns(df, n_hyper, chain_path)
    draws = df[names].to_numpy(dtype=float)
    if len(draws) > MAX_CHAIN_DRAWS:
        idx = np.linspace(0, len(draws) - 1, MAX_CHAIN_DRAWS).astype(int)
        draws = draws[idx]
    return draws


def mixture_quantiles(mus: np.ndarray, sds: np.ndarray, qs=(0.05, 0.95)) -> np.ndarray:
    """Quantiles of an equal-weight Gaussian mixture, per column.

    mus/sds: (draws, points).  Returns (len(qs), points).
    """
    lo = (mus - 6 * sds).min(axis=0)
    hi = (mus + 6 * sds).max(axis=0)
    out = np.empty((len(qs), mus.shape[1]))
    for qi, q in enumerate(qs):
        a, b = lo.copy(), hi.copy()
        for _ in range(60):
            mid = 0.5 * (a + b)
            cdf = ndtr((mid[None, :] - mus) / sds).mean(axis=0)
            smaller = cdf < q
            a = np.where(smaller, mid, a)
            b = np.where(smaller, b, mid)
        out[qi] = 0.5 * (a + b)
    return out


def run(args) -> None:
    log.info("running 'predict'")
    spec = parse_formula(args.formula)
    ck = compile_formula(spec.formula)
    dtype = default_dtype()

    from gaplac_tpu.cli.common import apply_outlier_policy

    df = complete_cases(load_tables(args.data))
    df = apply_outlier_policy(df, args, spec.response)
    y = jnp.asarray(response_vector(df, spec), dtype)

    # points to predict at
    if args.atdata:
        tdf = complete_cases(load_tables(args.atdata))
    elif args.at:
        tdf = build_at_frame(args.at, formula=spec.formula, seed=args.seed)
    else:
        raise ValueError("'predict' requires either '--at' or '--atdata'")
    # categorical codes must be consistent ACROSS the two tables
    from gaplac_tpu.cli.common import design_matrices

    X_np, Xt_np = design_matrices(df, tdf, ck)
    X = jnp.asarray(X_np, dtype)
    Xt = jnp.asarray(Xt_np, dtype)

    if getattr(args, "approx", "none") == "auto":
        from gaplac_tpu.inference.routing import resolve_auto_approx

        resolve_auto_approx(args, ck, np.vstack([X_np, Xt_np]), "predict", spec)

    sigma2 = gaussian_obs_sigma2(spec.likelihood)
    if sigma2 is None:
        log.warning(
            "predict currently uses the Gaussian predictive equations; "
            "non-Gaussian likelihood %s treated as Gaussian(1)", spec.likelihood.name
        )
        sigma2 = 1.0

    if args.mcmc:
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
            from gaplac_tpu.cli.common import default_slot_groups

            slot_groups = default_slot_groups(ck)
        thetas = _hyper_draws(args.mcmc, n_hyper=len(slot_groups))
    else:
        thetas = np.zeros((1, 0))
        slot_groups = ()

    def _params(theta):
        p = ck.default_params(dtype)
        for g, slots in enumerate(slot_groups):
            p = p.at[jnp.asarray(slots)].set(theta[g])
        return p

    if getattr(args, "approx", "none") == "rff":
        # large-n path: weight-space posterior through the feature map —
        # O(n m^2) instead of the dense O(n^3); exact for finite-rank
        # formulas, RFF-approximate for stationary leaves.  Vocabularies are
        # collected over BOTH tables so Cat codes stay consistent.
        from gaplac_tpu.kernels.features import build_feature_map
        from gaplac_tpu.ops import lowrank

        fm = build_feature_map(
            ck, [X_np, Xt_np],
            num_features=getattr(args, "rff_features", 256),
            seed=getattr(args, "rff_seed", 0),
        )

        def predict_one(theta):
            p = _params(theta)
            phi = fm.phi(p, X)
            d0 = fm.noise_diag(p, X) + args.jitter
            post = lowrank.lowrank_posterior(phi, d0 + sigma2, y)
            phi_t = fm.phi(p, Xt)
            mu = lowrank.lowrank_predict_mean(post, phi_t)
            var = lowrank.lowrank_predict_var(
                post, phi_t, fm.noise_diag(p, Xt) + args.jitter
            )
            return mu, jnp.maximum(var, 1e-12)
    elif getattr(args, "approx", "none") == "sde":
        # exact O((n+nt) log) state-space path for (possibly Cat-grouped)
        # OU/Matern/Constant/Linear (+ Noise) formulas: smoothing instead of
        # the dense O(n^3) solve
        from gaplac_tpu.inference.model import (
            _markov_structure, markov_block_xs, markov_order_resets,
            markov_param_vals,
        )
        from gaplac_tpu.ops import markov
        from gaplac_tpu.ops import markov_ss as mss

        st = _markov_structure(
            ck, X, dynamic_slots={s for g in slot_groups for s in g},
        )
        kinds = tuple(b[0] for b in st.blocks)
        # windowed smoothing: at high state dims the monolithic program is
        # COMPILE-bound (d=42 at n=2^17 never finished in 35 min on the
        # remote TPU compile service) — chunk into fixed windows with
        # overlap context; auto-on for d > 24 at large joined n
        d_total = sum(mss.block_dim(k) for k in kinds)
        window = getattr(args, "sde_window", None)
        n_joined = X.shape[0] + Xt.shape[0]
        if window is None:
            window = (1 << 14) if (d_total > 24 and n_joined > (1 << 15)) else 0
            if window:
                log.info(
                    "state dim %d > 24 at joined n=%d: windowed smoothing on "
                    "(--sde-window %d; 0 forces monolithic)",
                    d_total, n_joined, window,
                )
        overlap = getattr(args, "sde_overlap", None)
        # joined train+test sort order / group-reset masks (static)
        order_j, _, resets_j = markov_order_resets(
            st, np.vstack([X_np, Xt_np])
        )
        order_j = jnp.asarray(order_j)
        if st.time_col >= 0:
            t_train, t_new = X[:, st.time_col], Xt[:, st.time_col]
        else:  # no Markov leaf: transitions are dt-independent
            n_tr = X.shape[0]
            t_train = jnp.arange(n_tr, dtype=dtype)
            t_new = n_tr + jnp.arange(Xt.shape[0], dtype=dtype)
        xs_train = markov_block_xs(st, X)
        xs_new = markov_block_xs(st, Xt)

        def predict_one(theta):
            p = _params(theta)
            j_eff = args.jitter
            for s in st.noise_slots:
                j_eff = j_eff + p[s]
            if st.scalar_ou:
                idx = jnp.asarray(st.sort_idx)
                mu, var_x = markov.ou_posterior_predict(
                    jnp.asarray(st.t_sorted, dtype), y[idx],
                    p[st.blocks[0][1]], j_eff + sigma2, t_new
                )
            else:
                vals = markov_param_vals(ck, st, p, dtype)
                mu, var_x = mss.ss_predict(
                    kinds, vals, t_train, xs_train,
                    y, j_eff + sigma2, t_new, xs_new,
                    order=order_j, resets=resets_j,
                    window=window or None, overlap=overlap,
                )
            # latent at new points = process + independent jitter/noise diag
            return mu, jnp.maximum(var_x + j_eff, 1e-12)
    else:

        def predict_one(theta):
            p = _params(theta)
            K_xx = ck.gram(p, X)
            K_tx = ck.gram(p, Xt, X)
            k_tt = ck.gram_diag(p, Xt) + args.jitter
            post = mvn.gp_posterior_cache(
                K_xx + args.jitter * jnp.eye(X.shape[0], dtype=dtype), y, sigma2
            )
            mu = mvn.gp_predict_mean(post, K_tx)
            var = mvn.gp_predict_var(post, K_tx, k_tt)
            return mu, jnp.maximum(var, 1e-12)

    # lax.map keeps peak memory at one draw's O(n^2) buffers (a vmap would
    # batch every draw's Gram + Cholesky simultaneously) while still paying
    # a single dispatch
    mus_j, vars_j = jax.jit(lambda ts: jax.lax.map(predict_one, ts))(
        jnp.asarray(thetas, dtype)
    )
    mus = np.asarray(mus_j)
    sds = np.sqrt(np.asarray(vars_j))

    ymu = mus.mean(axis=0)
    q05, q95 = mixture_quantiles(mus, sds, (0.05, 0.95))

    out = tdf.copy()
    out["ymu"] = ymu
    out["yQ050"] = q05
    out["yQ950"] = q95
    df_output(out, args.output)

    if args.plot:
        from gaplac_tpu.viz.plots import predict_plot

        if not ck.varnames:
            raise ValueError(
                "--plot needs a formula with at least one variable "
                "(bare Noise/Constant has no x-axis)"
            )
        xvar = ck.varnames[0]
        fig = predict_plot(
            tdf[xvar].values, ymu, q05, q95,
            data_x=df[xvar].values if xvar in df.columns else None,
            data_y=df[spec.response].values if spec.response in df.columns else None,
            xlabel=xvar, ylabel=spec.response,
        )
        fig.savefig(args.plot, dpi=120)
        log.info("Saved plot to %s", args.plot)
