"""`mcmc` command — NUTS posterior over kernel hyperparameters.

Reference parity: /root/reference/CLI/src/mcmc.jl:11-45 — read data, build
the model (prior Uniform(0,20), latent jitter 0.1, obs sigma 1, one shared
scalar for all --infer vars), ``sample(m, NUTS(0.65), n)``, chain table with
hyperparameter, fx[i] and lp columns.

TPU-first differences (documented capability upgrades):
  - Gaussian likelihoods are analytically marginalized by default (same
    posterior, NUTS dim = #hyperparams instead of 1+n); ``--no-marginalize``
    restores the reference's joint formulation.
  - ``--chains N`` runs N chains vmapped/sharded over devices with per-chain
    threefry keys; cross-chain split-Rhat/ESS are reported.
  - ``--burnin/--thin`` (legacy flags, bin/old_options.jl:44-52),
    ``--checkpoint/--resume`` for restartable sampling (SURVEY.md §5).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gaplac_tpu.cli.common import design_matrix, response_vector, column_values
from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import df_output, load_tables, read_table
from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.diagnostics import summarize
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.inference.nuts import run_nuts
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.parallel.mesh import shard_chain_axis

log = logging.getLogger("gaplac")

HYPER_COL = "ℓ"  # reference chain schema (Turing's ℓ column)


def parse_prior(s: str):
    """--prior string -> priors.Prior (Uniform/LogNormal/Gamma/TruncatedNormal;
    the reference hardcodes Uniform(0,20), mcmc.jl:32)."""
    from gaplac_tpu.inference.priors import parse_prior as _parse

    return _parse(s)


def run(args) -> None:
    log.info("running 'mcmc'")
    spec = parse_formula(args.formula)
    log.debug("GP formula: %s", spec.formula)

    df = load_tables(args.data)
    from gaplac_tpu.cli.common import apply_outlier_policy

    df = apply_outlier_policy(df, args, spec.response)
    ck = compile_formula(spec.formula)
    inferable = list(args.infer or [])
    infer_extras = list(getattr(args, "infer_extra", None) or [])
    if not inferable and not infer_extras:
        raise ValueError("mcmc needs --infer and/or --infer-extra")
    log.debug("Model variables: %s", ck.varnames)

    dtype = default_dtype()
    y = jnp.asarray(response_vector(df, spec), dtype)
    X = jnp.asarray(design_matrix(df, ck), dtype)
    aux = None
    if spec.likelihood.colref is not None:
        aux = jnp.asarray(column_values(df, spec.likelihood.colref), dtype)

    if getattr(args, "check_numerics", False):
        jax.config.update("jax_debug_nans", True)
        log.info("numerics checking enabled (jax_debug_nans)")

    prior_bounds = parse_prior(args.prior)
    shared = getattr(args, "infer_mode", "shared") == "shared"
    if getattr(args, "approx", "none") == "auto":
        from gaplac_tpu.inference.model import slot_groups_for
        from gaplac_tpu.inference.routing import choose_approx

        try:
            ds = {s for g in slot_groups_for(
                ck, inferable, shared=shared, infer_extras=infer_extras)
                for s in g}
        except ValueError:
            ds = ()
        args.approx = choose_approx(ck, np.asarray(X), "mcmc",
                                    likelihood=spec.likelihood,
                                    dynamic_slots=ds)
    if getattr(args, "approx", "none") == "sde":
        # stash what the post-sampling accuracy guard needs (the SqExp/RQ
        # lengthscale envelope check; inference/routing.py)
        from gaplac_tpu.inference.model import slot_groups_for
        from gaplac_tpu.inference.routing import sde_structure_info

        try:
            _groups = slot_groups_for(ck, inferable, shared=shared,
                                      infer_extras=infer_extras)
            d_g, _, st_g = sde_structure_info(
                ck, np.asarray(X), {s for g in _groups for s in g})
            args._sde_guard = ((ck, np.asarray(X), st_g, _groups)
                               if d_g is not None else None)
        except ValueError:
            args._sde_guard = None
    if getattr(args, "approx", "none") == "laplace":
        from gaplac_tpu.inference.laplace import build_laplace_marginal
        from gaplac_tpu.inference.likelihoods import gaussian_obs_sigma2
        from gaplac_tpu.inference.model import slot_groups_for

        if gaussian_obs_sigma2(spec.likelihood) is not None:
            raise ValueError(
                "--approx laplace is for non-Gaussian likelihoods; Gaussian "
                "data already uses the exact marginalized path"
            )
        model = build_laplace_marginal(
            ck, slot_groups_for(ck, inferable, shared=shared,
                                infer_extras=infer_extras), X, y,
            spec.likelihood, aux=aux, jitter=args.jitter, prior_bounds=prior_bounds,
        )
    else:
        approx = getattr(args, "approx", "none")
        model = build_model(
            ck,
            inferable,
            X,
            y,
            spec.likelihood,
            aux=aux,
            jitter=args.jitter,
            prior_bounds=prior_bounds,
            shared_hyper=shared,
            marginalize=not args.no_marginalize,
            approx=approx if approx in ("rff", "sde") else "exact",
            rff_features=getattr(args, "rff_features", 256),
            rff_seed=getattr(args, "rff_seed", 0),
            infer_extras=infer_extras,
        )
    log.info(
        "model: %s, NUTS dim %d, n=%d obs",
        "marginalized" if model.marginalized else "whitened latent",
        model.dim,
        y.shape[0],
    )

    num_samples = args.samples
    num_warmup = args.warmup if args.warmup is not None else max(num_samples, 200)
    n_chains = args.chains
    # past ~8 lockstep chains the native batched-cholesky faults this
    # image's TPU worker; the pure-HLO route lifts the chain ceiling at a
    # few ms per factorization (ops/cholesky.py::cholesky_nocc)
    from gaplac_tpu.ops import linalg as _linalg

    batchsafe = n_chains > 8 and jax.default_backend() != "cpu"
    _linalg.set_batchsafe_default(batchsafe)
    if batchsafe:
        log.info("chains > 8 on TPU: batch-safe (no-custom-call) cholesky routing on")
    if args.burnin and args.burnin >= num_samples:
        # fail BEFORE sampling: an empty kept-draw slice gives NaN summaries
        # (or an IndexError at checkpoint time) after the whole run
        raise ValueError(
            f"--burnin ({args.burnin}) must be smaller than --samples "
            f"({num_samples}); no draws would remain"
        )

    key = jax.random.key(args.seed)
    k_init, k_run, k_report = jax.random.split(key, 3)

    sampler = getattr(args, "sampler", "nuts")
    if sampler == "advi" and (args.resume or args.checkpoint):
        log.warning(
            "--resume/--checkpoint are not supported with --sampler advi; "
            "ignored (starting fresh, no checkpoint written)",
        )
    if sampler == "advi":
        _run_advi_path(args, model, y, num_samples, n_chains, k_init, k_run, k_report)
        return
    if sampler in ("chees", "hmc"):
        _run_chees_path(args, model, y, num_samples, num_warmup, n_chains,
                        k_init, k_run, k_report, kind=sampler)
        return
    init_keys = jax.random.split(k_init, n_chains)
    run_keys = jax.random.split(k_run, n_chains)

    init_positions = jax.vmap(model.initial_position)(init_keys)

    resume_state = None
    if args.resume:
        if args.resume.endswith((".tsv", ".csv")):
            # legacy chain extension (bin/old_options.jl:43-45): warm-start
            # from the previous chain table's last draws; short re-adaptation
            init_positions = _resume_from_chain(args.resume, model, n_chains, dtype)
            num_warmup = min(num_warmup, 100)
            log.info("extending chain %s (reduced warmup %d)", args.resume, num_warmup)
        else:
            resume_state = _load_checkpoint(args.resume, n_chains, model.dim)
            init_positions = resume_state["positions"]
            num_warmup = 0
            log.info("resuming from %s (warmup skipped)", args.resume)

    def one_chain(k, q0, eps0, im0, d=None):
        return run_nuts(
            k,
            model.logdensity if d is None
            else (lambda u: model.logdensity_data(u, d)),
            q0,
            num_samples,
            num_warmup=num_warmup,
            max_depth=args.max_depth,
            target_accept=args.target_accept,
            initial_step_size=eps0,
            initial_inv_mass=im0,
            # progress callbacks interleave under vmap: single-chain only
            progress=getattr(args, "progress", False) and n_chains == 1,
        )

    from gaplac_tpu.utils import profiling

    t0 = time.time()
    if resume_state is not None:
        eps0s = jnp.broadcast_to(
            jnp.asarray(resume_state["step_size"], dtype), (n_chains,)
        )
        im0s = jnp.broadcast_to(
            jnp.asarray(resume_state["inv_mass"], dtype), (n_chains, model.dim)
        )
        sampler = jax.jit(lambda ks, qs, es, ims, d: jax.vmap(
            lambda k, q, e, im: one_chain(k, q, e, im, d))(ks, qs, es, ims))
    else:
        eps0s = im0s = None
        sampler = jax.jit(lambda ks, qs, d: jax.vmap(
            lambda k, q: one_chain(k, q, None, None, d))(ks, qs))
    run_keys, init_positions = shard_chain_axis(run_keys, init_positions)
    mdata = getattr(model, "data", None)
    with profiling.phase("mcmc.sample+compile"):
        res = (sampler(run_keys, init_positions, mdata)
               if resume_state is None
               else sampler(run_keys, init_positions, eps0s, im0s, mdata))
        # host-transfer sync (block_until_ready is async through the axon tunnel)
        float(jnp.sum(res.step_size))
    elapsed = time.time() - t0
    total = n_chains * (num_samples + num_warmup)
    log.info(
        "sampling done in %.2fs (%.1f transitions/s; %d divergences)",
        elapsed,
        total / elapsed,
        int(np.asarray(res.diverging).sum()),
    )

    # burnin / thin (legacy semantics)
    sl = slice(args.burnin, None, args.thin)
    positions = res.positions[:, sl]
    accepts = res.accept_prob[:, sl]
    depths = res.depths[:, sl]
    divs = res.diverging[:, sl]
    kept = positions.shape[1]

    # materialize chain rows: theta (constrained), latent draw, reference lp
    report_keys = jax.random.split(k_report, n_chains * kept).reshape(n_chains, kept)

    with profiling.phase("mcmc.report"):
        thetas, fs, lps = _chain_report(
            model, report_keys, positions,
            want_latents=not getattr(args, "no_latents", False),
        )

    if args.checkpoint:
        _save_checkpoint(args.checkpoint, positions, res)
        log.info("checkpoint written to %s", args.checkpoint)

    _emit_chains(
        args, model, y.shape[0], thetas, fs, lps,
        accepts=np.asarray(accepts), depths=np.asarray(depths), divs=np.asarray(divs),
    )


def _chain_report(model, report_keys, positions, want_latents=True):
    """(chains, draws) report materialization; lax.map over draws keeps peak
    memory at one draw's O(n^2) buffers.

    ``want_latents=False`` (--no-latents): the per-draw latent f is reduced to
    lp INSIDE the map and discarded, so the (chains, draws, n) stacked buffer
    never exists on device or host — at large n that buffer is the peak
    (8 chains x 200 draws x 262144 f32 ~ 1.7 GB)."""

    @jax.jit
    def go(keys, qs, d):
        @jax.vmap
        def per_chain(keys, qs):
            def one(kq):
                theta, f, lp = (model.report(*kq) if d is None
                                else model.report(kq[0], kq[1], d))
                return (theta, f, lp) if want_latents else (theta, lp)

            return jax.lax.map(one, (keys, qs))

        return per_chain(keys, qs)

    mdata = getattr(model, "data", None)
    if want_latents:
        thetas, fs, lps = go(report_keys, positions, mdata)
        return np.asarray(thetas), np.asarray(fs), np.asarray(lps)
    thetas, lps = go(report_keys, positions, mdata)
    return np.asarray(thetas), None, np.asarray(lps)


def _emit_chains(args, model, n_obs, thetas, fs, lps, accepts=None, depths=None,
                 divs=None, step_size=None, traj_length=None):
    """Write the reference-schema chain table and posterior summary.

    thetas: (chains, draws, n_hyper), fs: (chains, draws, n), lps: (chains, draws).
    Sampler-stat columns (all optional): per-draw ``accepts`` (chains, draws);
    NUTS adds ``depths``/``divs``; the lockstep samplers add the adapted
    ``step_size`` (and ChEES's ``traj_length``) as scalar-repeat columns so
    the chain table alone diagnoses a run (ref: Turing chain internals
    surfaced via _df_output, /root/reference/CLI/src/mcmc.jl:42).
    """
    n_chains, kept = lps.shape
    frames = []
    for c in range(n_chains):
        cols = {
            "iteration": np.arange(1, kept + 1),
            "chain": np.full(kept, c + 1),
            HYPER_COL: thetas[c, :, 0],
        }
        for g in range(1, model.n_hyper):
            cols[f"{HYPER_COL}_{g+1}"] = thetas[c, :, g]
        if not getattr(args, "no_latents", False):
            for i in range(n_obs):
                cols[f"fx[{i+1}]"] = fs[c, :, i]
        cols["lp"] = lps[c]
        if accepts is not None:
            cols["acceptance_rate"] = accepts[c]
        if depths is not None:
            cols["tree_depth"] = depths[c]
        if divs is not None:
            cols["numerical_error"] = divs[c].astype(int)
        if step_size is not None:
            cols["step_size"] = np.full(kept, float(step_size))
        if traj_length is not None:
            cols["traj_length"] = np.full(kept, float(traj_length))
        frames.append(pd.DataFrame(cols))
    chain_df = pd.concat(frames, ignore_index=True)

    df_output(chain_df, args.output)

    # sde accuracy guard: warn (log + stdout) when posterior SqExp/RQ
    # lengthscale mass sits in the measured >0.5-nat error band
    guard_info = getattr(args, "_sde_guard", None)
    if guard_info is not None:
        from gaplac_tpu.inference.routing import sde_lengthscale_guard

        gck, gX, gst, ggroups = guard_info
        msg = sde_lengthscale_guard(gck, gst, gX, thetas, ggroups)
        if msg:
            print(f"WARNING: {msg}")

    # posterior summary (+ cross-chain diagnostics when chains > 1)
    for g in range(model.n_hyper):
        name = HYPER_COL if g == 0 else f"{HYPER_COL}_{g+1}"
        s = summarize(name, jnp.asarray(thetas[:, :, g]))
        log.info(
            "%s: mean %.4f  sd %.4f  5%%..95%% [%.3f, %.3f]  Rhat %.3f  ESS %.0f",
            name, s["mean"], s["std"], s["q5"], s["q95"], s["rhat"], s["ess"],
        )
        print(
            f"posterior {name}: mean {s['mean']:.4f} sd {s['std']:.4f} "
            f"[{s['q5']:.3f}, {s['q95']:.3f}]"
            + (f" Rhat {s['rhat']:.3f} ESS {s['ess']:.0f}" if n_chains > 1 else "")
        )

    if args.plot:
        from gaplac_tpu.viz.plots import trace_plot

        names = [HYPER_COL] + [f"{HYPER_COL}_{g+1}" for g in range(1, model.n_hyper)]
        fig = trace_plot(thetas, names)
        fig.savefig(args.plot, dpi=120)
        log.info("Saved trace plot to %s", args.plot)


def _run_chees_path(args, model, y, num_samples, num_warmup, n_chains,
                    k_init, k_run, k_report, kind="chees"):
    """Lockstep batched-chain HMC paths: --sampler chees (cross-chain
    step-size/trajectory adaptation, inference/chees.py::run_chees) and
    --sampler hmc (fixed --leapfrogs trajectories, pure static-scan control
    flow — run_hmc)."""
    import time as _time

    from gaplac_tpu.inference.chees import run_chees, run_hmc
    from gaplac_tpu.utils import profiling

    if kind == "chees" and n_chains < 4:
        log.warning(
            "ChEES adapts its trajectory length from cross-chain statistics; "
            "--chains %d is small, using 8", n_chains,
        )
        n_chains = max(n_chains, 8)

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    q0 = jax.vmap(model.initial_position)(jax.random.split(k_init, n_chains))
    eps0, t_len0, im0 = 0.1, 1.0, None
    if args.resume:
        if args.resume.endswith((".tsv", ".csv")):
            # legacy chain extension: warm-start positions from the table's
            # last draws; short re-adaptation (matches the NUTS path)
            q0 = _resume_from_chain(args.resume, model, n_chains, dtype)
            num_warmup = min(num_warmup, 100)
            log.info("extending chain %s (reduced warmup %d)",
                     args.resume, num_warmup)
        else:
            # checkpoint resume: positions + adapted eps/mass (+ ChEES T),
            # warmup skipped entirely
            state = _load_checkpoint(args.resume, n_chains, model.dim)
            q0 = jnp.asarray(state["positions"], dtype)
            eps0 = float(np.mean(np.asarray(state["step_size"])))
            im = np.asarray(state["inv_mass"])
            im0 = jnp.asarray(im.mean(0) if im.ndim == 2 else im, dtype)
            t_len0 = float(np.mean(np.asarray(
                state.get("traj_length", t_len0))))
            num_warmup = 0
            log.info("resuming from %s (warmup skipped)", args.resume)

    # segmented host-driven sampling (--sampler hmc): jit one short segment,
    # loop from the host — breaks the n >= 2^18 program-size worker fault
    # (the monolithic sampler executable reaches 200 MB at n=2^19 while
    # value+grad-scale programs run clean; inference/segmented.py)
    segments = getattr(args, "segments", None)
    if kind == "hmc":
        if segments is None:
            segments = 25 if y.shape[0] >= (1 << 18) else 0
            if segments:
                log.info(
                    "n=%d >= 2^18: segmented host-driven sampling on "
                    "(--segments %d; 0 forces monolithic)",
                    y.shape[0], segments,
                )
    elif segments:
        log.warning("--segments only applies to --sampler hmc; ignored")
        segments = 0
    if kind == "hmc" and segments:
        from gaplac_tpu.inference.segmented import run_hmc_segmented

        ckpt_cb = None
        if args.checkpoint:
            def ckpt_cb(state):
                np.savez(args.checkpoint, **state)

        t0 = _time.time()
        with profiling.phase("mcmc.hmc-segmented+compile"):
            res = run_hmc_segmented(
                k_run, model.logdensity, q0, num_samples,
                num_warmup=num_warmup,
                num_leapfrogs=getattr(args, "leapfrogs", 32),
                target_accept=args.target_accept,
                init_step_size=eps0, init_inv_mass=im0,
                segment_size=segments,
                data=getattr(model, "data", None),
                logdensity_data=(getattr(model, "logdensity_data", None)
                                 if getattr(model, "data", None) is not None
                                 else None),
                checkpoint_cb=ckpt_cb,
                progress=getattr(args, "progress", False),
            )
        _report_lockstep(args, model, y, res, kind, n_chains, num_samples,
                         num_warmup, _time.time() - t0, k_report)
        return

    t0 = _time.time()
    with profiling.phase(f"mcmc.{kind}+compile"):
        # data (when the model exposes it) enters the program as jit
        # PARAMETERS, not closure literals — at large n the literal form's
        # multi-MB HLO hangs the remote TPU compile (GPModel.logdensity_data)
        def _run(k, d):
            ld = (model.logdensity if d is None
                  else (lambda u: model.logdensity_data(u, d)))
            if kind == "hmc":
                return run_hmc(
                    k, ld, q0, num_samples, num_warmup=num_warmup,
                    num_leapfrogs=getattr(args, "leapfrogs", 32),
                    target_accept=args.target_accept,
                    init_step_size=eps0, init_inv_mass=im0,
                    progress=getattr(args, "progress", False),
                )
            return run_chees(
                k, ld, q0, num_samples, num_warmup=num_warmup,
                target_accept=args.target_accept,
                init_step_size=eps0, init_traj_length=t_len0,
                init_inv_mass=im0,
                progress=getattr(args, "progress", False),
            )

        res = jax.jit(_run)(k_run, getattr(model, "data", None))
        float(jnp.sum(res.step_size))
    _report_lockstep(args, model, y, res, kind, n_chains, num_samples,
                     num_warmup, _time.time() - t0, k_report)


def _report_lockstep(args, model, y, res, kind, n_chains, num_samples,
                     num_warmup, elapsed, k_report):
    """Shared tail of the lockstep (chees/hmc, monolithic or segmented)
    paths: throughput log, chain report, checkpoint, chain table with
    per-draw sampler-stat columns."""
    total = n_chains * (num_samples + num_warmup)
    log.info(
        "%s: %d chains x %d transitions in %.2fs (%.1f transitions/s; "
        "eps %.4f, T %.3f, accept %.2f)",
        kind, n_chains, num_samples + num_warmup, elapsed, total / elapsed,
        float(res.step_size),
        float(getattr(res, "traj_length",
                      float(getattr(args, "leapfrogs", 32))
                      * float(res.step_size))),
        float(np.asarray(res.accept_prob).mean()),
    )

    sl = slice(args.burnin, None, args.thin)
    positions = jnp.asarray(res.positions)[:, sl]
    kept = positions.shape[1]
    report_keys = jax.random.split(k_report, n_chains * kept).reshape(n_chains, kept)
    thetas, fs, lps = _chain_report(
        model, report_keys, positions,
        want_latents=not getattr(args, "no_latents", False),
    )
    if args.checkpoint:
        _save_checkpoint(args.checkpoint, positions, res)
        log.info("checkpoint written to %s", args.checkpoint)
    _emit_chains(
        args, model, y.shape[0], thetas, fs, lps,
        accepts=np.asarray(res.accept_prob)[:, sl],
        step_size=float(res.step_size),
        traj_length=(float(res.traj_length) if hasattr(res, "traj_length")
                     else None),
    )


def _run_advi_path(args, model, y, num_samples, n_chains, k_init, k_run, k_report):
    """ADVI fast path (--sampler advi): fit mean-field q, emit pseudodraw
    chains in the same schema as NUTS (SURVEY.md §2.12 VI row)."""
    import time as _time

    from gaplac_tpu.inference.vi import run_advi, sample_posterior

    t0 = _time.time()
    result = run_advi(k_run, model, num_steps=args.vi_steps)
    elbo = float(np.asarray(result.elbo_trace)[-1])
    log.info("ADVI: %d steps in %.2fs, final ELBO %.3f", args.vi_steps, _time.time() - t0, elbo)
    print(f"ADVI converged: final ELBO {elbo:.3f}")

    draws = sample_posterior(k_init, result, n_chains * num_samples)
    draws = draws.reshape(n_chains, num_samples, model.dim)
    report_keys = jax.random.split(k_report, n_chains * num_samples).reshape(
        n_chains, num_samples
    )
    thetas, fs, lps = _chain_report(
        model, report_keys, draws,
        want_latents=not getattr(args, "no_latents", False),
    )
    _emit_chains(args, model, y.shape[0], thetas, fs, lps)


def _resume_from_chain(path: str, model, n_chains: int, dtype) -> jnp.ndarray:
    """Warm-start positions from a previous chain table's last row(s):
    theta from the hyperparameter column(s), and for latent models z
    recovered from the fx columns via z = L(theta)^{-1} f."""
    from gaplac_tpu.cli.common import resolve_hyper_columns

    df = read_table(path)
    hyper_cols = resolve_hyper_columns(df, model.n_hyper, path)
    fx_cols = sorted(
        (c for c in df.columns if c.startswith("fx[")),
        key=lambda c: int(c[3:-1]),
    )
    groups = (
        [g for _, g in df.groupby("chain", sort=True)] if "chain" in df.columns else [df]
    )
    positions = []
    for c in range(n_chains):
        row = groups[c % len(groups)].iloc[-1]
        theta = jnp.asarray(row[hyper_cols].to_numpy(dtype=float), dtype)
        f = jnp.asarray(row[fx_cols].to_numpy(dtype=float), dtype) if fx_cols else jnp.zeros((0,), dtype)
        positions.append(model.position_from(theta, f))
    return jnp.stack(positions)


def _save_checkpoint(path: str, positions, res) -> None:
    extra = {}
    if hasattr(res, "traj_length"):      # ChEES adapted trajectory length
        extra["traj_length"] = np.asarray(res.traj_length)
    np.savez(
        path,
        positions=np.asarray(positions[:, -1]),
        step_size=np.asarray(res.step_size),
        inv_mass=np.asarray(res.inv_mass),
        **extra,
    )


def _load_checkpoint(path: str, n_chains: int, dim: int) -> dict:
    if not path.endswith(".npz"):
        path_npz = path + ".npz"
        import os

        if os.path.exists(path_npz):
            path = path_npz
    z = np.load(path)
    pos = z["positions"]
    if pos.shape != (n_chains, dim):
        raise ValueError(
            f"Checkpoint shape {pos.shape} does not match --chains {n_chains} "
            f"and model dim {dim}"
        )
    out = {
        "positions": jnp.asarray(pos),
        "step_size": np.mean(z["step_size"]),
        "inv_mass": jnp.asarray(z["inv_mass"]),
    }
    if "traj_length" in z.files:        # ChEES checkpoints carry T too
        out["traj_length"] = np.asarray(z["traj_length"])
    return out
